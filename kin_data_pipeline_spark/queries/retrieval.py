"""Sparse retrieval + ANN quality auditing over the corpus tables.

Two capabilities a training-data platform needs beyond dedup/filtering:

- **BM25 scoring** (`bm25_doc_scores`): the inverted-index ranking function
  (Robertson/Sparck Jones; Lucene's clamped-idf variant) over the corpus —
  the workhorse for benchmark decontamination lookups, targeted corpus
  search, and BM25-negative mining for retrieval training sets. Shape: one
  token aggregation builds (tf, dl); the per-term model (df, idf) is a
  |Q|-row frame; scoring is a broadcast hash join of that model into the
  matched postings — the corpus never shuffles more than once.
- **ANN recall audit** (`ivf_recall_audit`): recall@k of the IVF cell-probe
  path against the brute-force exact top-k for the same query set — the
  metric that decides whether an ANN index's speedup is buying acceptable
  loss. Integer hit counts; one final division.

Cross-engine exactness follows the house rules (see queries/curation.py):
logs are micro-quantized to integers inside bounded model frames, per-doc
sums are exact integer arithmetic, and every floating terminal is either a
single IEEE division or a fixed-order expression evaluated identically on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries.llmops import _IVF_K, _IVF_NPROBE, _IVF_STRIDE_SQL
from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

# BM25 parameters: the standard k1/b, chosen as exactly-representable
# doubles where possible (b = 0.75 and 1-b = 0.25 are dyadic; k1 = 1.2 is
# the same IEEE literal on both engines).
_BM25_K1 = 1.2
_BM25_B = 0.75
# Query terms: one rare ('dup' appears in ~5% of docs) and two common —
# exercising both ends of the idf range, including the regime where the
# unclamped idf would go negative (df > N/2) and Lucene's ln(1 + ...) form
# matters.
_BM25_TERMS = ["dup", "merge", "scan"]

_SQL_TERMS = ", ".join(repr(t) for t in _BM25_TERMS)

@register(
    "bm25_doc_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ), tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
      WHERE w IN ({_SQL_TERMS}) GROUP BY doc_id, w
    ), model AS (
      SELECT w, df, n_docs, total_len,
             CAST(ROUND(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000, 0)
                  AS BIGINT) AS idf_micro
      FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w)
      CROSS JOIN stats
    ), scored AS (
      SELECT tf.doc_id, tf.w,
             CAST(ROUND(idf_micro * ((tf * {_BM25_K1 + 1}) /
               (tf + {_BM25_K1} * (0.25 + 0.75 *
                 (CAST(dl.dl * n_docs AS DOUBLE) / total_len)))), 0)
               AS BIGINT) AS s_micro
      FROM tf JOIN model ON tf.w = model.w JOIN dl ON tf.doc_id = dl.doc_id
    )
    SELECT s.doc_id, dl.dl,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           CAST(SUM(s_micro) AS BIGINT) AS score_micro,
           ROUND(CAST(SUM(s_micro) AS DOUBLE) / 1000000.0, 6) AS bm25
    FROM scored s JOIN dl ON s.doc_id = dl.doc_id
    GROUP BY s.doc_id, dl.dl
    """,
    doc=(
        f"BM25 (k1={_BM25_K1}, b={_BM25_B}, Lucene clamped idf) document "
        f"scores for the query {_BM25_TERMS} — inverted-index retrieval "
        "over the corpus (micro-quantized idf, integer score sums)"
    ),
)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("doc_id", "w")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    tf = (
        tok.filter(F.col("w").isin(_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_frame = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # |Q|-row term frame × 1-row stats frame: the allowlisted tiny
    # nested-loop (both sides bounded by the QUERY length, not the data).
    model = df_frame.crossJoin(F.broadcast(stats)).select(
        "w",
        "df",
        "n_docs",
        "total_len",
        F.round(
            F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = (
        tf.join(F.broadcast(model), "w")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("idf_micro")
                * (
                    (F.col("tf") * F.lit(_BM25_K1 + 1))
                    / (
                        F.col("tf")
                        + F.lit(_BM25_K1)
                        * (
                            F.lit(0.25)
                            + F.lit(0.75)
                            * (
                                (F.col("dl") * F.col("n_docs")).cast("double")
                                / F.col("total_len")
                            )
                        )
                    )
                ),
                0,
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.sum("s_micro").cast("long").alias("score_micro"),
            F.round(F.sum("s_micro").cast("double") / F.lit(1000000.0), 6).alias(
                "bm25"
            ),
        )
        .join(dl, "doc_id")
        .select("doc_id", "dl", "n_terms_matched", "score_micro", "bm25")
    )

# Recall@k of the IVF cell-probe ANN path vs the brute-force exact top-k —
# the acceptance metric for any approximate index. Reuses the two
# registered ANN queries verbatim (same centroids, same probe count, same
# tiebreaks), joins their neighbor sets per query, and reports integer hit
# counts. A query that loses neighbors to an unprobed cell shows up here as
# recall < 1, which is the point: the audit quantifies the nprobe/speed
# trade instead of asserting it.
@register(
    "ivf_recall_audit",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) DESC,
                          c.vec_id ASC) AS rnk
        FROM (SELECT * FROM e WHERE vec_id < 20) q
        JOIN e c ON c.vec_id <> q.vec_id
      ) WHERE rnk <= {_IVF_K}
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM e
      WHERE vec_id % {_IVF_STRIDE_SQL} = 0
    ), asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.emb, c.cemb) / (e.nrm * c.cnrm) DESC,
                          c.cid ASC) AS rn
        FROM e, cent c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.emb, c.cemb) / (e.nrm * c.cnrm) DESC,
                          c.cid ASC) AS rn
        FROM e, cent c WHERE e.vec_id < 20
      ) WHERE rn <= {_IVF_NPROBE}
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                 ORDER BY list_dot_product(q.emb, n.emb) / (q.nrm * n.nrm) DESC,
                          a.vec_id ASC) AS rnk
        FROM probes p
        JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
        JOIN e q ON q.vec_id = p.query_id
        JOIN e n ON n.vec_id = a.vec_id
      ) WHERE rnk <= {_IVF_K}
    ), hits AS (
      SELECT b.query_id, CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits
      FROM brute b LEFT JOIN ivf i
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      GROUP BY b.query_id
    )
    SELECT query_id, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / {_IVF_K}, 6) AS recall_at_5
    FROM hits
    """,
    doc=(
        "recall@5 of the IVF cell-probe ANN against the brute-force exact "
        "top-5 per query (integer hit counts — the ANN acceptance metric)"
    ),
)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import (
        embedding_ivf_ann_top5,
        embedding_knn_top5,
    )

    brute = embedding_knn_top5(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = embedding_ivf_ann_top5(spark, sf_dir).select(
        F.col("query_id").alias("i_query_id"),
        F.col("neighbor_id").alias("i_neighbor_id"),
    )
    hits = brute.join(
        ivf,
        (brute.query_id == ivf.i_query_id)
        & (brute.neighbor_id == ivf.i_neighbor_id),
        "left",
    ).groupBy("query_id").agg(
        F.count("i_neighbor_id").cast("long").alias("n_hits")
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.lit(_IVF_K), 6).alias(
            "recall_at_5"
        ),
    )

# Product quantization (PQ) audit — the ANN MEMORY story (Jégou, Douze &
# Schmid, TPAMI 2011): each 64-dim vector compresses to m=4 one-byte
# codes (one codeword per 16-dim subspace), and query-time scoring is a
# lookup-table sum instead of a full dot product — at 100 TB this is the
# difference between an index that fits executor memory and one that
# doesn't (64 floats -> 4 bytes per vector, 64x). Deterministic stand-in
# for k-means codebooks: the first 16 vectors' subvectors (both engines
# derive the identical codebook from data, as with the IVF centroids).
# Exactness: per-(query, subspace, codeword) LUT dot products are
# micro-quantized to integers in the BOUNDED lut frame (|Q| x 4 x 16
# rows); per-vector approximate scores are then exact integer sums of 4
# LUT entries, so ranking is integer ordering. The exact cosine rides
# along per result row, so the output exhibits the compression error
# directly.
_PQ_M = 4  # subspaces
_PQ_SUBDIM = 16  # dims per subspace (64-dim embeddings)
_PQ_K = 16  # codewords per subspace
_PQ_TOP = 5

def _pq_slice_sql(col: str, s: int) -> str:
    return f"list_slice({col}, {s * _PQ_SUBDIM + 1}, {(s + 1) * _PQ_SUBDIM})"

@register(
    "pq_compression_audit",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ), sub AS (
      {' UNION ALL '.join(f"SELECT vec_id, {s} AS s, {_pq_slice_sql('emb', s)} AS v FROM e" for s in range(_PQ_M))}
    ), cb AS (
      SELECT vec_id AS code_id, s, v AS cv FROM sub WHERE vec_id < {_PQ_K}
    ), assigned AS (
      SELECT vec_id, s, code_id FROM (
        SELECT sub.vec_id, sub.s, cb.code_id,
               ROW_NUMBER() OVER (
                 PARTITION BY sub.vec_id, sub.s
                 ORDER BY list_dot_product(sub.v, sub.v)
                          - 2 * list_dot_product(sub.v, cb.cv)
                          + list_dot_product(cb.cv, cb.cv) ASC,
                          cb.code_id ASC) AS rn
        FROM sub JOIN cb ON sub.s = cb.s
      ) WHERE rn = 1
    ), lut AS (
      SELECT q.vec_id AS query_id, cb.s, cb.code_id,
             CAST(ROUND(list_dot_product(list_slice(q.emb, cb.s * {_PQ_SUBDIM} + 1, (cb.s + 1) * {_PQ_SUBDIM}), cb.cv) * 1000000, 0) AS BIGINT) AS d_micro
      FROM (SELECT * FROM e WHERE vec_id < 20) q, cb
    ), approx AS (
      SELECT l.query_id, a.vec_id AS neighbor_id,
             CAST(SUM(l.d_micro) AS BIGINT) AS approx_dot_micro
      FROM assigned a
      JOIN lut l ON l.s = a.s AND l.code_id = a.code_id
      WHERE a.vec_id <> l.query_id
      GROUP BY l.query_id, a.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY approx_dot_micro DESC, neighbor_id ASC) AS rnk
      FROM approx
    )
    SELECT r.query_id, r.neighbor_id, CAST(r.rnk AS INT) AS rnk,
           r.approx_dot_micro,
           ROUND(list_dot_product(q.emb, n.emb) / (q.nrm * n.nrm), 6)
             AS exact_cosine
    FROM ranked r
    JOIN e q ON q.vec_id = r.query_id
    JOIN e n ON n.vec_id = r.neighbor_id
    WHERE r.rnk <= {_PQ_TOP}
    """,
    doc=(
        f"product-quantization audit: {_PQ_M}x{_PQ_SUBDIM}-dim subspaces, "
        f"{_PQ_K} codewords, integer LUT-sum ranking with exact cosine "
        "alongside (the 64x-compression ANN path)"
    ),
)
def pq_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    e = e.withColumn("nrm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    sub = None
    for s in range(_PQ_M):
        part = e.select(
            "vec_id",
            F.lit(s).alias("s"),
            F.slice("emb", s * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("v"),
        )
        sub = part if sub is None else sub.unionAll(part)
    cb = sub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("code_id"), "s", F.col("v").alias("cv")
    )
    # corpus subvectors x 16-codeword broadcast codebook, keyed on the
    # subspace id: the PQ analog of IVF centroid assignment
    joined = sub.join(F.broadcast(cb), "s")
    d = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    assigned = (
        joined.select("vec_id", "s", "code_id", d.alias("dist"))
        .groupBy("vec_id", "s")
        .agg(F.min_by("code_id", F.struct("dist", "code_id")).alias("code_id"))
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    lut = q.join(F.broadcast(cb), F.lit(True)).select(
        "query_id",
        "s",
        "code_id",
        F.round(
            dot(
                F.slice(
                    "q_emb", F.col("s") * _PQ_SUBDIM + 1, F.lit(_PQ_SUBDIM)
                ),
                F.col("cv"),
            )
            * 1000000,
            0,
        )
        .cast("long")
        .alias("d_micro"),
    )
    approx = (
        assigned.join(F.broadcast(lut), ["s", "code_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d_micro").cast("long").alias("approx_dot_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot_micro"), F.asc("neighbor_id")
    )
    ranked = approx.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _PQ_TOP
    )
    qq = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    nn = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    return (
        ranked.join(F.broadcast(qq), "query_id")
        .join(nn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("int").alias("rnk"),
            "approx_dot_micro",
            F.round(dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
            .alias("exact_cosine"),
        )
    )

# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive / retrieval training (DPR, SimCSE
# shape): for each query vector, the top-k most-similar vectors that carry a
# DIFFERENT label and sit above a similarity floor — near the decision
# boundary, which is where negatives carry training signal (random negatives
# are trivially separable). Same linear corpus-scan-vs-broadcast-query-set
# shape as embedding_knn_top5 (the documented BNLJ exemption); the band
# filter runs BEFORE the per-query window, so the rank sees only boundary
# candidates. At 100 TB the broadcast query set is replaced by the IVF cell
# probe (embedding_ivf_ann_top5) feeding the identical band+rank tail.
# ---------------------------------------------------------------------------
_HN_FLOOR = 0.2  # exactly representable? 0.2 is the same IEEE literal both sides
_HN_K = 5

@register(
    "hard_negative_candidates",
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), sims AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim
      FROM (SELECT * FROM e WHERE vec_id < 20) q
      JOIN e c ON c.vec_id <> q.vec_id AND c.label <> q.label
    )
    SELECT query_id, CAST(query_label AS INT) AS query_label,
           neighbor_id, CAST(neighbor_label AS INT) AS neighbor_label,
           ROUND(sim, 4) AS cosine_sim, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM sims WHERE sim >= {_HN_FLOOR}
    ) WHERE rnk <= {_HN_K}
    """,
    doc="contrastive-training hard negatives: cross-label top-k above a similarity floor",
)
def hard_negative_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    e = e.withColumn("nrm", F.sqrt(dot(F.col("emb"), F.col("emb"))))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = e.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("query_label")),
    )
    sims = joined.select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        (dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
            "sim"
        ),
    ).filter(F.col("sim") >= _HN_FLOOR)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select(
            "query_id",
            F.col("query_label").cast("int").alias("query_label"),
            "neighbor_id",
            F.col("neighbor_label").cast("int").alias("neighbor_label"),
            F.round("sim", 4).alias("cosine_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )

# Real k-means over the embedding corpus (distributed Lloyd iterations) —
# the actual-centroid upgrade of the stride-based IVF/SemDeDup assignment,
# and the clustering primitive a curation pipeline needs for SemDeDup-style
# cell formation and cluster-balanced sampling. Exactness is the BPE-
# training playbook applied to vectors (operators/similarity.py::
# kmeans_lloyd): quantize once to integers, keep centroids as rounded
# integer means via one IEEE division + floor (identical on both engines),
# break assignment ties to the smallest cluster id. The oracle generates
# the SAME T-iteration loop as materialized DuckDB CTEs from the same
# constants: iteration r assigns under cent{r-1} and updates cent{r};
# the profile reads the assignment under the final centroids. Empty
# clusters keep their previous centroid (COALESCE / python no-op).

_KM_K = 8
_KM_ITERS = 3
_KM_SCALE = 1_000_000

def _kmeans_oracle(k: int, iters: int, scale: int) -> str:
    ctes = [
        f"""q AS MATERIALIZED (
      SELECT vec_id,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             CAST(FLOOR(UNNEST(embedding::DOUBLE[]) * {scale} + 0.5) AS BIGINT) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), cent0 AS MATERIALIZED (
      SELECT vec_id AS k, pos, v AS m FROM q WHERE vec_id < {k}
    )"""
    ]
    for r in range(1, iters + 2):
        assign = f"""d{r} AS MATERIALIZED (
      SELECT q.vec_id, c.k, SUM((q.v - c.m) * (q.v - c.m)) AS dist
      FROM q JOIN cent{r - 1} c ON q.pos = c.pos
      GROUP BY q.vec_id, c.k
    ), a{r} AS MATERIALIZED (
      SELECT vec_id, k, dist FROM (
        SELECT vec_id, k, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, k ASC) AS rn
        FROM d{r}
      ) WHERE rn = 1
    )"""
        if r == iters + 1:
            # the profile reads the assignment under the FINAL centroids —
            # no further update
            ctes.append(assign)
            break
        ctes.append(
            assign
            + f""", s{r} AS MATERIALIZED (
      SELECT a.k, q.pos, SUM(q.v) AS s, CAST(COUNT(*) AS BIGINT) AS c
      FROM q JOIN a{r} a ON a.vec_id = q.vec_id
      GROUP BY a.k, q.pos
    ), cent{r} AS MATERIALIZED (
      SELECT p.k, p.pos,
             COALESCE(CAST(FLOOR((2 * s.s + s.c) / (2 * s.c)) AS BIGINT), p.m) AS m
      FROM cent{r - 1} p LEFT JOIN s{r} s ON s.k = p.k AND s.pos = p.pos
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(k AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids,
           CAST(SUM(dist) AS BIGINT) AS inertia
    FROM a{iters + 1} GROUP BY k"""
    )

@register(
    "kmeans_cluster_profile",
    _kmeans_oracle(_KM_K, _KM_ITERS, _KM_SCALE),
    doc=(
        f"distributed Lloyd k-means (K={_KM_K}, {_KM_ITERS} iterations) over "
        "quantized embeddings — integer centroids, deterministic ties; "
        "per-cluster size / id-checksum / integer inertia"
    ),
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_lloyd(
        emb, "vec_id", "embedding", k=_KM_K, iters=_KM_ITERS, scale=_KM_SCALE
    )
    return asg.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("__id").cast("long").alias("sum_vec_ids"),
        F.sum("dist").cast("long").alias("inertia"),
    )
