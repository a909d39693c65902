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
    """
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
      ) WHERE rnk <= 5
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM e
      WHERE vec_id % 31 = 0
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
      ) WHERE rn <= 2
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
      ) WHERE rnk <= 5
    ), hits AS (
      SELECT b.query_id, CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits
      FROM brute b LEFT JOIN ivf i
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      GROUP BY b.query_id
    )
    SELECT query_id, n_hits, ROUND(CAST(n_hits AS DOUBLE) / 5, 6) AS recall_at_5
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
        F.round(F.col("n_hits").cast("double") / F.lit(5), 6).alias("recall_at_5"),
    )
