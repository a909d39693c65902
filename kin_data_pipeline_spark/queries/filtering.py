"""Web-corpus filtering & selection tier: URL/domain gates, corpus-LM
rarity scoring, line-grain exact substring dedup, quality-ranked dedup
survivor selection.

These are the remaining first-pass gates a 100 TB training-data pipeline
runs before (and after) the content-level dedup tiers in
``queries/llmops.py`` / ``queries/curation.py``:

- **URL/domain filtering** (C4, RefinedWeb): block documents by registrable
  domain against a blocklist — a broadcast anti-join, corpus never
  shuffles. The driver corpus has no URL column, so (exactly like the
  multimodal tier synthesizes valid media bytes) a URL is derived from
  ``doc_id`` by fixed md5 arithmetic; the parse → normalize → block chain
  operates only on the derived string, and the oracle re-derives and
  re-parses the same URLs, so the round trip is checked end-to-end.
- **Token-rarity scoring** (the CCNet perplexity-filter shape): "train" a
  unigram LM on the corpus itself (one token-frequency aggregation; the
  score join carries NO broadcast hint — the distinct-token vocabulary
  grows with the corpus, so AQE owns the strategy; the hashed-vocabulary
  variant below is bounded by construction and broadcasts safely), score
  each document by its tokens' corpus frequencies. Deliberately log-free: the
  mean corpus-frequency and rare-token fraction are monotone transforms of
  unigram log-likelihood computable in exact integer/rational arithmetic,
  so the oracle comparison is bit-exact (IEEE division of integers is
  engine-independent; ``ln``/``log2`` are not).
- **Repeated-chunk stats** (line-level exact substring dedup,
  MassiveText/RefinedWeb): hash fixed-width non-overlapping token chunks,
  count cross-document repeats — the scale-sane approximation of
  suffix-array substring dedup (one linear shuffle on chunk hash).
- **Keep-best survivor selection**: production dedup keeps the
  highest-QUALITY member of each near-dup cluster, not the lowest id.
  Reuses the cached connected-components labels and ranks members by
  distinct-token ratio.

No reference counterpart (the reference warehouse has no web tier); part
of the beyond-reference LLM-ops surface alongside llmops.py/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kin_data_pipeline_spark.operators.dedup import CHUNK_W, chunk_hashes
from kin_data_pipeline_spark.operators.webfilter import (
    blocklist_mark,
    domain_of,
    registrable_domain,
)
from kin_data_pipeline_spark.queries.llmops import (
    _CAPPED_PAIRS_CTES,
    _SQL_SHINGLES,
    _SQL_WORDS,
    _cached_substrate,
    _with_words,
)
from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

# --- deterministic URL derivation ------------------------------------------
# 40 synthetic sites; every 7th is a tracker domain. Both engines derive
# the same u32 from md5(doc_id), so the URL strings are identical and the
# extract/normalize/block chain is exercised on real parsing, not on a
# shared shortcut column.

_N_SITES = 40
_TRACKER_MOD = 7

_SQL_URL = (
    "('https://site' || "
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
    f" % {_N_SITES}) || (CASE WHEN "
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
    f" % {_N_SITES}) % {_TRACKER_MOD} = 0 THEN '.tracker.example' "
    "ELSE '.example.com' END) || '/doc/' || doc_id)"
)

_SQL_HOST_RE = "'^[a-z][a-z0-9+.-]*://([^/:?#]+)'"

BLOCKED_REGISTRABLE = ["tracker.example"]

def _url_col() -> F.Column:
    idx = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SITES
    )
    tld = F.when(idx % _TRACKER_MOD == 0, F.lit(".tracker.example")).otherwise(
        F.lit(".example.com")
    )
    return F.concat(
        F.lit("https://site"),
        idx.cast("string"),
        tld,
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
    )

@register(
    "url_domain_filter_stats",
    f"""
    WITH u AS (
      SELECT doc_id, source, {_SQL_URL} AS url FROM documents
    ), h AS (
      SELECT doc_id, source,
             regexp_extract(url, {_SQL_HOST_RE}, 1) AS host
      FROM u
    ), r AS (
      SELECT doc_id, source, host,
             CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                  ELSE list_extract(string_split(host, '.'), len(string_split(host, '.')) - 1)
                       || '.' ||
                       list_extract(string_split(host, '.'), len(string_split(host, '.')))
             END AS reg_domain
      FROM h
    ), m AS (
      SELECT *, reg_domain IN ({', '.join(repr(d) for d in BLOCKED_REGISTRABLE)}) AS blocked
      FROM r
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS block_rate,
           CAST(COUNT(DISTINCT CASE WHEN NOT blocked THEN host END) AS BIGINT) AS n_kept_domains
    FROM m GROUP BY source
    """,
    doc="URL→domain blocklist gate (broadcast anti-join shape), per-source block accounting",
)
def url_domain_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u = docs.withColumn("url", _url_col())
    h = u.withColumn("host", domain_of("url")).withColumn(
        "reg_domain", registrable_domain("host")
    )
    blocked = spark.createDataFrame(
        [(d,) for d in BLOCKED_REGISTRABLE], "domain string"
    )
    m = blocklist_mark(h, "reg_domain", blocked)
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("blocked").cast("int")).cast("long").alias("n_blocked"),
        F.sum((~F.col("blocked")).cast("int")).cast("long").alias("n_kept"),
        F.round(
            F.sum(F.col("blocked").cast("int")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("block_rate"),
        F.countDistinct(F.when(~F.col("blocked"), F.col("host")))
        .cast("long")
        .alias("n_kept_domains"),
    )

# --- corpus-LM token rarity -------------------------------------------------

_RARE_CF = 2  # a token seen <= twice corpus-wide is "rare"

@register(
    "token_rarity_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY w
    )
    SELECT doc_id, ANY_VALUE(source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(cf) * 1.0 / COUNT(*), 6) AS mean_token_cf,
           CAST(MIN(cf) AS BIGINT) AS min_token_cf,
           ROUND(SUM(CASE WHEN cf <= {_RARE_CF} THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS rare_frac
    FROM tok JOIN freq USING (w)
    GROUP BY doc_id
    """,
    doc="corpus-trained unigram-LM document scoring (CCNet shape, exact log-free arithmetic)",
)
def token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import doc_tokens

    tok = doc_tokens(spark, sf_dir)
    # The "LM": one aggregation over the corpus. NO broadcast hint: the
    # distinct-token vocabulary grows with the corpus (open-web whitespace
    # tokens — URLs, hashes, typos — run to billions of entries at 100 TB),
    # so a forced broadcast turns into a driver/executor OOM at scale and
    # removes AQE's ability to fall back. AQE owns the strategy: at small
    # vocabularies it picks broadcast at runtime from observed stats; at
    # open-web scale it shuffles both sides on `w` — the sound plan. The
    # bounded-by-construction alternative is a hashed vocabulary
    # (CCNet/DSIR shape): see hashed_token_rarity_scores below. PLANS.md
    # "Vocabulary-scale boundary" documents which queries assume which.
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    scored = tok.join(freq, "w")
    return scored.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum("cf") * 1.0 / F.count(F.lit(1)), 6).alias("mean_token_cf"),
        F.min("cf").alias("min_token_cf"),
        F.round(
            F.sum((F.col("cf") <= _RARE_CF).cast("int")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("rare_frac"),
    )

# --- hashed-vocabulary token rarity (bounded-model variant) -----------------

# The CCNet/DSIR trick that makes the unigram "LM" broadcastable BY
# CONSTRUCTION at any corpus size: tokens hash into a fixed bucket table
# (B=4096), so the model side is <= B rows no matter how many distinct
# tokens the open-web corpus grows. Collisions conflate token identities
# (each bucket's count is the sum over its tokens) — the standard accepted
# trade of hashed feature models; rankings track the exact-vocabulary form
# wherever collisions are balanced. The broadcast hint here is SAFE, unlike
# token_rarity_scores' exact-vocabulary model (see PLANS.md
# "Vocabulary-scale boundary").
_VOCAB_BUCKETS = 4096

def _bucket_of(col):
    """Portable token->bucket hash: first 8 md5 hex chars mod B."""
    from kin_data_pipeline_spark.queries.llmops import _h32

    return (_h32(col) % _VOCAB_BUCKETS).alias("b")

_SQL_BUCKET = (
    f"CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {_VOCAB_BUCKETS}"
)

@register(
    "hashed_token_rarity_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {_SQL_BUCKET} AS b FROM (
        SELECT doc_id, source, w FROM (
          SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
        ), UNNEST(ws) AS t(w)
      )
    ), freq AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY b
    )
    SELECT doc_id, ANY_VALUE(source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(cf) * 1.0 / COUNT(*), 6) AS mean_bucket_cf,
           CAST(MIN(cf) AS BIGINT) AS min_bucket_cf,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS n_distinct_buckets
    FROM tok JOIN freq USING (b)
    GROUP BY doc_id
    """,
    doc=(
        f"hashed-vocabulary ({_VOCAB_BUCKETS}-bucket) unigram-LM document "
        "scoring — the bounded-model CCNet shape whose broadcast is safe "
        "at any corpus size"
    ),
)
def hashed_token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("doc_id", "source", _bucket_of(F.col("w")))
    # <= 4096 rows regardless of corpus size: the ONLY vocabulary-model
    # frame in the tier where a broadcast hint is sound by construction.
    freq = tok.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    scored = tok.join(F.broadcast(freq), "b")
    return scored.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum("cf") * 1.0 / F.count(F.lit(1)), 6).alias("mean_bucket_cf"),
        F.min("cf").alias("min_bucket_cf"),
        F.countDistinct("b").cast("long").alias("n_distinct_buckets"),
    )

# --- line-grain exact substring dedup ---------------------------------------

# Chunk geometry and hashing are the shared operator-library declaration
# (operators/dedup.py::CHUNK_W / chunk_hashes) so the stats queries here
# and the release rewrite in models/corpus._clean can never drift apart.
_CHUNK_W = CHUNK_W

def _sql_chunks(ws_expr: str = "ws") -> str:
    """DuckDB twin of operators/dedup.py::chunk_hashes over a words-array
    SQL expression — ONE generator shared by both chunk oracles and the
    differential test (which passes its own tokenizer expression instead
    of text-substituting into a constant), so the SQL side cannot drift
    from itself."""
    return (
        f"list_transform("
        f"range(1, CAST(len({ws_expr}) // {_CHUNK_W} AS BIGINT) + 1), "
        f"i -> md5(array_to_string("
        f"list_slice({ws_expr}, (i-1)*{_CHUNK_W}+1, (i-1)*{_CHUNK_W}+{_CHUNK_W}), ' ')))"
    )

_SQL_CHUNKS = _sql_chunks()

def _chunk_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_id, source, c) chunk-hash instances — shared by the
    repeated-chunk stats and the line-dedup retention transformation."""

    def build() -> DataFrame:
        d = _with_words(load_table(spark, sf_dir, "documents"))
        return d.select(
            "doc_id", "source", F.explode(chunk_hashes("words")).alias("c")
        )

    return _cached_substrate(spark, sf_dir, "doc_chunks", build)


@register(
    "repeated_chunk_stats",
    f"""
    WITH d AS (
      SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
    ), ck AS (
      SELECT doc_id, source,
             {_SQL_CHUNKS} AS chunks
      FROM d
    ), inst AS (
      SELECT doc_id, source, c FROM ck, UNNEST(chunks) AS t(c)
    ), df AS (
      SELECT c, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
      FROM inst GROUP BY c
    ), j AS (
      SELECT inst.source, df.ndocs FROM inst JOIN df ON inst.c = df.c
    ), per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS total_chunks,
             CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_chunks
      FROM j GROUP BY source
    ), nd AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    )
    SELECT nd.source, nd.n_docs,
           COALESCE(per_src.total_chunks, 0) AS total_chunks,
           COALESCE(per_src.shared_chunks, 0) AS shared_chunks,
           ROUND(COALESCE(per_src.shared_chunks, 0) * 1.0
                 / NULLIF(COALESCE(per_src.total_chunks, 0), 0), 6) AS dup_chunk_rate
    FROM nd LEFT JOIN per_src ON nd.source = per_src.source
    """,
    doc=f"cross-document repeated {_CHUNK_W}-token chunks (line-grain exact substring dedup)",
)
def repeated_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_words(load_table(spark, sf_dir, "documents"))
    inst = _chunk_instances(spark, sf_dir)
    # One linear shuffle on the chunk hash — the scale contract of
    # line-level dedup (no pairwise anything; repeats surface as df >= 2).
    cdf = inst.groupBy("c").agg(F.countDistinct("doc_id").cast("long").alias("ndocs"))
    j = inst.join(cdf, "c")
    per_src = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.sum((F.col("ndocs") >= 2).cast("int")).cast("long").alias("shared_chunks"),
    )
    nd = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    out = nd.join(per_src, "source", "left")
    total = F.coalesce(F.col("total_chunks"), F.lit(0).cast("long"))
    shared = F.coalesce(F.col("shared_chunks"), F.lit(0).cast("long"))
    return out.select(
        "source",
        "n_docs",
        total.alias("total_chunks"),
        shared.alias("shared_chunks"),
        F.round(shared * 1.0 / F.nullif(total, F.lit(0).cast("long")), 6).alias(
            "dup_chunk_rate"
        ),
    )

# --- quality-ranked dedup survivors -----------------------------------------
# Production dedup keeps the BEST member of each near-dup cluster (highest
# quality score), not the lowest doc_id. Reuses the cached
# connected-components labels from near_dup_clusters; ranking quality is
# the distinct-token ratio — an integer-ratio double, so cross-engine
# comparisons (including the window ORDER BY) are exact.

@register(
    "dedup_keep_best_survivors",
    f"""
    WITH RECURSIVE {_CAPPED_PAIRS_CTES.format(shingles=_SQL_SHINGLES)},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM good
      UNION ALL
      SELECT doc_b, doc_a FROM good
    ),
    reach AS (
      SELECT DISTINCT a AS node, a AS m FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.m
    ),
    lab AS (SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node),
    q AS (
      SELECT doc_id, source,
             len(list_distinct({_SQL_WORDS})) * 1.0 / len({_SQL_WORDS}) AS quality
      FROM documents
    ),
    ranked AS (
      SELECT q.source,
             ROW_NUMBER() OVER (
               PARTITION BY COALESCE(lab.cluster_id, q.doc_id)
               ORDER BY q.quality DESC, q.doc_id ASC
             ) = 1 AS keep
      FROM q LEFT JOIN lab ON q.doc_id = lab.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS keep_rate
    FROM ranked GROUP BY source
    """,
    doc="keep highest-quality member per near-dup cluster; per-source survivor accounting",
)
def dedup_keep_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import near_dup_labels

    # the one owner of the 'near_dup_labels' substrate key (single-owner
    # rule: two call sites with their own build lambdas under one key would
    # hand whichever ran second the first one's frame)
    labels = near_dup_labels(spark, sf_dir)
    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct("words")) * 1.0 / F.size("words")
        ).alias("quality"),
    )
    lab = labels.select(F.col("node").alias("doc_id"), "cluster_id")
    j = d.join(lab, "doc_id", "left").withColumn(
        "cid", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    w = Window.partitionBy("cid").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    ranked = j.withColumn("keep", F.row_number().over(w) == 1)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("int")).cast("long").alias("n_dropped"),
        F.round(F.sum(F.col("keep").cast("int")) * 1.0 / F.count(F.lit(1)), 6).alias(
            "keep_rate"
        ),
    )


# --- per-domain quality profile ---------------------------------------------
# The audit that DECIDES domain filters: RefinedWeb/C4-style pipelines
# blocklist or down-weight registrable domains whose aggregate text quality
# is poor, and that decision comes from exactly this rollup — per-domain
# document counts and length/shortness profiles. Composes the URL→domain
# extraction with corpus text metrics in one pass: grouping on registrable
# domain (bounded cardinality ≪ corpus, so the aggregate's reduce side is
# tiny), integer-exact sums, ratios rounded once at the end.

_SHORT_DOC_WORDS = 50  # docs under this many tokens count as "short"

@register(
    "per_domain_quality_profile",
    f"""
    WITH u AS (
      SELECT doc_id, n_chars, {_SQL_WORDS} AS ws, {_SQL_URL} AS url FROM documents
    ), h AS (
      SELECT doc_id, n_chars, len(ws) AS n_words,
             regexp_extract(url, {_SQL_HOST_RE}, 1) AS host
      FROM u
    ), r AS (
      SELECT doc_id, n_chars, n_words,
             CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                  ELSE list_extract(string_split(host, '.'), len(string_split(host, '.')) - 1)
                       || '.' ||
                       list_extract(string_split(host, '.'), len(string_split(host, '.')))
             END AS reg_domain
      FROM h
    )
    SELECT reg_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN n_words < {_SHORT_DOC_WORDS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           ROUND(SUM(CASE WHEN n_words < {_SHORT_DOC_WORDS} THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS short_frac,
           ROUND(SUM(n_chars) * 1.0 / COUNT(*), 6) AS mean_chars
    FROM r GROUP BY reg_domain
    """,
    doc="per-registrable-domain text-quality rollup (the domain-filter decision input)",
)
def per_domain_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars", F.size("words").alias("n_words")
    )
    h = docs.withColumn("url", _url_col()).withColumn("host", domain_of("url"))
    r = h.withColumn("reg_domain", registrable_domain("host"))
    n_short = F.sum((F.col("n_words") < _SHORT_DOC_WORDS).cast("int")).cast("long")
    return r.groupBy("reg_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        n_short.alias("n_short"),
        F.round(
            F.sum((F.col("n_words") < _SHORT_DOC_WORDS).cast("int"))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("short_frac"),
        F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 6).alias("mean_chars"),
    )

# --- line-dedup retention (the transformation, not just the stats) ----------
# repeated_chunk_stats REPORTS cross-document chunk repetition; this query
# computes the per-document OUTCOME of applying the dedup — MassiveText/
# RefinedWeb's "remove lines duplicated across documents" rewrite. A chunk
# instance is dropped iff its hash occurs in >= 2 distinct documents (the
# cross-document criterion; a chunk repeated only within one document is
# kept). The tail tokens past the last full chunk are always kept, so
# n_kept_tokens = n_words − CHUNK_W · (dropped instances). Same single
# linear shuffle on the chunk hash over the cached instance substrate; the
# doc-grain rollup adds one bounded aggregate.

@register(
    "line_dedup_retention",
    f"""
    WITH d AS (
      SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
    ), ck AS (
      SELECT doc_id,
             {_SQL_CHUNKS} AS chunks
      FROM d
    ), inst AS (
      SELECT doc_id, c FROM ck, UNNEST(chunks) AS t(c)
    ), cdf AS (
      SELECT c, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
      FROM inst GROUP BY c
    ), per_doc AS (
      SELECT inst.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN cdf.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks
      FROM inst JOIN cdf ON inst.c = cdf.c
      GROUP BY inst.doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(len(d.ws) AS BIGINT) AS n_words,
           COALESCE(per_doc.n_chunks, 0) AS n_chunks,
           COALESCE(per_doc.n_dup_chunks, 0) AS n_dup_chunks,
           CAST(len(d.ws) - {_CHUNK_W} * COALESCE(per_doc.n_dup_chunks, 0) AS BIGINT)
             AS n_kept_tokens,
           ROUND((len(d.ws) - {_CHUNK_W} * COALESCE(per_doc.n_dup_chunks, 0)) * 1.0
                 / len(d.ws), 6) AS retained_frac
    FROM d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
    doc=(
        f"per-document outcome of cross-document {_CHUNK_W}-token chunk "
        "dedup (line-dedup rewrite) — RAW-corpus audit; not release "
        "accounting (see models/corpus._clean substrate caveat)"
    ),
)
def line_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW-corpus characterization audit. The release rewrite
    (``models/corpus._clean``) computes its duplicated-chunk set over the
    post-fuzzy-dedup survivor table, so whenever fuzzy dedup removed a
    chunk's only other carrier this audit counts a duplicate the rewrite
    no longer drops — n_dup_chunks / retained_frac here OVERSTATE the
    release rewrite's actual drops. Read release accounting off
    corpus_clean's own n_dropped_chunks, never off these numbers."""
    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.size("words").cast("long").alias("n_words")
    )
    inst = _chunk_instances(spark, sf_dir).select("doc_id", "c")
    cdf = inst.groupBy("c").agg(F.countDistinct("doc_id").cast("long").alias("ndocs"))
    per_doc = (
        inst.join(cdf, "c")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("ndocs") >= 2).cast("int")).cast("long").alias("n_dup_chunks"),
        )
    )
    out = d.join(per_doc, "doc_id", "left")
    n_dup = F.coalesce(F.col("n_dup_chunks"), F.lit(0).cast("long"))
    kept = F.col("n_words") - _CHUNK_W * n_dup
    return out.select(
        "doc_id",
        "source",
        "n_words",
        F.coalesce(F.col("n_chunks"), F.lit(0).cast("long")).alias("n_chunks"),
        n_dup.alias("n_dup_chunks"),
        kept.cast("long").alias("n_kept_tokens"),
        F.round(kept * 1.0 / F.col("n_words"), 6).alias("retained_frac"),
    )

# --- content-defined chunking (CDC) -----------------------------------------
# The fixed-width chunk tier above breaks under INSERTION: prepend one token
# and every downstream chunk boundary shifts, so a near-identical document
# shares zero chunk hashes with the original. Content-defined chunking (the
# rsync/LBFS/FastCDC idea, applied at token grain) draws a boundary wherever
# the TOKEN's own hash satisfies h % G == 0, so boundaries re-synchronize
# right after any local edit and the rest of the document dedups again.
# Expected chunk length = G tokens. Scale shape: one posexplode + one
# per-document window (partitioned by doc_id — no global ordering), one
# grouped shuffle on chunk hash; all linear.
_CDC_G = 16

@register(
    "cdc_chunk_dedup_stats",
    f"""
    WITH tok AS (
      SELECT doc_id, source, ws[i] AS w, i
      FROM (SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents),
           UNNEST(range(1, len(ws) + 1)) AS t(i)
    ), flagged AS (
      SELECT *, CASE WHEN CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)
                          % {_CDC_G} = 0 THEN 1 ELSE 0 END AS bnd
      FROM tok
    ), numbered AS (
      SELECT *, CAST(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY i
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS chunk_id
      FROM flagged
    ), chunks AS (
      SELECT doc_id, ANY_VALUE(source) AS source,
             md5(string_agg(w, ' ' ORDER BY i)) AS c,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM numbered GROUP BY doc_id, chunk_id
    ), freq AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM chunks GROUP BY c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_instances,
           ROUND(CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac,
           ROUND(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6) AS avg_chunk_toks
    FROM chunks JOIN freq USING (c)
    GROUP BY source
    """,
    doc=(
        f"content-defined chunking (boundary when h(token) %% {_CDC_G} == 0): "
        "insertion-robust exact substring dedup stats per source"
    ),
)
def cdc_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import _h32

    d = _with_words(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "source", F.posexplode("words").alias("i", "w")
    )
    flagged = tok.withColumn(
        "bnd", ((_h32(F.col("w")) % _CDC_G) == 0).cast("int")
    )
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("chunk_id", F.sum("bnd").over(w_doc).cast("long"))
    chunks = numbered.groupBy("doc_id", "chunk_id").agg(
        F.any_value("source").alias("source"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s["w"],
                ),
            )
        ).alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_toks"),
    )
    freq = chunks.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    joined = chunks.join(freq, "c")
    dup = F.sum((F.col("cnt") >= 2).cast("int"))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        dup.cast("long").alias("n_dup_instances"),
        F.round(dup.cast("double") / F.count(F.lit(1)), 6).alias("dup_frac"),
        F.round(F.sum("n_toks").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_chunk_toks"
        ),
    )

# --- hashed bigram language-model scoring -----------------------------------
# The unigram tier above ranks docs by isolated token frequency; real
# LM-based quality filters (CCNet's KenLM stage) score SEQUENCES. This is
# the bounded-model bigram form: token buckets (B=256) give a <= B^2-row
# conditional-frequency model — broadcast-safe at any corpus size, like the
# unigram hashed vocabulary — and each document's score is its mean Laplace
# log-probability ln((c(prev,cur)+1)/(c(prev)+B)) under that model. House
# exactness: per-pair log values are micro-quantized to integers in the
# tiny model table; per-doc sums are exact integer arithmetic; the final
# mean is one fixed-order double division chain.
_BIGRAM_B = 256
_SQL_BK = (
    f"list_transform({{ws}}, w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)"
    f" % {_BIGRAM_B})"
)

@register(
    "hashed_bigram_logprob",
    f"""
    WITH d AS (
      SELECT doc_id, source, {_SQL_BK.format(ws=_SQL_WORDS)} AS bk FROM documents
    ), pairs AS (
      SELECT doc_id, source, p FROM (
        SELECT doc_id, source,
               list_transform(range(2, len(bk) + 1),
                              i -> bk[i-1] * {_BIGRAM_B} + bk[i]) AS ps
        FROM d
      ), UNNEST(ps) AS t(p)
    ), pair_freq AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS c_pair FROM pairs GROUP BY p
    ), ctx_freq AS (
      SELECT p // {_BIGRAM_B} AS ctx, CAST(SUM(c_pair) AS BIGINT) AS c_ctx
      FROM pair_freq GROUP BY 1
    ), model AS (
      SELECT p, CAST(ROUND((ln(c_pair + 1) - ln(c_ctx + {_BIGRAM_B}))
                           * 1000000, 0) AS BIGINT) AS q
      FROM pair_freq JOIN ctx_freq ON p // {_BIGRAM_B} = ctx
    )
    SELECT doc_id, ANY_VALUE(source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(q) AS BIGINT) AS logprob_micro,
           ROUND(CAST(SUM(q) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
             AS avg_logprob
    FROM pairs JOIN model USING (p)
    GROUP BY doc_id
    """,
    doc=(
        f"hashed ({_BIGRAM_B}-bucket) bigram-LM mean log-probability per "
        "document — the bounded-model KenLM/CCNet sequence-quality shape "
        "(micro-quantized integer log arithmetic)"
    ),
)
def hashed_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import _h32

    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.transform(
            F.col("words"), lambda w: _h32(w) % _BIGRAM_B
        ).alias("bk"),
    )
    ps = F.when(
        F.size("bk") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("bk")),
            lambda i: F.element_at(F.col("bk"), (i - 1).cast("int")) * _BIGRAM_B
            + F.element_at(F.col("bk"), i.cast("int")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    pairs = d.select("doc_id", "source", F.explode(ps).alias("p"))
    pair_freq = pairs.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("c_pair")
    )
    ctx_freq = pair_freq.groupBy(
        (F.col("p") / _BIGRAM_B).cast("long").alias("ctx")
    ).agg(F.sum("c_pair").cast("long").alias("c_ctx"))
    model = (
        pair_freq.withColumn("ctx", (F.col("p") / _BIGRAM_B).cast("long"))
        .join(ctx_freq, "ctx")
        .select(
            "p",
            F.round(
                (F.log(F.col("c_pair") + 1) - F.log(F.col("c_ctx") + _BIGRAM_B))
                * 1000000,
                0,
            )
            .cast("long")
            .alias("q"),
        )
    )
    # model is <= B^2 rows by construction: the one bigram-model frame
    # whose broadcast is sound at any corpus size.
    scored = pairs.join(F.broadcast(model), "p")
    return scored.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("logprob_micro"),
        F.round(
            F.sum("q").cast("double") / F.lit(1000000.0) / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
    )


# Distribution-drift statistic (corpus monitoring / source QA): the exact
# two-sample Kolmogorov-Smirnov D of each source's document-length
# distribution against the REST of the corpus — the standard "did this
# source's length profile drift from the mix" gate a production corpus
# pipeline runs per ingest. Exactness: ECDF differences are evaluated as
# the integer cross multiplication |c_s·(N−n_s) − c_rest·n_s| over the
# merged jump points (D can only change at a jump of EITHER sample, so
# the merged distinct-value spine is the complete candidate set); one
# final IEEE division by n_s·(N−n_s) produces the double. Scale shape:
# lengths aggregate once per (source, value) — the only data-sized pass —
# then all work is on the bounded sources × distinct-values spine (the
# value domain of a length column is bounded; the spine crossJoin is two
# broadcast smalls, allowlisted). Both cumulatives are windows
# PARTITIONED BY SOURCE over that spine (the per-partition copy of the
# global t(v) series makes the "rest" cumulative per-source without any
# global window).
@register(
    "length_distribution_ks",
    """
    WITH a AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS a
      FROM documents GROUP BY 1, 2
    ), t AS (
      SELECT v, CAST(SUM(a) AS BIGINT) AS t FROM a GROUP BY 1
    ), spine AS (
      SELECT s.source, t.v, t.t, COALESCE(a.a, 0) AS a
      FROM (SELECT DISTINCT source FROM a) s
      CROSS JOIN t
      LEFT JOIN a ON a.source = s.source AND a.v = t.v
    ), cum AS (
      SELECT source, v,
             SUM(a) OVER (PARTITION BY source ORDER BY v) AS c_s,
             SUM(t) OVER (PARTITION BY source ORDER BY v) AS c_tot
      FROM spine
    ), sizes AS (
      SELECT source, CAST(SUM(a) AS BIGINT) AS n_s FROM a GROUP BY 1
    ), totals AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n FROM a
    )
    SELECT c.source, z.n_s AS n_docs,
           CAST(MAX(ABS(c.c_s * (tt.n - z.n_s) - (c.c_tot - c.c_s) * z.n_s))
                AS BIGINT) AS ks_scaled,
           ROUND(CAST(MAX(ABS(c.c_s * (tt.n - z.n_s) - (c.c_tot - c.c_s) * z.n_s))
                      AS DOUBLE) / (z.n_s * (tt.n - z.n_s)), 6) AS ks_d
    FROM cum c
    JOIN sizes z ON z.source = c.source
    CROSS JOIN totals tt
    GROUP BY c.source, z.n_s, tt.n
    """,
    doc=(
        "two-sample KS drift statistic per source vs rest-of-corpus on "
        "document lengths — exact integer ECDF cross multiplication, one "
        "final division"
    ),
)
def length_distribution_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    a = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    t = a.groupBy("v").agg(F.sum("a").cast("long").alias("t"))
    sources = a.select("source").distinct()
    # bounded × bounded: |sources| × |distinct length values|
    spine = (
        sources.crossJoin(F.broadcast(t))
        .join(a, ["source", "v"], "left")
        .select("source", "v", "t", F.coalesce("a", F.lit(0)).alias("a"))
    )
    w = Window.partitionBy("source").orderBy("v")
    cum = spine.select(
        "source",
        "v",
        F.sum("a").over(w).alias("c_s"),
        F.sum("t").over(w).alias("c_tot"),
    )
    sizes = a.groupBy("source").agg(F.sum("a").cast("long").alias("n_s"))
    totals = a.agg(F.sum("a").cast("long").alias("n"))
    scaled = F.abs(
        F.col("c_s") * (F.col("n") - F.col("n_s"))
        - (F.col("c_tot") - F.col("c_s")) * F.col("n_s")
    )
    return (
        cum.join(F.broadcast(sizes), "source")
        .crossJoin(F.broadcast(totals))
        .groupBy("source", "n_s", "n")
        .agg(F.max(scaled).cast("long").alias("ks_scaled"))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            "ks_scaled",
            F.round(
                F.col("ks_scaled").cast("double")
                / (F.col("n_s") * (F.col("n") - F.col("n_s"))),
                6,
            ).alias("ks_d"),
        )
    )
