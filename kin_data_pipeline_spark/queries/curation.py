"""Corpus-curation queries a large-scale training-data pipeline needs on
top of dedup/similarity: benchmark decontamination, deterministic
train/val/test splitting, Gopher-style quality gating, and intra-document
repetition profiling — all JVM built-ins, all oracle-checked.

Scale notes: decontamination joins the corpus against the (small) benchmark
shingle set — a broadcast join, shuffle bounded by corpus postings, never a
cross join; splitting and quality gating are embarrassingly parallel scans
with a final partial-aggregated groupBy; repetition profiling shuffles on
(doc_id) only, so it scales with corpus size, not pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries.llmops import (
    LSH_BANDS,
    document_bands,
    document_signatures,
    _SQL_SHINGLES,
    _SQL_WORDS,
    STOPWORDS,
    _minhash_sql_exprs,
    _shingles_of_words,
    _with_words,
    shingled_documents,
)
from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

# Benchmark set for decontamination: one held-out source plays the role of
# the eval benchmark. The same literal drives both engines.
_BENCH_SOURCE = "src0"
# contaminated ⟺ hits/n_shingles >= 1/5, compared in integers (5*hits >=
# n_shingles) so the flag never depends on floating-point rounding.
_CONTAM_DEN = 5

# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents sharing k-shingles with
# the benchmark set. The benchmark shingle vocabulary is tiny relative to
# the corpus, so Spark broadcasts it; the corpus side streams through as
# exploded postings — at 100 TB this is one scan + one broadcast hash join.
@register(
    "benchmark_decontamination",
    f"""
    WITH d AS (
      SELECT doc_id, source, {_SQL_SHINGLES} AS shingles FROM documents
    ),
    bench AS (
      SELECT DISTINCT t.s FROM d, UNNEST(d.shingles) AS t(s)
      WHERE d.source = '{_BENCH_SOURCE}'
    ),
    corpus AS (
      SELECT d.doc_id, d.source, len(d.shingles) AS n_shingles, t.s
      FROM d, UNNEST(d.shingles) AS t(s)
      WHERE d.source <> '{_BENCH_SOURCE}'
    )
    SELECT c.doc_id, c.source,
           CAST(c.n_shingles AS BIGINT) AS n_shingles,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(COUNT(*) * 1.0 / c.n_shingles, 6) AS contamination_ratio,
           CAST(COUNT(*) * {_CONTAM_DEN} >= c.n_shingles AS BIGINT) AS contaminated
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id, c.source, c.n_shingles
    """,
    doc="benchmark decontamination: corpus docs sharing shingles with the held-out set",
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = shingled_documents(spark, sf_dir)
    bench = (
        docs.filter(F.col("source") == _BENCH_SOURCE)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    corpus = docs.filter(F.col("source") != _BENCH_SOURCE).select(
        "doc_id",
        "source",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    )
    hits = (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "source", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.select(
        "doc_id",
        "source",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        "n_hits",
        F.round(F.col("n_hits") * 1.0 / F.col("n_shingles"), 6).alias(
            "contamination_ratio"
        ),
        (F.col("n_hits") * _CONTAM_DEN >= F.col("n_shingles"))
        .cast("long")
        .alias("contaminated"),
    )

# ---------------------------------------------------------------------------
# Deterministic stratified train/val/test split: the split key is a pure
# function of doc_id (md5 prefix mod 100), so assignment is reproducible
# across runs, engines, and cluster sizes — no sampling RNG, no driver
# state. Per-(source, split) accounting validates the stratification.
@register(
    "stratified_sample_split",
    """
    WITH s AS (
      SELECT source, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 100 AS h
      FROM documents
    )
    SELECT source,
           CASE WHEN h < 10 THEN 'test' WHEN h < 20 THEN 'val'
                ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1, 2
    """,
    doc="deterministic hash-based train/val/test split with per-source accounting",
)
def stratified_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    s = load_table(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.when(h < 10, "test").when(h < 20, "val").otherwise("train").alias("split"),
    )
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )

# ---------------------------------------------------------------------------
# Gopher-style quality gate: rule flags per document, funnel accounting per
# source. All thresholds compare integers (char counts scaled by token
# counts) so no flag ever sits on a floating-point boundary.
_MIN_TOKENS = 30
_MIN_STOP_HITS = 2
_MIN_MEAN_LEN = 2  # mean token length bounds, in chars
_MAX_MEAN_LEN = 12

@register(
    "gopher_quality_flags",
    f"""
    WITH t AS (
      SELECT source,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             CAST(len(list_filter({_SQL_WORDS},
               w -> w IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS BIGINT)
               AS n_stop,
             length(trim(text)) AS n_trim_chars
      FROM documents
    ),
    f AS (
      SELECT source,
             CAST(n_tokens < {_MIN_TOKENS} AS BIGINT) AS too_short,
             CAST(n_stop < {_MIN_STOP_HITS} AS BIGINT) AS low_stopword,
             CAST((n_trim_chars - (n_tokens - 1)) < {_MIN_MEAN_LEN} * n_tokens
                  OR (n_trim_chars - (n_tokens - 1)) > {_MAX_MEAN_LEN} * n_tokens
                  AS BIGINT) AS bad_word_len
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(too_short) AS BIGINT) AS n_too_short,
           CAST(SUM(low_stopword) AS BIGINT) AS n_low_stopword,
           CAST(SUM(bad_word_len) AS BIGINT) AS n_bad_word_len,
           CAST(SUM(CASE WHEN too_short = 0 AND low_stopword = 0
                         AND bad_word_len = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           ROUND(SUM(CASE WHEN too_short = 0 AND low_stopword = 0
                          AND bad_word_len = 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS pass_rate
    FROM f GROUP BY source
    """,
    doc="Gopher-style quality rule funnel per source (length/stopword/word-length gates)",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    t = _with_words(load_table(spark, sf_dir, "documents")).select(
        "source",
        F.size("words").cast("long").alias("n_tokens"),
        F.size(F.filter("words", lambda w: F.array_contains(stop_arr, w)))
        .cast("long")
        .alias("n_stop"),
        F.length(F.trim(F.col("text"))).alias("n_trim_chars"),
    )
    chars_sans_seps = F.col("n_trim_chars") - (F.col("n_tokens") - 1)
    f = t.select(
        "source",
        (F.col("n_tokens") < _MIN_TOKENS).cast("long").alias("too_short"),
        (F.col("n_stop") < _MIN_STOP_HITS).cast("long").alias("low_stopword"),
        (
            (chars_sans_seps < _MIN_MEAN_LEN * F.col("n_tokens"))
            | (chars_sans_seps > _MAX_MEAN_LEN * F.col("n_tokens"))
        )
        .cast("long")
        .alias("bad_word_len"),
    )
    passed = F.when(
        (F.col("too_short") == 0)
        & (F.col("low_stopword") == 0)
        & (F.col("bad_word_len") == 0),
        1,
    ).otherwise(0)
    return f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("too_short").cast("long").alias("n_too_short"),
        F.sum("low_stopword").cast("long").alias("n_low_stopword"),
        F.sum("bad_word_len").cast("long").alias("n_bad_word_len"),
        F.sum(passed).cast("long").alias("n_pass"),
        F.round(F.sum(passed) * 1.0 / F.count(F.lit(1)), 6).alias("pass_rate"),
    )

# ---------------------------------------------------------------------------
# Intra-document repetition: the most-repeated bigram's share of all bigram
# slots (the Gopher "duplicate n-gram fraction" rule, n=2). Bigrams are NOT
# deduplicated — repetition is the signal. Shuffles on (doc_id, bigram)
# then (doc_id): linear in corpus size.
@register(
    "doc_repetition_profile",
    f"""
    WITH d AS (
      SELECT doc_id, {_SQL_WORDS} AS words FROM documents
    ),
    g AS (
      SELECT d.doc_id, len(d.words) - 1 AS n_bigrams, t.bg
      FROM d, UNNEST(list_transform(range(1, len(d.words)),
                     i -> d.words[i] || ' ' || d.words[i + 1])) AS t(bg)
    ),
    c AS (
      SELECT doc_id, n_bigrams, bg, COUNT(*) AS cnt
      FROM g GROUP BY doc_id, n_bigrams, bg
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(MAX(cnt) AS BIGINT) AS max_bigram_count,
           ROUND(MAX(cnt) * 1.0 / n_bigrams, 6) AS repetition_ratio
    FROM c GROUP BY doc_id, n_bigrams
    """,
    doc="duplicate-bigram fraction per document (Gopher repetition rule, n=2)",
)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.col("words")
    # guarded like operators.dedup.shingles: a 1-word doc must yield an
    # empty bigram list (oracle range semantics), not abort on element_at(0)
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        (F.size(w) - 1).cast("long").alias("n_bigrams"),
        F.explode(bigrams).alias("bg"),
    )
    c = d.groupBy("doc_id", "n_bigrams", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    return c.groupBy("doc_id", "n_bigrams").agg(
        F.max("cnt").cast("long").alias("max_bigram_count"),
        F.round(F.max("cnt") * 1.0 / F.col("n_bigrams"), 6).alias("repetition_ratio"),
    )

# ---------------------------------------------------------------------------
# The dedup DECISION applied to the corpus: one canonical document per
# transitive near-dup cluster (min doc_id), every unclustered document kept.
# This is the keep-list a curation pipeline materializes after pair
# generation + clustering; per-source survivor counts summarize the effect.
from kin_data_pipeline_spark.queries.llmops import _CAPPED_PAIRS_CTES

@register(
    "dedup_survivor_stats",
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
    kept AS (
      SELECT d.doc_id, d.source,
             CASE WHEN l.cluster_id IS NULL OR l.cluster_id = d.doc_id
                  THEN 1 ELSE 0 END AS keep
      FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dropped,
           ROUND(SUM(keep) * 1.0 / COUNT(*), 6) AS keep_ratio
    FROM kept GROUP BY source
    """,
    doc="per-source corpus survivors after transitive near-dup dedup (keep min doc_id per cluster)",
)
def dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import near_dup_clusters

    labels = near_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = docs.join(F.broadcast(labels), "doc_id", "left").withColumn(
        "keep",
        F.when(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("long").alias("n_dropped"),
        F.round(F.sum("keep") * 1.0 / F.count(F.lit(1)), 6).alias("keep_ratio"),
    )

# ---------------------------------------------------------------------------
# Regex redaction statistics — the scrubbing pass (PII/digit-run removal) a
# training pipeline runs before tokenization. Patterns are restricted to
# syntax with identical semantics in Java regex (Spark) and RE2 (DuckDB);
# counting + redacted-length math is exact integers. The documents corpus is
# digit-free word salad, so the registered instance scrubs ``events.props``
# (JSON payloads, digit-rich) — the operator applies to any string column.
# One scan, partial-aggregated groupBy: embarrassingly parallel at 100 TB.
_REDACT_PATTERNS = {
    # digit runs of >=3 (ids, phone fragments, zip codes)
    "digit_run": r"\d{3,}",
    # quoted JSON string values (would carry free-text PII in real feeds)
    "quoted_value": r'"[A-Za-z][A-Za-z0-9_]*"\s*:\s*"[^"]*"',
}

def redaction_stats(
    df: DataFrame, text_col: str, patterns: dict[str, str], group_col: str
) -> DataFrame:
    """Per-group counts of pattern matches and characters a global
    ``regexp_replace`` would remove. Reusable over any string column."""
    out = df.select(group_col, text_col)
    for name, pat in patterns.items():
        out = out.withColumn(
            f"__n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        ).withColumn(
            f"__c_{name}",
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), pat, "")),
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name in patterns:
        aggs.append(F.sum(f"__n_{name}").cast("long").alias(f"n_{name}"))
        aggs.append(F.sum(f"__c_{name}").cast("long").alias(f"chars_{name}"))
        aggs.append(
            F.sum((F.col(f"__n_{name}") > 0).cast("int"))
            .cast("long")
            .alias(f"rows_with_{name}")
        )
    return out.groupBy(group_col).agg(*aggs)

@register(
    "redaction_stats_props",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(len(regexp_extract_all(props, '{_REDACT_PATTERNS["digit_run"]}'))) AS BIGINT) AS n_digit_run,
           CAST(SUM(length(props) - length(regexp_replace(props, '{_REDACT_PATTERNS["digit_run"]}', '', 'g'))) AS BIGINT) AS chars_digit_run,
           CAST(SUM(CASE WHEN regexp_matches(props, '{_REDACT_PATTERNS["digit_run"]}') THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_digit_run,
           CAST(SUM(len(regexp_extract_all(props, '{_REDACT_PATTERNS["quoted_value"].replace("'", "''")}'))) AS BIGINT) AS n_quoted_value,
           CAST(SUM(length(props) - length(regexp_replace(props, '{_REDACT_PATTERNS["quoted_value"].replace("'", "''")}', '', 'g'))) AS BIGINT) AS chars_quoted_value,
           CAST(SUM(CASE WHEN regexp_matches(props, '{_REDACT_PATTERNS["quoted_value"].replace("'", "''")}') THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_quoted_value
    FROM events GROUP BY event_type
    """,
    doc="regex scrubbing stats (digit runs, quoted JSON values) over events.props, per event type",
)
def redaction_stats_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return redaction_stats(ev, "props", _REDACT_PATTERNS, "event_type")

# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing — the GPT-style training-prep step:
# documents are concatenated in a deterministic order and sliced into
# fixed-budget chunks; each document's chunk span follows from its start
# offset (a windowed prefix sum). Packing is PER SOURCE, so the window is
# partitioned — the 100 TB form shards the cumsum instead of forcing a
# global single-partition sort (the per-source window is the same shape the
# kin daily models use; see operators/rangejoin.py's grain note).
_PACK_BUDGET = 512  # tokens per chunk

@register(
    "sequence_packing_index",
    f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, source, n_tokens,
             -- DuckDB SUM(BIGINT) widens to HUGEINT -> Arrow decimal128; the
             -- driver canon renders decimals float-style so an uncast window
             -- sum can never hash-match. CAST keeps the terminal BIGINT.
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, source, n_tokens, start_offset,
           CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS first_chunk,
           CAST(GREATEST(start_offset, start_offset + n_tokens - 1) // {_PACK_BUDGET} AS BIGINT) AS last_chunk,
           CAST(GREATEST(start_offset, start_offset + n_tokens - 1) // {_PACK_BUDGET}
                - start_offset // {_PACK_BUDGET} + 1 AS BIGINT) AS n_chunks
    FROM o
    """,
    doc="concat-and-chunk packing index (512-token chunks, per-source concat order)",
)
def sequence_packing_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _with_words(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "source", F.size("words").cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = t.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    last_tok = F.greatest(
        F.col("start_offset"), F.col("start_offset") + F.col("n_tokens") - 1
    )
    o = o.withColumn("__last_tok", last_tok)
    # integer DIV, never floor(double division): exact at any offset
    # magnitude (float division rounds past 2^53), pairing with the
    # oracle's `//` per the cross-engine house rule
    first_chunk = F.expr(f"start_offset DIV {_PACK_BUDGET}")
    last_chunk = F.expr(f"__last_tok DIV {_PACK_BUDGET}")
    return o.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks"),
    )

# ---------------------------------------------------------------------------
# Per-source frequency cap — bound any one source's share of the corpus
# (domain caps in web-scale pipelines). The keep-set must be deterministic
# and engine-independent, so ranking order is md5(doc_id) — stable across
# engines, uncorrelated with document content. rank <= cap is a windowed
# top-k per group: shuffles once on source, no global sort.
_SOURCE_CAP = 50

@register(
    "source_cap_sample",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_SOURCE_CAP}
    """,
    doc=f"deterministic per-source frequency cap (keep {_SOURCE_CAP} docs/source by md5 order)",
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _SOURCE_CAP)
    )

# ---------------------------------------------------------------------------
# Incremental dedup — the production shape at 100 TB: data arrives in
# batches, and each batch is checked against the EXISTING corpus without
# re-clustering anything. Corpus MinHash signatures are a precomputed,
# incrementally-maintained table (here: the session-cached signature frame);
# only the arriving batch is hashed fresh. The probe is a banded bucket
# join with the small batch side broadcast — cost is linear in batch size
# plus one corpus-signature scan, never corpus × corpus. Batch membership
# is a deterministic modulo so both engines pick the same split.
_BATCH_MOD = 7  # doc_id % 7 == 0 plays the arriving batch (~14%)

@register(
    "incremental_dedup_check",
    f"""
    WITH sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ), sig AS (
      SELECT doc_id, {', '.join(_minhash_sql_exprs())}
      FROM sh GROUP BY doc_id
    ), bands AS (
      {' UNION ALL '.join(
        f"SELECT doc_id, {bi} AS band_id, CAST(mh{r0} AS VARCHAR) || ':' || CAST(mh{r1} AS VARCHAR) AS band_key FROM sig"
        for bi, (r0, r1) in enumerate(LSH_BANDS)
      )}
    ), hits AS (
      SELECT a.doc_id, CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_collisions
      FROM bands a JOIN bands c
        ON a.band_id = c.band_id AND a.band_key = c.band_key
       AND a.doc_id % {_BATCH_MOD} = 0 AND c.doc_id % {_BATCH_MOD} <> 0
      GROUP BY a.doc_id
    )
    SELECT s.doc_id,
           COALESCE(h.n_collisions, 0) AS n_collisions,
           CAST(COALESCE(h.n_collisions, 0) > 0 AS INT) AS is_dup
    FROM sig s LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE s.doc_id % {_BATCH_MOD} = 0
    """,
    doc="arriving-batch near-dup probe against corpus LSH bands (no re-cluster)",
)
def incremental_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import (
        _minhash_spark_exprs,
        shingled_documents,
    )

    sh = shingled_documents(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    sig = sh.groupBy("doc_id").agg(*_minhash_spark_exprs())
    bands = document_bands(sig)
    batch = bands.filter(F.col("doc_id") % _BATCH_MOD == 0)
    corpus = bands.filter(F.col("doc_id") % _BATCH_MOD != 0).select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    hits = (
        F.broadcast(batch)
        .join(corpus, ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(F.count_distinct("corpus_doc").cast("long").alias("n_collisions"))
    )
    all_batch = sig.filter(F.col("doc_id") % _BATCH_MOD == 0).select("doc_id")
    return (
        all_batch.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
            (F.coalesce("n_collisions", F.lit(0)) > 0).cast("int").alias("is_dup"),
        )
    )

# ---------------------------------------------------------------------------
# Mixture resampling — reweighting the per-source composition of a training
# corpus (e.g. upweight curated sources, downsample web crawl). Selection
# must be deterministic, engine-independent, and per-document stable, so a
# document is kept iff the first 8 hex chars of md5(doc_id) — a uniform
# 32-bit draw — fall under the source's keep-rate threshold. One scan, no
# shuffle at all for the selection itself (the stats roll up per source).
_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.1}

def _mix_threshold(rate: float) -> int:
    return int(rate * 0xFFFFFFFF)

@register(
    "source_mix_resample",
    f"""
    WITH draw AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS u32,
             CASE source
               {' '.join(f"WHEN '{s}' THEN CAST({_mix_threshold(w)} AS BIGINT)" for s, w in _MIX_WEIGHTS.items())}
               ELSE CAST(0 AS BIGINT) END AS threshold
      FROM documents
    )
    SELECT doc_id, source FROM draw WHERE u32 <= threshold
    """,
    doc="deterministic mixture resampling: md5-threshold keep per source weight",
)
def source_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    thr = None
    for s, w in _MIX_WEIGHTS.items():
        lit = F.lit(_mix_threshold(w)).cast("long")
        thr = (
            F.when(F.col("source") == s, lit)
            if thr is None
            else thr.when(F.col("source") == s, lit)
        )
    # sources absent from the mixture spec drop out entirely
    thr = thr.otherwise(F.lit(0).cast("long"))
    return docs.filter(u32 <= thr).select("doc_id", "source")

# ---------------------------------------------------------------------------
# Token-budget selection — the data-mixing primitive: per source, keep the
# highest-quality documents until a token budget fills (quality proxy =
# distinct-word ratio; md5-free since the ORDER is the product here, not a
# sample). One window shuffle on source: rank and running token total come
# from the same partition spec, and the budget cut is a filter — no global
# sort, no iteration. At 100 TB the per-source partitions are the natural
# parallel unit (sources ≫ executors).
_TOKEN_BUDGET = 800

@register(
    "token_budget_selection",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             len(list_distinct({_SQL_WORDS})) * 1.0 / len({_SQL_WORDS}) AS dr
      FROM documents
    ), r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY dr DESC, doc_id ASC) AS rk,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY dr DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM q
    )
    SELECT doc_id, source, n_tokens,
           CAST(rk AS BIGINT) AS rk, CAST(cum AS BIGINT) AS cum_tokens
    FROM r WHERE cum <= {_TOKEN_BUDGET}
    """,
    doc=f"per-source token-budget selection: best docs by distinct-ratio until {_TOKEN_BUDGET} tokens",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    q = docs.select(
        "doc_id",
        "source",
        F.size(words).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(words)) * 1.0 / F.size(words)).alias("dr"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("dr"), F.asc("doc_id"))
    r = q.select(
        "doc_id",
        "source",
        "n_tokens",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_tokens"
        ),
    )
    return r.filter(F.col("cum_tokens") <= _TOKEN_BUDGET)

# ---------------------------------------------------------------------------
# Training-shard manifest — the export step's accounting surface. Placement
# is the md5-deterministic assignment from operators/shards.py (any engine
# recomputes it; re-exports after incremental updates move only changed
# docs); the manifest is the per-shard doc/token summary a data loader
# schedules epochs from. The writer itself (write_training_shards) is
# exercised by tests/test_shards.py — a driver query can't have write side
# effects, so the registered surface is the pure assignment + accounting.

_N_SHARDS = 16

@register(
    "training_shard_manifest",
    f"""
    WITH a AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)
                  % {_N_SHARDS} AS INT) AS shard,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM a GROUP BY shard
    """,
    doc=f"deterministic {_N_SHARDS}-way training-shard assignment + per-shard manifest",
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.shards import shard_assignment, shard_manifest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    return shard_manifest(shard_assignment(docs, "doc_id", _N_SHARDS), "n_tokens")

# DSIR-shaped importance scores (Xie et al., "Data Selection for Language
# Models via Importance Resampling", arXiv:2302.03169 — public method): rank
# raw-corpus documents by how much more likely their tokens are under a
# TARGET domain's unigram distribution than under the raw corpus's. House
# arithmetic style: log-free and exact — per-document target/reference token
# masses are integer sums (order-independent), the ratio is one final
# double division. The global n_ref/n_target normalization is the same
# constant for every document, so it cannot change the resampling RANKING
# and is deliberately omitted (keeps the plan free of a 1-row totals
# cross-join). Tokens unseen in the target contribute 0 mass; their
# fraction is reported as oov_frac (high-oov docs are poor targets no
# matter the ratio).
@register(
    "dsir_importance_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), tgt AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cf_t FROM tok
      WHERE source = '{_BENCH_SOURCE}' GROUP BY w
    ), ref AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cf_r FROM tok GROUP BY w
    )
    SELECT tok.doc_id, ANY_VALUE(tok.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(tgt.cf_t, 0)) AS BIGINT) AS tgt_mass,
           CAST(SUM(ref.cf_r) AS BIGINT) AS ref_mass,
           ROUND(SUM(COALESCE(tgt.cf_t, 0)) * 1.0 / SUM(ref.cf_r), 6)
             AS importance_ratio,
           ROUND(SUM(CASE WHEN tgt.cf_t IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS oov_frac
    FROM tok
    JOIN ref ON tok.w = ref.w
    LEFT JOIN tgt ON tok.w = tgt.w
    WHERE tok.source <> '{_BENCH_SOURCE}'
    GROUP BY tok.doc_id
    """,
    doc=(
        "DSIR-shaped importance scores: target-vs-corpus unigram MASS ratio "
        "per raw doc (log-free). NOT ranking-equivalent to DSIR's importance "
        "weight sum(log p_t - log p_r): the mass ratio is dominated by a "
        "doc's highest-frequency tokens while the log sum weights every "
        "token equally — dsir_log_importance_scores is the faithful form"
    ),
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import doc_tokens

    tok = doc_tokens(spark, sf_dir)
    # The two unigram "models" are vocabulary-sized aggregates. NO broadcast
    # hints: the reference vocabulary grows with the corpus (billions of
    # distinct whitespace tokens on open web at 100 TB) and the target
    # vocabulary grows with the benchmark set, so a forced hint risks
    # driver/executor OOM and disables AQE's runtime fallback. AQE picks
    # broadcast from observed stats when a side really is small; otherwise
    # both score joins shuffle on `w` — the sound plan at scale. The
    # bounded-by-construction alternative is a hashed vocabulary
    # (the published CCNet/DSIR shape); see PLANS.md "Vocabulary-scale
    # boundary" and filtering.hashed_token_rarity_scores.
    tgt = (
        tok.filter(F.col("source") == _BENCH_SOURCE)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cf_t"))
    )
    # The reference distribution is the WHOLE corpus, target included —
    # DSIR's raw-corpus reference. (Excluding the target would change the
    # per-document ranking, unlike the omitted global normalization.)
    ref = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cf_r"))
    scored = (
        tok.filter(F.col("source") != _BENCH_SOURCE)
        .join(ref, "w")
        .join(tgt, "w", "left")
    )
    return scored.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.coalesce("cf_t", F.lit(0))).cast("long").alias("tgt_mass"),
        F.sum("cf_r").cast("long").alias("ref_mass"),
        F.round(
            F.sum(F.coalesce("cf_t", F.lit(0))) * 1.0 / F.sum("cf_r"), 6
        ).alias("importance_ratio"),
        F.round(
            F.sum(F.col("cf_t").isNull().cast("int")) * 1.0 / F.count(F.lit(1)), 6
        ).alias("oov_frac"),
    )

# Faithful DSIR importance weights: sum over a document's tokens of
# log p_target(token) - log p_reference(token), the published form
# (Xie et al., "Data Selection for Language Models via Importance
# Resampling"), which weights every token equally — unlike the mass-ratio
# sibling above, whose ranking is dominated by a doc's highest-frequency
# tokens. Two design choices make it sound at 100 TB AND hash-exact across
# engines:
#
# - HASHED VOCABULARY (the published DSIR shape): tokens hash into B=4096
#   buckets, so both unigram models are <= B rows and broadcast is safe by
#   construction at any corpus size (PLANS.md "Vocabulary-scale boundary").
#   Laplace smoothing (+1 per bucket) handles target-OOV buckets.
# - MICRO-QUANTIZED LOG ARITHMETIC: ln() is engine-dependent in the last
#   ulp, so per-BUCKET log-ratios are quantized to integer micro-units
#   (round(x*1e6) as BIGINT) in the tiny model table; per-document scores
#   are then EXACT integer sums, and the final /1e6 is the same IEEE
#   division on both engines. The only cross-engine float op is one ln()
#   per bucket, where a 1-ulp difference flips the hash only if the value
#   sits within ~1e-10 of a quantization boundary (~4096 chances, ~1e-10
#   each — negligible, and deterministic per corpus).
_DSIR_B = 4096
_SQL_DSIR_BUCKET = f"CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {_DSIR_B}"

@register(
    "dsir_log_importance_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {_SQL_DSIR_BUCKET} AS b FROM (
        SELECT doc_id, source, w FROM (
          SELECT doc_id, source, {_SQL_WORDS} AS ws FROM documents
        ), UNNEST(ws) AS t(w)
      )
    ),
    ref AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cf_r FROM tok GROUP BY b),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cf_t FROM tok
            WHERE source = '{_BENCH_SOURCE}' GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_r,
                   CAST(SUM(CASE WHEN source = '{_BENCH_SOURCE}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_t
            FROM tok),
    model AS (
      SELECT ref.b,
             CAST(ROUND((ln(COALESCE(tgt.cf_t, 0) + 1)
                         - ln(CAST(tot.n_t + {_DSIR_B} AS DOUBLE))
                         - ln(ref.cf_r + 1)
                         + ln(CAST(tot.n_r + {_DSIR_B} AS DOUBLE))) * 1000000)
                  AS BIGINT) AS q
      FROM ref LEFT JOIN tgt ON ref.b = tgt.b CROSS JOIN tot
    )
    SELECT doc_id, ANY_VALUE(source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(q) AS BIGINT) AS logratio_micro,
           ROUND(CAST(SUM(q) AS BIGINT) / 1000000.0, 6) AS importance_logratio
    FROM tok JOIN model USING (b)
    WHERE source <> '{_BENCH_SOURCE}'
    GROUP BY doc_id
    """,
    doc=(
        f"faithful DSIR importance weights: per-doc sum of smoothed "
        f"log p_target - log p_reference over a {_DSIR_B}-bucket hashed "
        "vocabulary (micro-quantized integer log arithmetic)"
    ),
)
def dsir_log_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import _h32, doc_tokens

    tok = doc_tokens(spark, sf_dir).select(
        "doc_id", "source", (_h32(F.col("w")) % _DSIR_B).alias("b")
    )
    ref = tok.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cf_r"))
    tgt = (
        tok.filter(F.col("source") == _BENCH_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cf_t"))
    )
    # model table: <= B rows. The corpus/target token totals are recovered
    # from the bucket counts themselves (sum over all buckets) via a global
    # window over this BOUNDED frame — a single-partition pass over 4096
    # rows, which avoids any totals join (a constant-key join gets
    # constant-folded into the nested-loop shape the registry-wide plan
    # test forbids).
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    model = (
        ref.join(tgt, "b", "left")
        .withColumn("n_r", F.sum("cf_r").over(w_all))
        .withColumn("n_t", F.sum(F.coalesce(F.col("cf_t"), F.lit(0))).over(w_all))
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce(F.col("cf_t"), F.lit(0)) + 1)
                    - F.log(F.col("n_t") + F.lit(_DSIR_B))
                    - F.log(F.col("cf_r") + 1)
                    + F.log(F.col("n_r") + F.lit(_DSIR_B))
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("q"),
        )
    )
    scored = tok.filter(F.col("source") != _BENCH_SOURCE).join(
        F.broadcast(model), "b"
    )
    return scored.groupBy("doc_id").agg(
        F.any_value("source").alias("source"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("q").cast("long").alias("logratio_micro"),
        F.round(F.sum("q").cast("long") / F.lit(1000000.0), 6).alias(
            "importance_logratio"
        ),
    )

# Source vocabulary-overlap matrix: pairwise Jaccard of the distinct-token
# vocabularies of every source pair — the lexical complement of the
# content-level cross_source_dup_matrix (shared TOKENS flag sibling scrapes
# or shared registers even when no document is a near-dup). Scale shape:
# the per-token source list is bounded by the SOURCE count (datasets, not
# documents — tens, not billions), so the pair expansion per token is at
# most C(n_sources, 2); one distinct pass + one grouped pair count, no
# all-pairs join of anything corpus-sized.
@register(
    "source_vocab_overlap",
    f"""
    WITH vocab AS (
      SELECT DISTINCT source, w FROM (
        SELECT source, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), sizes AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM vocab GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_shared,
           sa.v AS vocab_a, sb.v AS vocab_b,
           ROUND(i.n_shared * 1.0 / (sa.v + sb.v - i.n_shared), 6)
             AS vocab_jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    doc="pairwise vocabulary Jaccard between sources (lexical mixing-audit matrix)",
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.queries.llmops import doc_tokens

    vocab = doc_tokens(spark, sf_dir).select("source", "w").distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("v"))
    a = vocab.select(F.col("source").alias("source_a"), "w")
    b = vocab.select(F.col("source").alias("source_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("v").alias("vocab_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("v").alias("vocab_b"))),
            "source_b",
        )
    )
    return out.select(
        "source_a",
        "source_b",
        "n_shared",
        "vocab_a",
        "vocab_b",
        F.round(
            F.col("n_shared") * 1.0 / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
            6,
        ).alias("vocab_jaccard"),
    )

# Temperature-scaled source mixing weights — the multinomial sampling
# primitive every multi-source LLM training run uses (mT5/PaLM-style
# p_i ∝ n_i^alpha with alpha < 1 upweighting small sources). alpha = 0.5
# here (temperature tau = 2 over token mass). Cross-engine exactness, house
# style: the only float op per source is one sqrt, immediately quantized to
# integer micro-units; the normalizing denominator is then an EXACT integer
# sum, and each weight is a single IEEE division. Scale shape: everything
# after the one token-count aggregation lives on a frame bounded by the
# SOURCE count (datasets, not documents), where the global window is a
# single-partition pass over tens of rows.
@register(
    "source_temperature_weights",
    """
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), scaled AS (
      SELECT *, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000, 0) AS BIGINT)
               AS s_micro
      FROM per_source
    )
    SELECT source, n_docs, n_tokens, s_micro,
           ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6) AS raw_frac,
           ROUND(CAST(s_micro AS DOUBLE) / SUM(s_micro) OVER (), 6) AS weight_alpha05
    FROM scaled
    """,
    doc=(
        "temperature-scaled (alpha=0.5) source sampling weights over token "
        "mass — the multi-source mixing primitive (micro-quantized sqrt, "
        "integer normalizer)"
    ),
)
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    scaled = per_source.withColumn(
        "s_micro",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1000000, 0).cast("long"),
    )
    w_all = Window.partitionBy()
    return scaled.select(
        "source",
        "n_docs",
        "n_tokens",
        "s_micro",
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all), 6
        ).alias("raw_frac"),
        F.round(
            F.col("s_micro").cast("double") / F.sum("s_micro").over(w_all), 6
        ).alias("weight_alpha05"),
    )

# Deterministic WEIGHTED sampling (priority sampling / exponential-keys
# shape, integer-exact): each doc draws a uniform 32-bit key from its id
# hash and competes with priority = key/weight — larger weights get
# systematically smaller priorities, so the global k smallest form a
# weighted-without-replacement sample (Duffield/Lund/Thorup priority
# sampling; the deterministic sibling of A-ExpJ). Here weight = n_chars
# (longer docs oversampled, the length-balanced shard shape). All integer:
# priority = h·10⁶ DIV w ≤ 2³²·10⁶ < 2⁶². Selection compiles to
# TakeOrderedAndProject (per-partition heaps, k-row driver merge) — the
# rank window runs on the 50 selected rows only, never the corpus.
@register(
    "weighted_doc_sample_top50",
    """
    WITH d AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  AS BIGINT) AS h
      FROM documents WHERE n_chars > 0
    ), p AS (
      SELECT doc_id, source, n_chars, (h * 1000000) // n_chars AS priority
      FROM d
    )
    SELECT doc_id, source, n_chars, priority,
           CAST(ROW_NUMBER() OVER (ORDER BY priority ASC, doc_id ASC) AS INT)
             AS rnk
    FROM p ORDER BY priority ASC, doc_id ASC LIMIT 50
    """,
    doc="deterministic weighted sampling: integer priority = hash/weight, global top-50",
)
def weighted_doc_sample_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .withColumn("priority", F.expr("h * 1000000 DIV n_chars"))
    )
    top = d.orderBy(F.asc("priority"), F.asc("doc_id")).limit(50)
    w = Window.orderBy(F.asc("priority"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        "priority",
        F.row_number().over(w).cast("int").alias("rnk"),
    )
