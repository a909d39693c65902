"""Beyond-reference LLM-data-pipeline queries (BASELINE.json north star):
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity
search (brute-force cosine top-k), and text analysis (token stats, quality,
stopword profiling, fingerprinting) over the ``documents`` / ``embeddings``
tables.

Hash functions are built from md5 hex prefixes so Spark and the DuckDB
oracle compute bit-identical integers (Spark ``conv(hex,16,10)`` ↔ DuckDB
``CAST('0x…' AS BIGINT)``); MinHash parameters keep every product under
2^62 so 64-bit arithmetic never overflows on either engine.

Scale notes: all doc-level operators are embarrassingly parallel scans;
the pair-forming joins (Jaccard, LSH) shuffle on shingle/bucket keys, never
cross-join the corpus; the brute-force k-NN broadcasts only the query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

# --- shared constants (drive BOTH the Spark and the oracle side) -----------

SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
# Max shingle document-frequency before a posting list is dropped from pair
# formation (the stopword/skew guard). This cap is the CANONICAL near-dup
# semantics: at open-web scale an uncapped postings join is quadratic in the
# hottest shingle's df. The exact form survives as the unregistered
# `ngram_jaccard_exact` (tests only).
JACCARD_DF_CAP = 50
MINHASH_PRIME = 2147483647  # 2^31 - 1
# (a, b) pairs, a,b < 2^30 → a*h32 + b < 2^62: no 64-bit overflow anywhere.
MINHASH_PARAMS = [
    (387420489, 12190087),
    (962892417, 55555333),
    (29986577, 271828182),
    (536870923, 97531),
]
LSH_BANDS = [(0, 1), (2, 3)]  # 2 bands × 2 rows over the 4 signatures
SIMHASH_BITS = 32  # 16-bit sigs birthday-collide past ~1k docs
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on"]

# --- Spark-side text helpers ----------------------------------------------
# `words` is materialized as a real column BEFORE any higher-order function
# touches it: expressions inside transform/filter lambdas are re-evaluated
# per element, so an inline split(text) would tokenize each row O(len(words))
# times instead of once.

def _words(col="text"):
    return F.split(F.trim(F.col(col)), " ")

def _with_words(df, col="text"):
    return df.withColumn("words", _words(col))

def _shingles_of_words(words_col="words"):
    """Distinct k-word shingles over a materialized words array. Sub-k-word
    docs yield an EMPTY array (oracle ``range`` semantics) — unguarded,
    ``sequence(0, size - k)`` descends through 0 and ``slice`` aborts."""
    w = F.col(words_col)
    return F.when(
        F.size(w) >= SHINGLE_K,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - SHINGLE_K),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, SHINGLE_K)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

# --- session-scoped text substrates ---------------------------------------
# Six registered queries re-derive the same k-shingle substrate (two Jaccard
# variants, two MinHash stages, decontamination). Like the kin model chain's
# `_FRAME_CACHE`, cache the shared frames once per (application, sf_dir) —
# the session-cache analogue of materializing the postings table once in a
# production pipeline run. Keyed by application id so a fresh session never
# sees frames from a stopped one.
_SUBSTRATE_CACHE: dict[tuple, DataFrame] = {}

def _cached_substrate(spark, sf_dir: str, kind: str, build) -> DataFrame:
    # Same reentrant guard as sources.catalog.frame_cached: concurrent
    # threads (Runner.run_concurrent, threaded query evaluation) must not
    # double-build the most expensive shared frames.
    from kin_data_pipeline_spark.sources.catalog import _FRAME_CACHE_LOCK

    key = (spark.sparkContext.applicationId, sf_dir, kind)
    with _FRAME_CACHE_LOCK:
        if key not in _SUBSTRATE_CACHE:
            # same stale-app purge as sources.catalog.frame_cached: keys
            # from stopped applications are unreachable but would pin
            # their frames for the process lifetime
            for sk in [k for k in _SUBSTRATE_CACHE if k[0] != key[0]]:
                del _SUBSTRATE_CACHE[sk]
            _SUBSTRATE_CACHE[key] = build().cache()
        return _SUBSTRATE_CACHE[key]

def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_id, source, w) exploded token stream — the ONE owner of
    the ``doc_tokens`` substrate key. Every consumer (token rarity, DSIR
    importance) must come through here: two call sites passing their own
    build lambdas under the same key would silently hand whichever ran
    second the first one's frame."""
    return _cached_substrate(
        spark,
        sf_dir,
        "doc_tokens",
        lambda: _with_words(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "source", F.explode("words").alias("w")
        ),
    )

def shingled_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, shingles) with the k=3 shingle arrays materialized."""
    return _cached_substrate(
        spark,
        sf_dir,
        "shingles",
        lambda: _with_words(load_table(spark, sf_dir, "documents")).select(
            "doc_id", "source", _shingles_of_words().alias("shingles")
        ),
    )

def _shingle_postings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingled_documents(spark, sf_dir)
    return sh.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    )

def shingle_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped posting lists (s, docs, df) — shared by both Jaccard tiers."""
    from kin_data_pipeline_spark.operators.dedup import grouped_posting_lists

    return _cached_substrate(
        spark,
        sf_dir,
        "posting_lists",
        lambda: grouped_posting_lists(_shingle_postings_cached(spark, sf_dir)),
    )

def minhash_signature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_id, mh0..mhN) MinHash signature frame — shared by the
    signature query, the LSH candidate query, the calibration audit, and
    the PageRank graph (the session-cache analogue of materializing the
    signature index once per pipeline run)."""
    return _cached_substrate(
        spark,
        sf_dir,
        "minhash_sig",
        lambda: shingled_documents(spark, sf_dir)
        .select("doc_id", F.explode("shingles").alias("s"))
        .groupBy("doc_id")
        .agg(*_minhash_spark_exprs()),
    )

def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached distinct (doc_a, doc_b) MinHash-LSH candidate pairs. Three
    registered consumers (candidates, calibration audit, PageRank) and the
    PageRank power iterations re-read it N times — without the cache each
    reference would re-derive the banded self-join from raw text."""

    def build() -> DataFrame:
        bands = document_bands(minhash_signature_frame(spark, sf_dir))
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )

    return _cached_substrate(spark, sf_dir, "lsh_cand", build)

def _h64(col):
    """First 15 md5 hex chars as a bigint (< 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

def _h32(col):
    """First 8 md5 hex chars as a bigint (< 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

# --- DuckDB-side text helpers (SQL fragments) ------------------------------

_SQL_WORDS = "string_split(trim(text), ' ')"
_SQL_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_SQL_WORDS}) - {SHINGLE_K - 2}), "
    + "i -> "
    + " || ' ' || ".join(f"{_SQL_WORDS}[i + {j}]" for j in range(SHINGLE_K))
    + "))"
)

def _sql_h32(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"

def _sql_h64(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"

# ---------------------------------------------------------------------------
# Document fingerprinting + exact dedup: canonical row per content hash.
@register(
    "exact_dedup_docs",
    """
    WITH f AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS fingerprint FROM documents
    ), canon AS (
      SELECT fingerprint, MIN(doc_id) AS canonical_doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM f GROUP BY fingerprint
    )
    SELECT f.doc_id, f.source, f.fingerprint, c.canonical_doc_id, c.n_copies
    FROM f JOIN canon c ON f.fingerprint = c.fingerprint
    WHERE f.doc_id = c.canonical_doc_id
    """,
    doc="exact dedup via content-hash groupBy; keeps min doc_id per group",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle: window over the fingerprint partition yields both the
    # canonical (min doc_id) row and the group size — no groupBy+join-back.
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fingerprint", F.md5(F.lower(F.trim(F.col("text"))))
    )
    w = Window.partitionBy("fingerprint")
    ranked = docs.select(
        "doc_id",
        "source",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.filter(F.col("doc_id") == F.col("canonical_doc_id"))

# n-gram Jaccard near-dup pairs: shingle-explode → df-capped postings →
# grouped pair expansion → |A∩B| / (|A|+|B|−|A∩B|). Never cross-joins the
# corpus — pairs form only inside posting lists, and lists longer than
# JACCARD_DF_CAP are dropped (the stopword/skew guard), so the worst key's
# pair fan-out is bounded. This capped form IS the canonical semantics under
# the natural name; the uncapped exact form is `ngram_jaccard_exact` below,
# unregistered and exercised only by tests.
_NGRAM_JACCARD_CAPPED_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, s, len(shingles) AS n_sh FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {JACCARD_DF_CAP}
    ),
    capped AS (
      SELECT sh.* FROM sh JOIN keep ON sh.s = keep.s
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             ANY_VALUE(a.n_sh) AS na, ANY_VALUE(b.n_sh) AS nb
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           ROUND(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
    FROM pairs WHERE n_common * 1.0 / (na + nb - n_common) >= {JACCARD_THRESHOLD}
    """

def _jaccard_pairs_query(spark: SparkSession, sf_dir: str, df_cap: int | None) -> DataFrame:
    from kin_data_pipeline_spark.operators.dedup import jaccard_pairs_from_lists

    lists = shingle_posting_lists(spark, sf_dir)
    pairs = jaccard_pairs_from_lists(lists, threshold=JACCARD_THRESHOLD, df_cap=df_cap)
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_common",
        F.round(
            F.col("n_common") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )

@register(
    "ngram_jaccard_near_dups",
    _NGRAM_JACCARD_CAPPED_ORACLE,
    doc=f"n-gram Jaccard near-dup pairs, df<={JACCARD_DF_CAP} shingle cap (canonical skew-bounded form)",
)
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_query(spark, sf_dir, df_cap=JACCARD_DF_CAP)

# Exact all-pairs Jaccard (df_cap=None): every co-occurring pair is formed.
# Unsafe on open-web corpora (a stopword shingle's posting list is the whole
# corpus → quadratic pair fan-out), so deliberately NOT registered — tests
# use it (with NGRAM_JACCARD_EXACT_ORACLE) to pin that the cap only ever
# removes high-df pairs, never changes surviving scores.
NGRAM_JACCARD_EXACT_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, s, len(shingles) AS n_sh FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             ANY_VALUE(a.n_sh) AS na, ANY_VALUE(b.n_sh) AS nb
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           ROUND(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
    FROM pairs WHERE n_common * 1.0 / (na + nb - n_common) >= {JACCARD_THRESHOLD}
    """

def ngram_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_query(spark, sf_dir, df_cap=None)

# Prefix-filtered EXACT Jaccard — the registerable exact form. Unlike the
# unregistered all-pairs expansion above (quadratic in the hottest
# shingle), AllPairs/PPJoin prefix filtering indexes only each document's
# rarest |r| - ceil(t|r|) + 1 shingles and provably loses no qualifying
# pair, so the exact semantics finally get a driver-checked row with a
# scale-sane plan (operators/dedup.py::prefix_filter_jaccard_pairs has the
# lemma + shuffle budget). Oracle: the same exact all-pairs SQL the
# differential tests use — identical results, different plan.
@register(
    "ngram_jaccard_prefix_filtered",
    NGRAM_JACCARD_EXACT_ORACLE,
    doc=(
        "EXACT n-gram Jaccard pairs via AllPairs/PPJoin prefix filtering "
        "(rarest-token prefixes + length filter + intersection verify)"
    ),
)
def ngram_jaccard_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs_from_lists,
    )

    # JACCARD_THRESHOLD as an exact rational: 0.5 = 1/2. The operator
    # takes num/den so prefix lengths are integer-exact (see its docstring).
    # Fed from the session-cached grouped posting lists: the shingle
    # frequency aggregation + token-key join are already materialized
    # there, so the ranked stream is one explode instead of two shuffles.
    assert JACCARD_THRESHOLD == 0.5
    return prefix_filter_jaccard_pairs_from_lists(
        shingle_posting_lists(spark, sf_dir),
        shingled_documents(spark, sf_dir),
        threshold_num=1,
        threshold_den=2,
    )

def _minhash_sql_exprs() -> list[str]:
    h = _sql_h32("s")
    return [
        f"CAST(MIN(({a} * {h} + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]

def _minhash_spark_exprs():
    h = _h32(F.col("s"))
    return [
        F.min((F.lit(a) * h + F.lit(b)) % MINHASH_PRIME).cast("long").alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]

def document_signatures(docs: DataFrame) -> DataFrame:
    """MinHash signature frame ``(doc_id, mh0..mhN)`` for a documents
    frame (doc_id, text) — shingle-explode + per-doc min over the salted
    hash family. The standalone form for arbitrary frames; registered
    queries go through the session-cached shingle substrate instead."""
    sh = _with_words(docs).select(
        "doc_id", F.explode(_shingles_of_words()).alias("s")
    )
    return sh.groupBy("doc_id").agg(*_minhash_spark_exprs())

def document_bands(sig: DataFrame) -> DataFrame:
    """LSH band rows ``(doc_id, band_id, band_key)`` from a MinHash
    signature frame — the PERSISTABLE dedup index: materialize this for
    the corpus once (e.g. as a catalog model) and every arriving batch
    probes it with a broadcast join instead of re-deriving corpus
    signatures (``tests/test_dedup_index.py``). The single band builder —
    the LSH candidate query and the incremental probe both derive their
    band keys here, so the band format cannot silently diverge."""
    band_frames = [
        sig.select(
            "doc_id",
            F.lit(bi).alias("band_id"),
            F.concat_ws(
                ":", F.col(f"mh{r0}").cast("string"), F.col(f"mh{r1}").cast("string")
            ).alias("band_key"),
        )
        for bi, (r0, r1) in enumerate(LSH_BANDS)
    ]
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    return bands

def _sql_lsh_cand_ctes() -> str:
    """Shared sh/sig/bands/cand CTE prelude — the ONE SQL twin of the
    Spark-side ``lsh_candidate_pairs`` substrate. Four oracles (LSH
    candidates, calibration audit, PageRank, Levenshtein verify) splice
    this in; a banding change edits exactly one generator on each side."""
    bands_sql = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_id, CAST(mh{r0} AS VARCHAR) || ':' || "
        f"CAST(mh{r1} AS VARCHAR) AS band_key FROM sig"
        for bi, (r0, r1) in enumerate(LSH_BANDS)
    )
    return f"""sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ), sig AS (
      SELECT doc_id, {', '.join(_minhash_sql_exprs())}
      FROM sh GROUP BY doc_id
    ), bands AS (
      {bands_sql}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )"""

# MinHash signatures: min over shingles of universal-hash family values.
@register(
    "minhash_signatures",
    f"""
    WITH sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    )
    SELECT doc_id, {', '.join(_minhash_sql_exprs())}
    FROM sh GROUP BY doc_id
    """,
    doc="MinHash signatures (4 universal hash fns over 3-gram shingles)",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signature_frame(spark, sf_dir)

# MinHash-LSH candidate pairs: band the signatures, bucket-join on band
# value — candidates are docs agreeing on ANY full band. The join key is
# (band_id, band_hash): at scale this is the classic LSH bucket shuffle,
# linear in corpus size, no pairwise comparison outside buckets.
@register(
    "minhash_lsh_candidates",
    f"""
    WITH {_sql_lsh_cand_ctes()}
    SELECT doc_a, doc_b FROM cand
    """,
    doc="MinHash-LSH banded bucket join → near-dup candidate pairs",
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(spark, sf_dir)

# MinHash estimate-vs-exact audit: for every LSH candidate pair, the number
# of agreeing signature components (the MinHash Jaccard ESTIMATE, an
# integer out of len(MINHASH_PARAMS)) next to the pair's exact shingle-set
# Jaccard — the calibration table that tells you what a 4-hash signature
# actually buys (E[n_agree/4] = true Jaccard). The verify step is
# pair-local (array intersection on the two docs' shingle arrays), the
# standard LSH candidate-verification shape: cost scales with the
# candidate count, never with the corpus.
@register(
    "minhash_estimate_audit",
    f"""
    WITH {_sql_lsh_cand_ctes()},
    doc_sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
    )
    SELECT c.doc_a, c.doc_b,
           CAST({' + '.join(f'(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)' for i in range(len(MINHASH_PARAMS)))}
             AS INT) AS n_agree,
           ROUND(CAST({' + '.join(f'(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)' for i in range(len(MINHASH_PARAMS)))}
             AS DOUBLE) / {len(MINHASH_PARAMS)}, 6) AS est_jaccard,
           CAST(len(list_intersect(da.shingles, db.shingles)) AS BIGINT) AS n_common,
           CAST(len(da.shingles) AS BIGINT) AS na,
           CAST(len(db.shingles) AS BIGINT) AS nb,
           ROUND(CAST(len(list_intersect(da.shingles, db.shingles)) AS DOUBLE)
                 / (len(da.shingles) + len(db.shingles)
                    - len(list_intersect(da.shingles, db.shingles))), 6)
             AS true_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    JOIN doc_sh da ON da.doc_id = c.doc_a
    JOIN doc_sh db ON db.doc_id = c.doc_b
    """,
    doc=(
        f"MinHash calibration audit: per LSH candidate pair, the "
        f"{len(MINHASH_PARAMS)}-hash signature agreement count (estimate) "
        "vs the exact shingle-set Jaccard (pair-local verify)"
    ),
)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_sh = shingled_documents(spark, sf_dir).select("doc_id", "shingles")
    sig = minhash_signature_frame(spark, sf_dir)
    cand = lsh_candidate_pairs(spark, sf_dir)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(len(MINHASH_PARAMS))],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(len(MINHASH_PARAMS))],
    )
    da = doc_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    db = doc_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    j = cand.join(sa, "doc_a").join(sb, "doc_b").join(da, "doc_a").join(db, "doc_b")
    agree = None
    for i in range(len(MINHASH_PARAMS)):
        term = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        agree = term if agree is None else agree + term
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    na, nb = F.size("sh_a").cast("long"), F.size("sh_b").cast("long")
    return j.select(
        "doc_a",
        "doc_b",
        agree.cast("int").alias("n_agree"),
        F.round(agree.cast("double") / F.lit(len(MINHASH_PARAMS)), 6).alias(
            "est_jaccard"
        ),
        inter.alias("n_common"),
        na.alias("na"),
        nb.alias("nb"),
        F.round(inter.cast("double") / (na + nb - inter), 6).alias("true_jaccard"),
    )

def _simhash_bitsum_sql() -> list[str]:
    return [
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    ]

# SimHash: frequency-weighted ±1 vote per bit of each token hash, sign →
# bit. A single explode + aggregation pass; bit recombination is pure
# integer arithmetic (identical on both engines).
@register(
    "simhash_signatures",
    f"""
    WITH tok AS (
      SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h FROM (
        SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), bits AS (
      SELECT doc_id, {', '.join(_simhash_bitsum_sql())}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({' + '.join(f'(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)' for j in range(SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM bits
    """,
    doc=f"SimHash ({SIMHASH_BITS}-bit) document signatures",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_sigs_cached(spark, sf_dir)


def _simhash_sigs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (doc_id, simhash) signatures — the tokenize + md5 +
    per-bit vote chain is the dominant cost of the simhash family, and
    ``simhash_near_dups`` previously recomputed it wholesale on every
    call (the r10 bench showed the family's cost moving with registry
    order purely from which query warmed it first). One substrate, two
    consumers — same discipline as ``doc_tokens``/``shingles``."""

    def build():
        tok = _with_words(load_table(spark, sf_dir, "documents")).select(
            "doc_id", F.explode("words").alias("w")
        )
        h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        bits = tok.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(
                        F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1
                    ).otherwise(-1)
                ).alias(f"b{j}")
                for j in range(SIMHASH_BITS)
            ]
        )
        simhash = None
        for j in range(SIMHASH_BITS):
            term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            simhash = term if simhash is None else simhash + term
        return bits.select("doc_id", simhash.cast("long").alias("simhash"))

    return _cached_substrate(spark, sf_dir, "simhash_sigs", build)

# Brute-force cosine top-k: the ANN baseline. Query set broadcasts (it is
# tiny); candidates stream — no corpus×corpus cross join. Dot products use
# JVM higher-order functions (zip_with/aggregate), not UDFs.
@register(
    "embedding_knn_top5",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim
      FROM (SELECT * FROM e WHERE vec_id < 20) q
      JOIN e c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS cosine_sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM sims
    ) WHERE rnk <= 5
    """,
    doc="brute-force cosine top-k similarity search (ANN baseline)",
)
def embedding_knn_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    dot_self = F.aggregate(
        F.zip_with(F.col("emb"), F.col("emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    e = e.withColumn("nrm", F.sqrt(dot_self))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 4).alias("cosine_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )

# Text quality scoring: token stats + distinct ratio per doc, pure column
# arithmetic (no UDF). avg_token_len derived from char counts so both
# engines compute the identical closed form.
@register(
    "doc_quality_scores",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_SQL_WORDS})) AS BIGINT) AS n_distinct_tokens,
             length(trim(text)) AS n_trim_chars
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, n_tokens, n_distinct_tokens,
           ROUND(n_distinct_tokens * 1.0 / n_tokens, 6) AS distinct_ratio,
           ROUND((n_trim_chars - (n_tokens - 1)) * 1.0 / n_tokens, 6) AS avg_token_len
    FROM t
    """,
    doc="per-document quality metrics: token counts, distinct ratio, avg token length",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size("words").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("words")).cast("long").alias("n_distinct_tokens"),
        F.length(F.trim(F.col("text"))).alias("n_trim_chars"),
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "n_tokens",
        "n_distinct_tokens",
        F.round(F.col("n_distinct_tokens") * 1.0 / F.col("n_tokens"), 6).alias(
            "distinct_ratio"
        ),
        F.round(
            (F.col("n_trim_chars") - (F.col("n_tokens") - 1)) * 1.0 / F.col("n_tokens"),
            6,
        ).alias("avg_token_len"),
    )

# Language-ID heuristic profile: stopword-hit ratio per language label —
# the n-gram/stopword language-scoring building block, aggregated.
@register(
    "lang_stopword_profile",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             CAST(len(list_filter({_SQL_WORDS}, w -> w IN ({', '.join(repr(s) for s in STOPWORDS)}))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_stop) AS BIGINT) AS total_stopwords,
           ROUND(SUM(n_stop) * 1.0 / SUM(n_tokens), 6) AS stopword_ratio
    FROM t GROUP BY lang
    """,
    doc="stopword-ratio language profiling (language-ID heuristic input)",
)
def lang_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    t = _with_words(load_table(spark, sf_dir, "documents")).select(
        "lang",
        F.size("words").cast("long").alias("n_tokens"),
        F.size(
            F.filter("words", lambda w: F.array_contains(stop_arr, w))
        )
        .cast("long")
        .alias("n_stop"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_stop").alias("total_stopwords"),
        F.round(F.sum("n_stop") * 1.0 / F.sum("n_tokens"), 6).alias("stopword_ratio"),
    )

# Token accounting per source (BPE-ish proxy: whitespace tokens + chars).
@register(
    "token_counts_by_source",
    f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_SQL_WORDS})) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(len({_SQL_WORDS})), 6) AS avg_tokens_per_doc
    FROM documents GROUP BY source
    """,
    doc="corpus token accounting per source",
)
def token_counts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "source", "n_chars", F.size("words").cast("long").alias("n_tokens")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens_per_doc"),
    )

# LSH-bucketed ANN — the scale path for similarity search, oracle-checked:
# the deterministic hyperplanes are generated once in Python and injected
# into BOTH engines as literals, so bucket assignment (and therefore the
# candidate set and final ranking) is identical. Multi-probe flips one sign
# bit at a time to recover recall. At 100 TB the join key is the bucket id:
# a linear shuffle, never a cross join.

from kin_data_pipeline_spark.operators.similarity import _hyperplanes  # noqa: E402

_ANN_PLANES = _hyperplanes(dim=64, n_planes=3, seed=7)
_ANN_K = 5

def _sql_bucket(vec: str) -> str:
    terms = []
    for i, plane in enumerate(_ANN_PLANES):
        lits = ", ".join(repr(v) for v in plane)
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, [{lits}]) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)

@register(
    "embedding_lsh_ann_top5",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
             {_sql_bucket('embedding::DOUBLE[]')} AS bucket
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm,
             UNNEST([bucket, {', '.join(f'xor(bucket, {1 << i})' for i in range(len(_ANN_PLANES)))}]) AS bucket
      FROM e WHERE vec_id < 20
    ), sims AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.q_emb, c.emb) / (q.q_nrm * c.nrm) AS sim
      FROM q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS cosine_sim, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM sims
    ) WHERE rnk <= {_ANN_K}
    """,
    doc="LSH-bucketed approximate nearest neighbors with multiprobe (the ANN scale path)",
)
def embedding_lsh_ann_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = lsh_topk(
        emb, queries, k=_ANN_K, n_planes=len(_ANN_PLANES), dim=64,
        multiprobe=True, seed=7,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("sim", 4).alias("cosine_sim"),
        F.col("rnk").cast("int").alias("rnk"),
    )

# Vocabulary statistics: document frequency per term — the exact-integer
# End-to-end corpus curation — the composed pipeline a training-data engine
# exists to run: quality gate → exact dedup → capped near-dup drop → corpus
# accounting. Every stage is one of the registered operators; the oracle
# replays the identical composition in SQL. At 100 TB each stage is linear:
# the quality gate is a scan-level filter, exact dedup a fingerprint window,
# near-dup the single-pass grouped-postings expansion, the drop a left-anti.

_CURATE_MIN_TOKENS = 25
_CURATE_MIN_DISTINCT = 0.35
_CURATE_CACHE: dict[tuple, DataFrame] = {}

@register(
    "curated_corpus_stats",
    f"""
    WITH q AS (
      SELECT doc_id, lang, source, text,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             len(list_distinct({_SQL_WORDS})) * 1.0 / len({_SQL_WORDS}) AS dr,
             md5(lower(trim(text))) AS fp
      FROM documents
    ), kept_q AS (
      SELECT * FROM q
      WHERE n_tokens >= {_CURATE_MIN_TOKENS} AND dr >= {_CURATE_MIN_DISTINCT}
    ), exact AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM kept_q
      ) WHERE rn = 1
    ), sh AS (
      SELECT doc_id, s, len(shingles) AS n_sh FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM exact
      ), UNNEST(shingles) AS t(s)
    ), keep_sh AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {{cap}}
    ), capped AS (
      SELECT sh.* FROM sh JOIN keep_sh ON sh.s = keep_sh.s
    ), pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS nc,
             ANY_VALUE(a.n_sh) AS na, ANY_VALUE(b.n_sh) AS nb
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), drops AS (
      SELECT DISTINCT db FROM pairs
      WHERE nc * 1.0 / (na + nb - nc) >= {{thr}}
    )
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM exact
    WHERE doc_id NOT IN (SELECT db FROM drops)
    GROUP BY lang, source
    """.replace("{cap}", "50").replace("{thr}", "0.5"),
    doc="composed curation pipeline: quality gate + exact dedup + near-dup drop → corpus stats",
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.dedup import (
        fingerprint,
        jaccard_pairs_grouped,
        shingle_postings,
    )

    d = _with_words(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size("words").cast("long").alias("n_tokens"),
        (F.size(F.array_distinct("words")) * 1.0 / F.size("words")).alias("dr"),
        fingerprint("text").alias("fp"),
    )
    kept_q = d.filter(
        (F.col("n_tokens") >= _CURATE_MIN_TOKENS)
        & (F.col("dr") >= _CURATE_MIN_DISTINCT)
    )
    w = Window.partitionBy("fp").orderBy(F.asc("doc_id"))
    exact = kept_q.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # `exact` feeds BOTH the pair-forming postings AND the survivor anti-join
    # below; without a cache Spark re-evaluates the whole quality+dedup chain
    # once per consumer (the self-join recompute trap). Session-scoped cache,
    # keyed by application id so a fresh session never sees stale frames.
    key = (spark.sparkContext.applicationId, "curated_exact", sf_dir)
    if key not in _CURATE_CACHE:
        _CURATE_CACHE[key] = exact.cache()
    exact = _CURATE_CACHE[key]
    postings = shingle_postings(exact, "doc_id", "text", k=SHINGLE_K)
    pairs = jaccard_pairs_grouped(postings, threshold=JACCARD_THRESHOLD, df_cap=JACCARD_DF_CAP)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final = exact.join(drops, "doc_id", "left_anti")
    return final.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )

# BPE-ish regex tokenization — the second token-accounting tier beyond
# whitespace splitting: letter runs / digit runs / single non-alnum marks,
# the shape a byte-pair pre-tokenizer sees. Same class-based pattern compiles
# identically under Java regex and DuckDB's RE2.

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

@register(
    "regex_token_stats",
    f"""
    WITH t AS (
      SELECT source, regexp_extract_all(text, '{_TOKEN_RE}') AS toks
      FROM documents
    ), c AS (
      SELECT source,
             CAST(len(toks) AS BIGINT) AS n_toks,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))) AS BIGINT) AS n_num
      FROM t
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_alpha) AS BIGINT) AS total_alpha,
           CAST(SUM(n_num) AS BIGINT) AS total_numeric,
           CAST(SUM(n_toks - n_alpha - n_num) AS BIGINT) AS total_punct,
           ROUND(SUM(n_toks) * 1.0 / COUNT(*), 6) AS avg_tokens_per_doc
    FROM c GROUP BY source
    """,
    doc="BPE-ish regex token accounting per source (pre-tokenizer tier)",
)
def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), F.lit(0)).alias("toks"),
    )
    c = d.select(
        "source",
        F.size("toks").cast("long").alias("n_toks"),
        F.size(F.filter("toks", lambda x: x.rlike("^[A-Za-z]"))).cast("long").alias("n_alpha"),
        F.size(F.filter("toks", lambda x: x.rlike("^[0-9]"))).cast("long").alias("n_num"),
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_alpha").alias("total_alpha"),
        F.sum("n_num").alias("total_numeric"),
        F.sum(F.col("n_toks") - F.col("n_alpha") - F.col("n_num")).alias("total_punct"),
        F.round(F.sum("n_toks") * 1.0 / F.count(F.lit(1)), 6).alias("avg_tokens_per_doc"),
    )

# Rolling-hash document fingerprinting: order-sensitive polynomial hash over
# the word stream (h = h·31 + h32(word) mod 2^31−1) — exact-dedup's
# order-aware sibling; all integer math, engine-identical (products stay
# < 2^63, md5→int parity per the h32 path).

@register(
    "rolling_hash_fingerprints",
    f"""
    WITH f AS (
      SELECT doc_id, source,
             CAST(len({_SQL_WORDS}) AS BIGINT) AS n_tokens,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform({_SQL_WORDS},
                   w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash
      FROM documents
    )
    SELECT doc_id, source, n_tokens, rolling_hash FROM f
    """,
    doc="order-sensitive polynomial rolling-hash fingerprint per document",
)
def rolling_hash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_words(load_table(spark, sf_dir, "documents"))
    h32 = F.transform(
        F.col("words"),
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
    )
    rh = F.aggregate(
        h32,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 2147483647,
    )
    return d.select(
        "doc_id",
        "source",
        F.size("words").cast("long").alias("n_tokens"),
        rh.alias("rolling_hash"),
    )

# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
# local fingerprinting algorithm, public): hash every k-gram, slide a
# w-window over the hash sequence, keep each window's minimum. Guarantees
# any shared run of ≥ w+k−1 tokens shares a fingerprint (the property
# plagiarism/overlap detection needs), at expected density 2/(w+1) —
# unlike MinHash it is position-local, unlike the whole-doc rolling hash it
# survives partial overlap. Pure array math per doc: no explode, no
# shuffle until the final per-source aggregation.

_WINNOW_K = 3
_WINNOW_W = 4

_SQL_KGRAM_HASHES = f"""
  list_transform(
    range(0, greatest(0, len({_SQL_WORDS}) - {_WINNOW_K - 1})),
    i -> {_sql_h32(f"array_to_string(list_slice({_SQL_WORDS}, i + 1, i + {_WINNOW_K}), ' ')")})
"""

@register(
    "winnowing_fingerprints",
    f"""
    WITH h AS (
      SELECT doc_id, source, {_SQL_KGRAM_HASHES} AS hs FROM documents
    ), w AS (
      SELECT doc_id, source,
             CAST(len(hs) AS BIGINT) AS n_kgrams,
             CAST(greatest(0, len(hs) - {_WINNOW_W - 1}) AS BIGINT) AS n_windows,
             list_distinct(list_transform(
               range(0, greatest(0, len(hs) - {_WINNOW_W - 1})),
               j -> list_min(list_slice(hs, j + 1, j + {_WINNOW_W})))) AS fps
      FROM h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_kgrams) AS BIGINT) AS total_kgrams,
           CAST(SUM(len(fps)) AS BIGINT) AS total_fingerprints,
           ROUND(SUM(len(fps)) * 1.0 / SUM(n_windows), 6) AS fingerprint_density,
           CAST(MIN(len(fps)) AS BIGINT) AS min_doc_fps,
           CAST(MAX(len(fps)) AS BIGINT) AS max_doc_fps
    FROM w GROUP BY source
    """,
    doc="winnowing (MOSS) fingerprint selection stats per source (w-window min of k-gram hashes)",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("words")
    kgrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.lit(0), F.size(words) - _WINNOW_K)),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, _WINNOW_K)),
    )
    # sequence(0, n) is INCLUSIVE: the k-gram range above yields one extra
    # element when the doc is non-degenerate, so slice to the true count
    # (and to zero when len(words) < k, where sequence would auto-descend).
    n_kgrams = F.greatest(F.lit(0), F.size(words) - (_WINNOW_K - 1))
    hs = F.slice(F.transform(kgrams, _h32), 1, n_kgrams)
    h = d.select("doc_id", "source", hs.alias("hs"))
    n_windows = F.greatest(F.lit(0), F.size("hs") - (_WINNOW_W - 1))
    mins = F.slice(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.size("hs") - _WINNOW_W)),
            lambda j: F.array_min(F.slice(F.col("hs"), j + 1, _WINNOW_W)),
        ),
        1,
        n_windows,
    )
    w = h.select(
        "source",
        F.size("hs").cast("long").alias("n_kgrams"),
        n_windows.cast("long").alias("n_windows"),
        F.array_distinct(mins).alias("fps"),
    )
    return w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_kgrams").alias("total_kgrams"),
        F.sum(F.size("fps")).cast("long").alias("total_fingerprints"),
        F.round(F.sum(F.size("fps")) * 1.0 / F.sum("n_windows"), 6).alias(
            "fingerprint_density"
        ),
        F.min(F.size("fps")).cast("long").alias("min_doc_fps"),
        F.max(F.size("fps")).cast("long").alias("max_doc_fps"),
    )

# IVF (inverted-file) ANN — the second scale path for similarity search,
# complementing sign-LSH. Centroids are sampled deterministically from the
# corpus (vec_id % stride == 0), so BOTH engines derive the identical cell
# structure from the data with no injected literals; assignment and probing
# rank by exact cosine with (sim DESC, cid ASC) tiebreaks.
#
# The stride is DATA-DEPENDENT (max(1, N // target)) so the sampled
# centroid count stays bounded (~target) at any corpus size: the round-4
# fixed stride of 31 made K grow as N/31, turning the N x K assignment
# quadratic — the sf1 superlinearity sweep flagged the whole cell family
# at 40-70x for 10x data. Spark computes the stride with one bounded
# count(); the oracle embeds the identical arithmetic as a scalar
# subquery, so both engines still derive the same cells from the data.

_IVF_STRIDE_SQL = "(SELECT GREATEST(1, COUNT(*) // 64) FROM embeddings)"
_IVF_NPROBE = 2
_IVF_K = 5

@register(
    "embedding_ivf_ann_top5",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
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
    ), sims AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_dot_product(q.emb, n.emb) / (q.nrm * n.nrm) AS sim
      FROM probes p
      JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
      JOIN e q ON q.vec_id = p.query_id
      JOIN e n ON n.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS cosine_sim, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
      FROM sims
    ) WHERE rnk <= {_IVF_K}
    """,
    doc="IVF-cell ANN with deterministic sampled centroids (second ANN scale path)",
)
def embedding_ivf_ann_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = ivf_topk(
        emb, queries, k=_IVF_K, centroid_stride=None, nprobe=_IVF_NPROBE
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("sim", 4).alias("cosine_sim"),
        F.col("rnk").cast("int").alias("rnk"),
    )

# Embedding-cosine near-duplicate pairs — the all-pairs dedup tier over the
# embedding column (complements exact/jaccard/minhash/simhash). Banded
# sign-LSH candidates (equi-join on (band, bucket), never a cross join) with
# an exact-cosine verify; the per-band hyperplanes are injected into BOTH
# engines as literals so the candidate set is identical.

_NDUP_BANDS = 4
# 8 planes → per-band bucket occupancy ~N/256 (≈20 at the 5k-vector test
# corpus), keeping the within-bucket pair blowup ~4× smaller than 6 planes
# while true near-dups (sim ≳ 0.9, per-plane agreement ≳ 0.93) still collide
# in ≥1 of 4 bands w.p. ≈ 0.97. The operator docstring's occupancy rule
# (raise n_planes with corpus size) applied at this N.
_NDUP_PLANES = 8
_NDUP_SEED = 42
_NDUP_THRESHOLD = 0.4  # synthetic embeddings are near-orthogonal (max pairwise
# cosine ≈ 0.51 at sf0.01) — the threshold is the operator's parameter, set
# where this corpus has actual near-neighbors.

def _sql_band_bucket(vec: str, band: int) -> str:
    planes = _hyperplanes(dim=64, n_planes=_NDUP_PLANES, seed=_NDUP_SEED + band)
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(repr(v) for v in plane)
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, [{lits}]) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)

@register(
    "embedding_cosine_near_dups",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), b AS (
      {" UNION ALL ".join(
        f"SELECT vec_id, emb, nrm, {band} AS band, "
        f"{_sql_band_bucket('emb', band)} AS bucket FROM e"
        for band in range(_NDUP_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
             list_dot_product(a.emb, c.emb) / (a.nrm * c.nrm) AS sim
      FROM b a JOIN b c
        ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, ROUND(sim, 4) AS cosine_sim
    FROM cand WHERE sim >= {_NDUP_THRESHOLD}
    """,
    doc="embedding-cosine near-dup pairs via banded sign-LSH + exact verify (dedup tier 5)",
)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import lsh_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_near_dup_pairs(
        emb,
        threshold=_NDUP_THRESHOLD,
        n_bands=_NDUP_BANDS,
        n_planes=_NDUP_PLANES,
        seed=_NDUP_SEED,
    )
    return pairs.select("id_a", "id_b", F.round("sim", 4).alias("cosine_sim"))

# SemDeDup-style semantic dedup (dedup tier 6): deterministic IVF-cell
# clustering restricts the quadratic pair space to same-cell pairs, then an
# exact-cosine verify inside each cell. Both engines derive the identical
# cell structure from the data (centroids = vec_id % stride == 0), so the
# pair set is bit-comparable with no injected literals.

_SEMD_STRIDE_SQL = _IVF_STRIDE_SQL  # same bounded-K cell structure
_SEMD_THRESHOLD = 0.30  # near-orthogonal synthetic corpus: a few percent
# of within-cell pairs clear 0.30 at every SF, so the query is non-trivial
# at the smoke, correctness, and bench scales alike.

_SEMD_PAIRS_SQL = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM e
      WHERE vec_id % {_SEMD_STRIDE_SQL} = 0
    ), asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.emb, c.cemb) / (e.nrm * c.cnrm) DESC,
                          c.cid ASC) AS rn
        FROM e, cent c
      ) WHERE rn = 1
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid,
             list_dot_product(ea.emb, eb.emb) / (ea.nrm * eb.nrm) AS sim
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
    )
"""

@register(
    "semantic_dedup_pairs",
    _SEMD_PAIRS_SQL
    + f"""
    SELECT id_a, id_b, cid, ROUND(sim, 4) AS cosine_sim
    FROM pairs WHERE sim >= {_SEMD_THRESHOLD}
    """,
    doc="SemDeDup-style semantic near-dup pairs: IVF-cell blocking + exact cosine verify",
)
def semantic_dedup_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # broadcast re-attach: the test/bench corpus fits the broadcast budget
    # (operator default is the scale-safe shuffled join)
    pairs = semantic_dedup_pairs(
        emb,
        threshold=_SEMD_THRESHOLD,
        centroid_stride=None,
        broadcast_embeddings=True,
    )
    return pairs.select("id_a", "id_b", "cid", F.round("sim", 4).alias("cosine_sim"))

@register(
    "semantic_dedup_survivor_stats",
    _SEMD_PAIRS_SQL
    + f"""
    , dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs WHERE sim >= {_SEMD_THRESHOLD}
    )
    SELECT e2.label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) FILTER (WHERE d.vec_id IS NULL) AS BIGINT) AS n_survivors,
           CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped
    FROM embeddings e2 LEFT JOIN dropped d ON e2.vec_id = d.vec_id
    GROUP BY e2.label
    """,
    doc="per-label survivor accounting under greedy min-id semantic dedup",
)
def semantic_dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import semantic_dedup_survivors

    emb = load_table(spark, sf_dir, "embeddings")
    surv = semantic_dedup_survivors(
        emb,
        threshold=_SEMD_THRESHOLD,
        centroid_stride=None,
        broadcast_embeddings=True,
    ).withColumn("survived", F.lit(1))
    return (
        emb.join(surv, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count("survived").alias("n_survivors"),
            (F.count(F.lit(1)) - F.count("survived")).alias("n_dropped"),
        )
    )

# substrate of TF-IDF (logs are deliberately excluded: libm vs JVM ln can
# differ in the last ulp, so scoring stays engine-exact by shipping counts).
@register(
    "term_document_frequency",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), occ AS (
      SELECT w, n FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT doc_id, UNNEST({_SQL_WORDS}) AS w FROM documents
        ) GROUP BY w
      )
    ), df AS (
      SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tok GROUP BY w
    )
    SELECT term, doc_freq, occ.n AS total_occurrences,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY doc_freq DESC, term ASC) AS rnk FROM df
    ) d JOIN occ ON d.term = occ.w
    WHERE rnk <= 20
    """,
    doc="top-20 terms by document frequency (exact-integer TF-IDF substrate)",
)
def term_document_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_words(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode("words").alias("w"))
    df_counts = (
        tok.distinct()
        .groupBy(F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    occ = tok.groupBy(F.col("w").alias("term")).agg(
        F.count(F.lit(1)).alias("total_occurrences")
    )
    # The term-frequency frame is VOCABULARY-sized (the unbounded class
    # PLANS.md's boundary section tracks) — select the top-20 with
    # orderBy+limit (TakeOrderedAndProject) and rank only those 20 rows;
    # a global rank window here would single-partition-sort the vocabulary.
    top = df_counts.orderBy(F.desc("doc_freq"), F.asc("term")).limit(20)
    w = Window.orderBy(F.desc("doc_freq"), F.asc("term"))
    ranked = top.withColumn("rnk", F.row_number().over(w).cast("int")).join(
        occ, "term"
    )
    return ranked.select("term", "doc_freq", "total_occurrences", "rnk")

# Language-ID heuristic vs labels: classify by stopword ratio, report the
# confusion counts (the evaluation harness for any languid model).
LANGID_STOP_RATIO = 0.15

@register(
    "language_id_confusion",
    f"""
    WITH scored AS (
      SELECT lang,
             CASE WHEN len(list_filter({_SQL_WORDS},
                        w -> w IN ({', '.join(repr(s) for s in STOPWORDS)}))) * 1.0
                       / len({_SQL_WORDS}) >= {LANGID_STOP_RATIO}
                  THEN 'en' ELSE 'other' END AS predicted
      FROM documents
    )
    SELECT lang AS labeled_lang, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM scored GROUP BY 1, 2
    """,
    doc="stopword-ratio language classifier vs labels (languid eval harness)",
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    docs = _with_words(load_table(spark, sf_dir, "documents"))
    ratio = F.size(
        F.filter("words", lambda w: F.array_contains(stop_arr, w))
    ) * 1.0 / F.size("words")
    scored = docs.select(
        F.col("lang").alias("labeled_lang"),
        F.when(ratio >= LANGID_STOP_RATIO, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("predicted"),
    )
    return scored.groupBy("labeled_lang", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )

# Behavioral funnel: signup → first subsequent purchase per user, conversion
# lag in whole seconds (exact ints), daily cohort counts.
@register(
    "signup_purchase_funnel",
    """
    WITH first_signup AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), first_purchase AS (
      SELECT s.user_id, MIN(e.ts) AS purchase_ts
      FROM first_signup s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY s.user_id
    )
    SELECT CAST(date_trunc('day', s.signup_ts) AS DATE) AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_converted,
           CAST(MIN(CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
                    - CAST(floor(epoch(s.signup_ts)) AS BIGINT)) AS BIGINT) AS min_lag_s,
           CAST(MAX(CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
                    - CAST(floor(epoch(s.signup_ts)) AS BIGINT)) AS BIGINT) AS max_lag_s
    FROM first_signup s LEFT JOIN first_purchase p ON s.user_id = p.user_id
    GROUP BY 1
    """,
    doc="signup→purchase conversion funnel per cohort day (behavioral analysis)",
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    first_purchase = (
        first_signup.join(purchases, "user_id")
        .filter(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    joined = first_signup.join(first_purchase, "user_id", "left")
    lag_s = F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")
    return joined.groupBy(
        F.to_date("signup_ts").alias("cohort_day")
    ).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("purchase_ts").alias("n_converted"),
        F.min(lag_s).alias("min_lag_s"),
        F.max(lag_s).alias("max_lag_s"),
    )

# n-gram Jaccard with the document-frequency cap — the 100 TB form of the
# postings join: a stopword-ish shingle shared by a large fraction of the
# corpus creates a quadratic bucket in the pair join, so postings whose
# document frequency exceeds the cap are dropped BEFORE pairing (per-doc
# shingle totals keep the uncapped count, so dropped shingles can only
# lower a pair's score — high-overlap near-dups survive). Uses the
# operator-library implementation (operators/dedup.py shingle_postings +
# jaccard_pairs) so the registered plan is the capped library path.

@register(
    "ngram_jaccard_capped",
    _NGRAM_JACCARD_CAPPED_ORACLE,
    doc=f"alias of ngram_jaccard_near_dups (df<={JACCARD_DF_CAP} cap); kept for round-2 continuity",
)
def ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_query(spark, sf_dir, df_cap=JACCARD_DF_CAP)

# Containment near-dups — the ASYMMETRIC overlap score over the same
# capped posting-list substrate: |A∩B| / min(|A|,|B|) catches a document
# contained inside a larger one (quote farms, boilerplate wrappers,
# partial scrapes) that Jaccard under-scores when sizes differ. One more
# column expression over the shared pair-count expansion; no new shuffle.

_CONTAINMENT_THRESHOLD = 0.8

@register(
    "shingle_containment_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, s, len(shingles) AS n_sh FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {JACCARD_DF_CAP}
    ),
    capped AS (
      SELECT sh.* FROM sh JOIN keep ON sh.s = keep.s
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             ANY_VALUE(a.n_sh) AS na, ANY_VALUE(b.n_sh) AS nb
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           ROUND(n_common * 1.0 / LEAST(na, nb), 6) AS containment
    FROM pairs WHERE n_common * 1.0 / LEAST(na, nb) >= {_CONTAINMENT_THRESHOLD}
    """,
    doc="asymmetric containment near-dups (doc-inside-doc) over capped posting lists",
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.dedup import containment_pairs_from_lists

    lists = shingle_posting_lists(spark, sf_dir)
    pairs = containment_pairs_from_lists(
        lists, threshold=_CONTAINMENT_THRESHOLD, df_cap=JACCARD_DF_CAP
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_common",
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.round(F.col("n_common") * 1.0 / F.least("na", "nb"), 6).alias("containment"),
    )

# Transitive dedup clusters: pair generation alone under-deduplicates (A~B,
# B~C must merge even when A,C never pair). Min-label propagation over the
# capped-Jaccard edge set; the oracle computes the same closure with a
# recursive CTE. Iterative & non-SQL-shaped on the Spark side, yet still
# hash-checkable because the fixpoint is unique.

_CAPPED_PAIRS_CTES = f"""
sh AS (
      SELECT doc_id, s, len(shingles) AS n_sh FROM (
        SELECT doc_id, {{shingles}} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {JACCARD_DF_CAP}
    ),
    capped AS (
      SELECT sh.* FROM sh JOIN keep ON sh.s = keep.s
    ),
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             ANY_VALUE(a.n_sh) AS na, ANY_VALUE(b.n_sh) AS nb
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    good AS (
      SELECT doc_a, doc_b FROM pr
      WHERE n_common * 1.0 / (na + nb - n_common) >= {JACCARD_THRESHOLD}
    )
"""

def near_dup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached star-contraction cluster labels (node, cluster_id) — the ONE
    owner of the ``near_dup_labels`` substrate key; every consumer
    (near_dup_clusters, filtering.dedup_keep_best_survivors) must come
    through here, per the single-owner rule in ``doc_tokens``."""
    from kin_data_pipeline_spark.operators.dedup import connected_components_star

    return _cached_substrate(
        spark,
        sf_dir,
        "near_dup_labels",
        lambda: connected_components_star(
            ngram_jaccard_capped(spark, sf_dir), "doc_a", "doc_b"
        ),
    )

@register(
    "near_dup_clusters",
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
    lab AS (SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """,
    doc="transitive near-dup clusters via min-label propagation (connected components)",
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star contraction, not plain label propagation: O(log n) rounds even
    # if boilerplate overlap chains documents into a long path (label
    # propagation is O(diameter) and raises past its round budget). The
    # contraction materializes per round (localCheckpoint), so the label
    # frame is cached like the other substrates — the survivor-stats query
    # reuses it instead of re-running the iterations.
    labels = near_dup_labels(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )

# Deep-chain clusters: the adversarial shape for iterative closure. The
# edge fixture chains consecutive doc_ids into 50-long paths (component
# diameter 49 — past plain label propagation's round budget, which would
# raise), so this query proves the O(log n) star contraction converges on
# exactly the graph class that motivates it. Oracle: recursive CTE walking
# each node back to its chain head.

@register(
    "near_dup_clusters_deep",
    """
    WITH RECURSIVE e AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 50 <> 49
    ), nodes AS (
      SELECT u AS node FROM e UNION SELECT v FROM e
    ), reach AS (
      SELECT node, node AS m FROM nodes
      UNION
      SELECT r.node, e.u FROM reach r JOIN e ON e.v = r.m
    ), lab AS (
      SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """,
    doc="connected components on 50-long path components via large-star/small-star contraction",
)
def near_dup_clusters_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    edges = (
        docs.select(
            F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
        )
        .filter(F.col("doc_a") % 50 != 49)
        .join(docs.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
    )
    labels = connected_components_star(edges, "doc_a", "doc_b")
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )

# Multimodal metadata accounting: byte/checksum stats over the opaque-media
# ingestion edge (operators/multimodal.attach_media_columns). Deterministic
# without any codec — this is the plumbing the decode stubs sit behind, and
# the oracle pins the byte-length and checksum semantics (UTF-8 bytes, md5).

@register(
    "media_metadata_stats",
    """
    WITH m AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             'application/octet-stream' AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS checksum,
             source
      FROM documents
    )
    SELECT source, mime,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT checksum) AS BIGINT) AS n_unique_payloads,
           ROUND(SUM(n_bytes) * 1.0 / COUNT(*), 6) AS avg_bytes
    FROM m GROUP BY source, mime
    """,
    doc="multimodal ingestion metadata: byte/checksum stats per source (codec-free surface)",
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import attach_media_columns

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "doc_id", "text", carry_cols=("source",))
    return media.groupBy("source", "mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.countDistinct("checksum").alias("n_unique_payloads"),
        F.round(F.sum("n_bytes") * 1.0 / F.count(F.lit(1)), 6).alias("avg_bytes"),
    )

# Multimodal decoded-geometry accounting: the de-stubbed decode path.
# Spark side synthesizes VALID BMP/PNG/WAV/JPEG payloads (real magic bytes,
# header structs, CRCs) from doc_id arithmetic, then recovers geometry by
# actually parsing those bytes (operators/multimodal.parse_media_header,
# Arrow-batched mapInPandas). The oracle predicts the same geometry from the
# synthesis arithmetic alone — so a bug in EITHER the writer or the parser
# breaks the hash match: the synth→parse round trip is what's verified.

_MEDIA_DECODED_ORACLE = """
    WITH m AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             CAST(doc_id AS BIGINT) % 4 AS fmt,
             CAST(doc_id AS BIGINT) // 4 AS sub
      FROM documents
    ), d AS (
      SELECT id,
        CASE fmt WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
                 WHEN 2 THEN 'audio/wav' ELSE 'image/jpeg' END AS mime,
        CASE fmt WHEN 0 THEN 1 + (id * 7) % 32
                 WHEN 1 THEN 1 + (id * 7) % 512
                 WHEN 2 THEN 1 + (id * 11) % 100
                 ELSE 1 + (id * 7) % 256 END AS width,
        CASE fmt WHEN 0 THEN 1 + (id * 13) % 32
                 WHEN 1 THEN 1 + (id * 13) % 512
                 WHEN 2 THEN 8000 + (sub % 4) * 4000
                 ELSE 1 + (id * 13) % 256 END AS height,
        CASE fmt WHEN 0 THEN 3
                 WHEN 1 THEN CASE sub % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                          WHEN 2 THEN 2 ELSE 4 END
                 WHEN 2 THEN 1 + sub % 2
                 ELSE CASE WHEN sub % 2 = 0 THEN 1 ELSE 3 END END AS n_channels,
        CASE fmt WHEN 0 THEN 54 + CAST(floor((3 * (1 + (id * 7) % 32) + 3) / 4) AS BIGINT) * 4 * (1 + (id * 13) % 32)
                 WHEN 1 THEN 45
                 WHEN 2 THEN 44 + (1 + (id * 11) % 100) * (1 + sub % 2) * 2
                 ELSE 32 + 3 * (CASE WHEN sub % 2 = 0 THEN 1 ELSE 3 END) END AS n_bytes
      FROM m
    )
    SELECT mime,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(MIN(width) AS BIGINT) AS min_width,
           CAST(MAX(width) AS BIGINT) AS max_width,
           ROUND(SUM(width) * 1.0 / COUNT(*), 6) AS avg_width,
           CAST(MIN(height) AS BIGINT) AS min_height,
           CAST(MAX(height) AS BIGINT) AS max_height,
           CAST(COUNT(DISTINCT n_channels) AS BIGINT) AS n_channel_values,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM d GROUP BY mime
    """

@register(
    "media_decoded_stats",
    _MEDIA_DECODED_ORACLE,
    doc="real header-level media decode (BMP/PNG/WAV/JPEG struct parse) → geometry distributions per mime",
)
def media_decoded_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        decode_media_headers,
        synthesize_media_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media_headers(synthesize_media_df(docs, "doc_id"))
    return decoded.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.min("width").cast("long").alias("min_width"),
        F.max("width").cast("long").alias("max_width"),
        F.round(F.sum("width") * 1.0 / F.count(F.lit(1)), 6).alias("avg_width"),
        F.min("height").cast("long").alias("min_height"),
        F.max("height").cast("long").alias("max_height"),
        F.countDistinct("n_channels").alias("n_channel_values"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )

# Pixel-level PNG decode round trip: the Spark side synthesizes complete
# pixel-bearing PNGs (zlib IDAT, cycling None/Sub/Up row filters) and
# recovers per-image raster statistics by a REAL stdlib decode (chunk walk
# + CRC verify + inflate + all-five-filter unfiltering) in an
# Arrow-batched mapInPandas. The oracle never decodes anything: it
# predicts the same statistics from the deterministic raster formula
# sample(x,y,c) = (3x+5y+7c+id) % 256, so a decoder bug anywhere in the
# chain (filter math, stride, channel count) breaks the hash. This retires
# the require_codec gate for generated formats — see
# operators/multimodal.py "pixel-level PNG decode".

@register(
    "png_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 24 AS INT) AS width,
             CAST(1 + doc_id * 13 % 24 AS INT) AS height,
             CAST(CASE doc_id // 4 % 4
                  WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 4
                  END AS INT) AS n_channels
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           ANY_VALUE(g.n_channels) AS n_channels,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM((3 * x.x + 5 * y.y + 7 * c.c + g.media_id) % 256)
                AS BIGINT) AS sum_samples,
           CAST(MIN((3 * x.x + 5 * y.y + 7 * c.c + g.media_id) % 256)
                AS INT) AS min_sample,
           CAST(MAX((3 * x.x + 5 * y.y + 7 * c.c + g.media_id) % 256)
                AS INT) AS max_sample,
           ROUND(SUM((3 * x.x + 5 * y.y + 7 * c.c + g.media_id) % 256) * 1.0
                 / COUNT(*), 6) AS mean_sample
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y),
         UNNEST(range(0, g.n_channels)) AS c(c)
    GROUP BY g.media_id
    """,
    doc=(
        "pixel-level PNG decode (stdlib zlib inflate + scanline "
        "unfiltering) → per-image raster stats; oracle predicts from the "
        "deterministic raster formula"
    ),
)
def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        png_pixel_stats_df,
        synthesize_pixel_png_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = png_pixel_stats_df(synthesize_pixel_png_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "width",
        "height",
        "n_channels",
        "n_samples",
        "sum_samples",
        "min_sample",
        "max_sample",
        F.round(F.col("sum_samples") * 1.0 / F.col("n_samples"), 6).alias(
            "mean_sample"
        ),
    )

# Sample-level WAV PCM decode round trip — the audio analog of
# png_pixel_stats: the Spark side synthesizes complete RIFF/WAVE payloads
# carrying a deterministic int16 waveform (plus an unknown odd-length
# chunk the parser must skip) and recovers per-clip sample statistics by a
# REAL stdlib chunk-walk decode in an Arrow-batched mapInPandas. The
# oracle never decodes anything: it predicts the same statistics from the
# waveform formula s(f, c) = ((13f + 7c + id) % 65536) - 32768, so a
# defect anywhere in the chunk walk / fmt parse / frame unpacking breaks
# the hash.
@register(
    "wav_sample_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id % 2 AS INT) AS n_channels,
             CAST(8000 + doc_id % 4 * 4000 AS INT) AS sample_rate,
             CAST(1 + doc_id * 11 % 200 AS BIGINT) AS n_frames
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.n_frames) AS n_frames,
           ANY_VALUE(g.n_channels) AS n_channels,
           ANY_VALUE(g.sample_rate) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM((13 * f.f + 7 * c.c + g.media_id) % 65536 - 32768)
                AS BIGINT) AS sum_samples,
           CAST(MIN((13 * f.f + 7 * c.c + g.media_id) % 65536 - 32768)
                AS INT) AS min_sample,
           CAST(MAX((13 * f.f + 7 * c.c + g.media_id) % 65536 - 32768)
                AS INT) AS max_sample,
           ROUND(SUM((13 * f.f + 7 * c.c + g.media_id) % 65536 - 32768) * 1.0
                 / COUNT(*), 6) AS mean_sample
    FROM g,
         UNNEST(range(0, g.n_frames)) AS f(f),
         UNNEST(range(0, g.n_channels)) AS c(c)
    GROUP BY g.media_id
    """,
    doc=(
        "sample-level WAV PCM decode (stdlib RIFF chunk walk + int16 frame "
        "unpack) → per-clip stats; oracle predicts from the waveform formula"
    ),
)
def wav_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        synthesize_pcm_wav_df,
        wav_sample_stats_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = wav_sample_stats_df(synthesize_pcm_wav_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "n_frames",
        "n_channels",
        "sample_rate",
        "n_samples",
        "sum_samples",
        "min_sample",
        "max_sample",
        F.round(F.col("sum_samples") * 1.0 / F.col("n_samples"), 6).alias(
            "mean_sample"
        ),
    )

# Baseline-JPEG pixel decode round trip — the DCT sibling of
# png_pixel_stats, retiring the last still-image require_codec gate
# (VERDICT r4 stretch #8): the Spark side synthesizes COMPLETE
# entropy-coded baseline JPEGs (DQT, SOF0, DHT, byte-stuffed Huffman scan)
# of block-constant rasters and recovers per-image pixel statistics by a
# real pure-stdlib/numpy baseline decode (Huffman + DC prediction +
# dequant + zigzag + IDCT) in an Arrow-batched mapInPandas. Block-constant
# 8x8 tiles have only a DC coefficient (8*(v-128)); with DC quant step 8
# the round trip is mathematically EXACT, so the oracle predicts the
# decoded raster from the block formula pixel(x,y) =
# (11*(x//8) + 17*(y//8) + id) % 256 without decoding anything — a defect
# anywhere in bit I/O, byte stuffing, Huffman tables, DC prediction,
# dequantization or the IDCT breaks the hash. General (non-constant)
# rasters are pinned in tests/test_multimodal.py within quantization
# error.
@register(
    "jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS sum_pixels,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS min_pixel,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS max_pixel,
           ROUND(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                 * 1.0 / COUNT(*), 6) AS mean_pixel
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "baseline-JPEG pixel decode (pure stdlib/numpy Huffman + dequant "
        "+ IDCT) -> per-image raster stats; oracle predicts from the "
        "block-constant raster formula (exact DC-only round trip)"
    ),
)
def jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        jpeg_pixel_stats_df,
        synthesize_pixel_jpeg_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = jpeg_pixel_stats_df(synthesize_pixel_jpeg_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "width",
        "height",
        "n_pixels",
        "sum_pixels",
        "min_pixel",
        "max_pixel",
        F.round(F.col("sum_pixels") * 1.0 / F.col("n_pixels"), 6).alias(
            "mean_pixel"
        ),
    )

# Progressive-JPEG twin (VERDICT r5 stretch #8): the same block-constant
# rasters encoded as SOF2 spectral-selection streams — a DC scan for every
# block, then the whole 1..63 AC band as a second scan coded with
# progressive EOBn run symbols (block-constant rasters collapse the entire
# AC scan into a single EOBRUN). The decoder is the same general
# multi-scan path production streams would take (the SA twin below covers
# the approximation scans). Identical oracle: the
# decode is still mathematically exact for DC-only blocks.
@register(
    "progressive_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS sum_pixels,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS min_pixel,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS max_pixel,
           ROUND(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                 * 1.0 / COUNT(*), 6) AS mean_pixel
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "progressive (SOF2 spectral-selection) JPEG pixel decode — DC scan "
        "+ EOBn-coded AC band scan through the general multi-scan decoder; "
        "same exact block-formula oracle as the baseline tier"
    ),
)
def progressive_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        jpeg_pixel_stats_df,
        synthesize_pixel_progressive_jpeg_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = jpeg_pixel_stats_df(synthesize_pixel_progressive_jpeg_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "width",
        "height",
        "n_pixels",
        "sum_pixels",
        "min_pixel",
        "max_pixel",
        F.round(F.col("sum_pixels") * 1.0 / F.col("n_pixels"), 6).alias(
            "mean_pixel"
        ),
    )

# Successive-approximation twin (VERDICT r6 ask #7 stretch, option A —
# retires the LAST still-image require_codec gate): the same rasters
# through the FULL ITU T.81 Annex G profile — split AC bands (1-5, 6-63),
# DC point-transformed one plane, AC two planes, then one refinement scan
# per remaining bit plane (raw DC bits; the run/newly-significant/
# correction-bit AC refinement coding, operators/multimodal.py
# ::_encode_ac_refine_scan, wire format hand-pinned in
# tests/test_multimodal.py). All planes are emitted, so the decode is
# coefficient-exact and the block-formula oracle is unchanged.
@register(
    "sa_progressive_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS sum_pixels,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS min_pixel,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS max_pixel,
           ROUND(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                 * 1.0 / COUNT(*), 6) AS mean_pixel
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "successive-approximation progressive JPEG pixel decode — bit-plane "
        "first/refinement scans over split AC bands through the full Annex G "
        "decoder; same exact block-formula oracle"
    ),
)
def sa_progressive_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        jpeg_pixel_stats_df,
        synthesize_pixel_sa_jpeg_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = jpeg_pixel_stats_df(synthesize_pixel_sa_jpeg_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "width",
        "height",
        "n_pixels",
        "sum_pixels",
        "min_pixel",
        "max_pixel",
        F.round(F.col("sum_pixels") * 1.0 / F.col("n_pixels"), 6).alias(
            "mean_pixel"
        ),
    )

# 4:2:0 color twin (retires the chroma-subsampling gate for baseline
# streams — the dominant production JPEG layout): 3-component YCbCr with
# 2x2 luma sampling, one MCU-interleaved scan (4 luma blocks + Cb + Cr per
# 16x16 MCU, independent DC predictors), decoded through the general
# baseline path (operators/multimodal.py::decode_baseline_jpeg) with
# per-component block grids and nearest-neighbor chroma upsample. Chroma
# planes are SYNTHESIZED at half resolution from their own 8x8 tile
# formulas, so every chroma block is DC-only and the 3-plane round trip
# stays mathematically exact; the oracle predicts full-res chroma from
# x//16, y//16 without decoding anything. No RGB transform — planes
# compare as coded.
@register(
    "ycbcr420_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS y_sum,
           CAST(SUM((7 * (x.x // 16) + 19 * (y.y // 16) + 3 * g.media_id) % 256)
                AS BIGINT) AS cb_sum,
           CAST(SUM((5 * (x.x // 16) + 23 * (y.y // 16) + 7 * g.media_id) % 256)
                AS BIGINT) AS cr_sum,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_min,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_max
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "4:2:0 chroma-subsampled YCbCr baseline JPEG decode — MCU-"
        "interleaved scan, per-component block grids, chroma upsample; "
        "exact 3-plane block-formula oracle"
    ),
)
def ycbcr420_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        synthesize_pixel_ycbcr_jpeg_df,
        ycbcr_pixel_stats_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ycbcr_pixel_stats_df(
        synthesize_pixel_ycbcr_jpeg_df(docs, "doc_id")
    ).select(
        "media_id", "width", "height", "n_pixels",
        "y_sum", "cb_sum", "cr_sum", "y_min", "y_max",
    )

# MULTI-SCAN BASELINE × 4:2:0 (round-8 gate retirement): the same
# color-tier planes emitted as one non-interleaved SOS per component over
# its TRUE block raster — the sequential form T.81 mandates when an MCU
# would exceed 10 blocks, and the last structural baseline-JPEG shape the
# decoder had refused. Oracle identical to the interleaved twin:
# block-constant planes decode exactly, so any defect in the per-scan
# block-raster walk breaks the hash against the closed-form formulas.
@register(
    "multiscan_ycbcr420_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS y_sum,
           CAST(SUM((7 * (x.x // 16) + 19 * (y.y // 16) + 3 * g.media_id) % 256)
                AS BIGINT) AS cb_sum,
           CAST(SUM((5 * (x.x // 16) + 23 * (y.y // 16) + 7 * g.media_id) % 256)
                AS BIGINT) AS cr_sum,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_min,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_max
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "multi-scan baseline 4:2:0 JPEG decode — one non-interleaved SOS "
        "per component over its true block raster; exact 3-plane "
        "block-formula oracle"
    ),
)
def multiscan_ycbcr420_jpeg_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        synthesize_pixel_multiscan_ycbcr_jpeg_df,
        ycbcr_pixel_stats_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ycbcr_pixel_stats_df(
        synthesize_pixel_multiscan_ycbcr_jpeg_df(docs, "doc_id")
    ).select(
        "media_id", "width", "height", "n_pixels",
        "y_sum", "cb_sum", "cr_sum", "y_min", "y_max",
    )

# PROGRESSIVE × SUBSAMPLED JPEG (VERDICT r7 ask #7a): the same color-tier
# planes as ycbcr420_jpeg_pixel_stats, but encoded SOF2 progressive
# (interleaved DC first scan at Al=1, two spectral-selection AC bands,
# one DC + two AC refinement planes) WITH 4:2:0 subsampling — composing
# the two round-7 codec generalizations retires the last synthetic-tier
# require_codec gate. The decode walks interleaved scans over the
# frame-level MCU lattice and non-interleaved AC scans over each
# component's TRUE (unpadded) block raster (T.81 A.2.2/A.2.3). Oracle
# identical to the baseline 4:2:0 twin: block-constant planes decode
# exactly, so a defect anywhere in the scan-script handling breaks the
# hash against the closed-form pixel formulas.
@register(
    "progressive_ycbcr420_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS y_sum,
           CAST(SUM((7 * (x.x // 16) + 19 * (y.y // 16) + 3 * g.media_id) % 256)
                AS BIGINT) AS cb_sum,
           CAST(SUM((5 * (x.x // 16) + 23 * (y.y // 16) + 7 * g.media_id) % 256)
                AS BIGINT) AS cr_sum,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_min,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS y_max
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "progressive (SOF2) x 4:2:0 chroma-subsampled JPEG decode — "
        "interleaved DC + per-component true-raster AC scans with "
        "successive approximation; exact 3-plane block-formula oracle"
    ),
)
def progressive_ycbcr420_jpeg_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        synthesize_pixel_progressive_ycbcr_jpeg_df,
        ycbcr_pixel_stats_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ycbcr_pixel_stats_df(
        synthesize_pixel_progressive_ycbcr_jpeg_df(docs, "doc_id")
    ).select(
        "media_id", "width", "height", "n_pixels",
        "y_sum", "cb_sum", "cr_sum", "y_min", "y_max",
    )

# Video tier — pixel-level frame decode of synthesized AVI-MJPG clips
# (reference: no media path at all; training-data superset). Real
# end-to-end: RIFF/AVI container parse (avih geometry, movi '00dc' frame
# chunks), JVM-side uniform frame sampling (frame_sample_plan:
# sequence/transform array math, floor(i·n/take)), then entropy decode of
# ONLY the sampled frames through the baseline-JPEG codec. Frames are
# block-constant so the decode round trip is exact and the oracle can
# predict every sampled pixel from the generation formula — a defect in
# container writing/parsing, the sampling arithmetic, frame extraction or
# the codec breaks the hash.
@register(
    "video_frame_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 32 AS INT) AS width,
             CAST(1 + doc_id * 13 % 32 AS INT) AS height,
             CAST(1 + doc_id % 7 AS INT) AS n_frames
      FROM documents
    ), s AS (
      SELECT g.*, LEAST(g.n_frames, 4) AS n_sampled FROM g
    ), fr AS (
      SELECT s.*, CAST((i.i * s.n_frames) // s.n_sampled AS INT) AS frame_idx
      FROM s, UNNEST(range(0, s.n_sampled)) AS i(i)
    ), px AS (
      SELECT fr.media_id, fr.width, fr.height, fr.n_frames, fr.n_sampled,
             (11 * (x.x // 8) + 17 * (y.y // 8) + fr.media_id
              + 29 * fr.frame_idx) % 256 AS v
      FROM fr,
           UNNEST(range(0, fr.width)) AS x(x),
           UNNEST(range(0, fr.height)) AS y(y)
    )
    SELECT media_id,
           CAST(ANY_VALUE(n_frames) AS INT) AS n_frames,
           ANY_VALUE(width) AS width, ANY_VALUE(height) AS height,
           CAST(ANY_VALUE(n_sampled) AS INT) AS n_sampled,
           CAST(SUM(v) AS BIGINT) AS sum_pixels,
           CAST(MIN(v) AS INT) AS min_pixel,
           CAST(MAX(v) AS INT) AS max_pixel,
           ROUND(SUM(v) * 1.0 / COUNT(*), 6) AS mean_pixel
    FROM px GROUP BY media_id
    """,
    doc=(
        "AVI-MJPG video tier: container parse + uniform frame sampling + "
        "baseline-JPEG decode of sampled frames -> per-clip pixel stats; "
        "oracle predicts from the per-frame block-constant formula"
    ),
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        AVI_HEADER_SCHEMA,
        VIDEO_STATS_SCHEMA,
        avi_header_batch,
        frame_sample_plan,
        synthesize_avi_mjpeg_df,
        video_frame_stats_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    clips = synthesize_avi_mjpeg_df(docs, "doc_id")
    hdr = clips.mapInPandas(avi_header_batch, schema=AVI_HEADER_SCHEMA)
    planned = frame_sample_plan(hdr, "n_frames", sample_count=4)
    stats = planned.select("media_id", "content", "frame_indices").mapInPandas(
        video_frame_stats_batch, schema=VIDEO_STATS_SCHEMA
    )
    return stats.select(
        "media_id",
        "n_frames",
        "width",
        "height",
        "n_sampled",
        "sum_pixels",
        "min_pixel",
        "max_pixel",
        F.round(
            F.col("sum_pixels")
            * 1.0
            / (F.col("n_sampled") * F.col("width") * F.col("height")),
            6,
        ).alias("mean_pixel"),
    )

# SimHash near-dup pairs — tier-4 pairing: band the 16-bit signature into
# two 16-bit buckets (a pair within Hamming distance 1 must agree on at
# least one band by pigeonhole), equi-join on (band, value) — linear
# shuffle, never corpus×corpus — then verify by exact popcount(xor).
# All integer arithmetic, bit-identical on both engines. Wider bands keep
# bucket occupancy ~N/2^16 — the recall/occupancy dial the docstring of
# lsh_candidates describes; at larger Hamming budgets raise SIMHASH_BITS
# rather than shrinking bands (4-bit bands put ~N/16 docs per bucket,
# which is quadratic in practice).

_SIMHASH_BAND_BITS = 16
_SIMHASH_N_BANDS = SIMHASH_BITS // _SIMHASH_BAND_BITS
_SIMHASH_HAM_MAX = 1

@register(
    "simhash_near_dups",
    f"""
    WITH tok AS (
      SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h FROM (
        SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), bits AS (
      SELECT doc_id, {', '.join(_simhash_bitsum_sql())}
      FROM tok GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
             CAST({' + '.join(f'(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)' for j in range(SIMHASH_BITS))} AS BIGINT) AS simhash
      FROM bits
    ), banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * {_SIMHASH_BAND_BITS})) & {(1 << _SIMHASH_BAND_BITS) - 1} AS bval
      FROM sig, UNNEST(range(0, {_SIMHASH_N_BANDS})) AS t(band)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming_dist
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {_SIMHASH_HAM_MAX}
    """,
    doc=f"SimHash near-dup pairs: banded bucket join + Hamming<={_SIMHASH_HAM_MAX} verify",
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash_signatures(spark, sf_dir)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    banded = sig.withColumn(
        "bb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * _SIMHASH_BAND_BITS)
                        .bitwiseAND(mask)
                        .alias("bval"),
                    )
                    for b in range(_SIMHASH_N_BANDS)
                ]
            )
        ),
    ).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval")
    )
    # Grouped bucket-list expansion, not a (band, bval) self-join: the join
    # form evaluates the full signature chain (tokenize + md5 + 32 bit-vote
    # sums per doc) once per side, doubling the dominant cost. One groupBy
    # buffers each bucket's (doc_id, simhash) list — occupancy ~N/2^16 per
    # band keeps the blowup linear — and the signatures ride along, so no
    # re-attach join is needed before the Hamming verify.
    lists = banded.groupBy("band", "bval").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("docs")
    )
    from kin_data_pipeline_spark.operators.dedup import within_list_pairs

    pair = within_list_pairs(
        "docs",
        lambda x, y: F.struct(
            x["doc_id"].alias("doc_a"),
            y["doc_id"].alias("doc_b"),
            x["simhash"].alias("sig_a"),
            y["simhash"].alias("sig_b"),
        ),
    ).alias("p")
    cand = (
        lists.select(pair)
        .select("p.doc_a", "p.doc_b", "p.sig_a", "p.sig_b")
        .distinct()
    )
    ham = F.expr("bit_count(sig_a ^ sig_b)")
    return (
        cand.withColumn("hamming_dist", ham.cast("int"))
        .filter(F.col("hamming_dist") <= _SIMHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming_dist")
    )

# Embedding-space quality evaluation: label agreement among each sampled
# vector's exact top-k cosine neighbors. The standard label-noise /
# embedding-eval metric for a labeled corpus — a high-agreement space means
# nearest neighbors share labels. Query set is a deterministic 1-in-50
# sample (the broadcastable side of the brute-force scan, same shape as
# embedding_knn_top5); counts are integers and the rate is one int/int
# division, so parity is exact.

_EVAL_K = 5
#: Data-dependent sample stride: a FIXED ~40-query eval set at any corpus
#: size. The round-4 fixed mod of 50 made the query set grow as N/50, so
#: the brute-force scan was N^2/50 — 70x wall time at 10x data in the sf1
#: sweep. Same count()-based arithmetic on both engines.
_EVAL_SAMPLE_SQL = "(SELECT GREATEST(1, COUNT(*) // 40) FROM embeddings)"

@register(
    "knn_label_agreement",
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), q AS (
      SELECT * FROM e WHERE vec_id % {_EVAL_SAMPLE_SQL} = 0
    ), sims AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             c.vec_id AS neighbor_id, c.label AS c_label,
             list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim
      FROM q JOIN e c ON c.vec_id <> q.vec_id
    ), top AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
        FROM sims
      ) WHERE rnk <= {_EVAL_K}
    )
    SELECT q_label AS label,
           CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matches,
           SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
             AS agree_rate
    FROM top GROUP BY q_label
    """,
    doc="kNN label-agreement eval over the embedding space (label-noise metric)",
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    sample_mod = max(1, emb.count() // 40)
    sample = emb.filter(F.col("vec_id") % sample_mod == 0)
    top = cosine_topk(emb, sample, k=_EVAL_K)
    lab_q = F.broadcast(labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    ))
    lab_c = F.broadcast(labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("c_label")
    ))
    hit = F.when(F.col("c_label") == F.col("q_label"), 1).otherwise(0)
    return (
        top.join(lab_q, "query_id")
        .join(lab_c, "neighbor_id")
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum(hit).cast("long").alias("n_matches"),
            (F.sum(hit) * F.lit(1.0) / F.count(F.lit(1))).alias("agree_rate"),
        )
    )

# Corpus length profile: exact discrete percentiles (p50/p90/p99) of document
# length per source via rank selection — no interpolation, so both engines
# pick the identical element (ints end to end). The multi-quantile
# completion of A4's single exact median.
@register(
    "doc_length_percentiles",
    """
    WITH r AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS p50_chars,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS p90_chars,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN n_chars END) AS BIGINT) AS p99_chars
    FROM r GROUP BY source
    """,
    doc="exact rank-selected length percentiles per source (corpus profiling)",
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("n_chars"))
        ).cast("long")

    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick(0.50).alias("p50_chars"),
        pick(0.90).alias("p90_chars"),
        pick(0.99).alias("p99_chars"),
    )

# Video frame-sampling plan, oracle-checked: frame counts derive
# deterministically from payload bytes (no codec needed), the plan picks
# evenly-strided indices JVM-side (sequence/transform), and the oracle
# reproduces the stride arithmetic — pinning the n=0 (empty clip) and
# n<sample_count (keep-all) edges. The byte-level extraction consuming the
# plan is the stubbed codec step.
_FRAME_SAMPLE_K = 8
_FRAME_MOD = 240  # fake clip length: n_bytes % 240 (includes 0-frame clips)

@register(
    "frame_sample_plan_stats",
    f"""
    WITH clips AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id, source,
             CAST(octet_length(encode(text)) % {_FRAME_MOD} AS BIGINT) AS n_frames
      FROM documents
    ), planned AS (
      SELECT media_id, source, n_frames,
             CAST(LEAST(n_frames, {_FRAME_SAMPLE_K}) AS BIGINT) AS n_sampled,
             CASE WHEN n_frames = 0 THEN []
                  ELSE [CAST(FLOOR(i * n_frames / LEAST(n_frames, {_FRAME_SAMPLE_K})) AS BIGINT)
                        FOR i IN RANGE(0, CAST(LEAST(n_frames, {_FRAME_SAMPLE_K}) AS BIGINT))]
             END AS idx
      FROM clips
    )
    SELECT media_id, source, n_frames, n_sampled,
           CAST(CASE WHEN n_sampled = 0 THEN -1 ELSE idx[1] END AS BIGINT) AS first_idx,
           CAST(CASE WHEN n_sampled = 0 THEN -1 ELSE idx[-1] END AS BIGINT) AS last_idx,
           CAST(COALESCE(list_sum(idx), 0) AS BIGINT) AS sum_idx
    FROM planned
    """,
    doc="frame-sampling plan over fake clip lengths: strided index arithmetic, 0/short-clip edges",
)
def frame_sample_plan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        attach_media_columns,
        frame_sample_plan,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "doc_id", "text", carry_cols=("source",))
    clips = media.select(
        "media_id", "source", (F.col("n_bytes") % _FRAME_MOD).alias("n_frames")
    )
    planned = frame_sample_plan(clips, "n_frames", _FRAME_SAMPLE_K)
    idx = F.col("frame_indices")
    return planned.select(
        "media_id",
        "source",
        "n_frames",
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.when(F.col("n_sampled") == 0, F.lit(-1))
        .otherwise(F.element_at(idx, 1))
        .cast("long")
        .alias("first_idx"),
        F.when(F.col("n_sampled") == 0, F.lit(-1))
        .otherwise(F.element_at(idx, -1))
        .cast("long")
        .alias("last_idx"),
        F.coalesce(F.aggregate(idx, F.lit(0), lambda a, x: a + x), F.lit(0))
        .cast("long")
        .alias("sum_idx"),
    )

# Corpus-wide heavy-hitter shingles: the boilerplate detector. The shingles
# whose document frequency tops the corpus are headers/footers/licence
# blurbs shared across many documents — exactly the strings a filtering
# pass strips (and the population the Jaccard df-cap drops from pair
# formation). Zero new shuffles over the cached posting-list substrate:
# the grouped lists already carry df, and the global top-k compiles to
# TakeOrderedAndProject (per-partition heaps + a k-row driver merge), not
# a corpus-wide sort shuffle. The (df DESC, s ASC) tiebreak makes the
# top-k set unique, so the limit is deterministic on both engines.

_HH_TOP_K = 20

@register(
    "top_shingle_heavy_hitters",
    f"""
    WITH sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
      ), UNNEST(shingles) AS t(s)
    ), freq AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s
    )
    SELECT s AS shingle, df FROM freq
    ORDER BY df DESC, s ASC LIMIT {_HH_TOP_K}
    """,
    doc=f"top-{_HH_TOP_K} highest-df shingles (boilerplate detector; TakeOrdered, no global sort)",
)
def top_shingle_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    lists = shingle_posting_lists(spark, sf_dir)
    return (
        lists.select(F.col("s").alias("shingle"), F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(_HH_TOP_K)
    )

# Cross-source duplication matrix: where do the near-dup pairs COME from?
# The data-mixing audit primitive — a high off-diagonal cell means two
# sources scrape the same upstream content and their mixture weights
# double-count it. Reuses the capped-Jaccard pair substrate (no new pair
# formation); the per-endpoint source lookup is an equi-join of the small
# pair set against the (doc_id, source) projection, and the (least,
# greatest) normalization folds the matrix to upper-triangular so a pair
# is counted once regardless of endpoint order. min/max are selections
# over already-rounded scores, so the aggregate is exact on both engines.

@register(
    "cross_source_dup_matrix",
    f"""
    WITH {_CAPPED_PAIRS_CTES.format(shingles=_SQL_SHINGLES)},
    scored AS (
      SELECT doc_a, doc_b,
             ROUND(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
      FROM pr WHERE n_common * 1.0 / (na + nb - n_common) >= {JACCARD_THRESHOLD}
    ), lab AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b,
             s.jaccard
      FROM scored s
      JOIN documents da ON da.doc_id = s.doc_a
      JOIN documents db ON db.doc_id = s.doc_b
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(jaccard) AS min_jaccard,
           MAX(jaccard) AS max_jaccard
    FROM lab GROUP BY source_a, source_b
    """,
    doc="near-dup pair counts by (source, source): cross-source contamination matrix",
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _jaccard_pairs_query(spark, sf_dir, df_cap=JACCARD_DF_CAP)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
    )
    return lab.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("jaccard").alias("min_jaccard"),
        F.max("jaccard").alias("max_jaccard"),
    )

# Embedding-cell outliers: the pruning complement of SemDeDup. Dedup
# removes a cell's REDUNDANT members (too close to a neighbor); quality
# pruning removes its ALIEN members — the vectors farthest from their own
# centroid, i.e. mis-clustered or noise points (the "prune the cluster
# fringe" step of SemDeDup-style curation). Reuses the deterministic IVF
# assignment (centroids = vec_id % stride, max_by hash-aggregate); the
# per-cell bottom-k is a window over the cell partition — bounded by cell
# occupancy, never corpus-wide. Rank (sim ASC, vid ASC) is total, so the
# bottom-2 set is unique and engine-independent; cell_n is an exact count.

_OUTLIER_BOTTOM_K = 2

@register(
    "embedding_cell_outliers",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM e
      WHERE vec_id % {_SEMD_STRIDE_SQL} = 0
    ), asg AS (
      SELECT vec_id, cid, csim FROM (
        SELECT e.vec_id, c.cid,
               list_dot_product(e.emb, c.cemb) / (e.nrm * c.cnrm) AS csim,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.emb, c.cemb) / (e.nrm * c.cnrm) DESC,
                          c.cid ASC) AS rn
        FROM e, cent c
      ) WHERE rn = 1
    ), ranked AS (
      SELECT cid, vec_id, csim,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY csim ASC, vec_id ASC) AS rnk,
             COUNT(*) OVER (PARTITION BY cid) AS cell_n
      FROM asg
    )
    SELECT cid, vec_id, ROUND(csim, 4) AS sim_to_centroid,
           CAST(rnk AS INT) AS rnk, CAST(cell_n AS BIGINT) AS cell_n
    FROM ranked WHERE rnk <= {_OUTLIER_BOTTOM_K}
    """,
    doc="per-IVF-cell bottom-k members by centroid cosine (cluster-fringe pruning)",
)
def embedding_cell_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.similarity import with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    e = with_norm(emb, "embedding").select(
        F.col("vec_id").alias("vid"), F.col("__emb").alias("emb"), F.col("__nrm").alias("nrm")
    )
    from kin_data_pipeline_spark.operators.similarity import ivf_centroid_stride

    stride = ivf_centroid_stride(emb)
    cent = e.filter(F.col("vid") % stride == 0).select(
        F.col("vid").alias("cid"), F.col("emb").alias("cemb"), F.col("nrm").alias("cnrm")
    )
    csim = F.aggregate(
        F.zip_with("emb", "cemb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    ) / (F.col("nrm") * F.col("cnrm"))
    # nearest centroid kept together with its similarity: max_by over the
    # lexicographic (csim, -cid) struct — one hash aggregate, map-side
    # partial, no per-vector sort (same shape as operators.similarity
    # .assign_cells, which returns only the cid).
    asg = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("csim", csim)
        .groupBy("vid")
        .agg(F.expr("max_by(struct(cid, csim), struct(csim, -cid))").alias("best"))
        .select("vid", F.col("best.cid").alias("cid"), F.col("best.csim").alias("csim"))
    )
    w = Window.partitionBy("cid").orderBy(F.asc("csim"), F.asc("vid"))
    wc = Window.partitionBy("cid")
    ranked = asg.select(
        "cid",
        F.col("vid").alias("vec_id"),
        "csim",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wc).alias("cell_n"),
    )
    return ranked.filter(F.col("rnk") <= _OUTLIER_BOTTOM_K).select(
        "cid",
        "vec_id",
        F.round("csim", 4).alias("sim_to_centroid"),
        F.col("rnk").cast("int").alias("rnk"),
        F.col("cell_n").cast("long").alias("cell_n"),
    )

# PageRank centrality over the near-dup candidate graph — the "canonical
# document" signal: inside a duplication cluster, the member most connected
# to other widely-duplicated members ranks highest (boilerplate hubs and
# template families light up). Three power-iteration steps, unrolled —
# each step is one grouped equi-join shuffle, the scale shape GraphX/Pregel
# would compile to, with NO iterative driver loop hiding in a registered
# query. Exactness: scores live in integer micro-units; the damping update
# s' = 150000 + (17 * sum(s_u DIV deg_u)) DIV 20 is pure truncating integer
# arithmetic (0.85 = 17/20 exactly), so both engines agree bit-for-bit and
# parallel summation order cannot matter.
_PR_ITERS = 3

def _pr_sql() -> str:
    steps = []
    prev = "init"
    for i in range(_PR_ITERS):
        steps.append(
            f"s{i} AS (SELECT e.dst AS doc_id, "
            f"150000 + (17 * SUM(p.s // d.deg)) // 20 AS s "
            f"FROM edges e JOIN {prev} p ON e.src = p.doc_id "
            f"JOIN deg d ON e.src = d.doc_id GROUP BY e.dst)"
        )
        prev = f"s{i}"
    return ", ".join(steps)

@register(
    "near_dup_pagerank_3iter",
    f"""
    WITH {_sql_lsh_cand_ctes()}, edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), deg AS (
      SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges GROUP BY src
    ), init AS (
      SELECT doc_id, CAST(1000000 AS BIGINT) AS s FROM deg
    ), {_pr_sql()}
    SELECT p.doc_id, d.deg, CAST(p.s AS BIGINT) AS pr_micro,
           ROUND(CAST(p.s AS DOUBLE) / 1000000.0, 6) AS pagerank
    FROM s{_PR_ITERS - 1} p JOIN deg d ON p.doc_id = d.doc_id
    """,
    doc=(
        f"{_PR_ITERS}-step integer PageRank over the MinHash-LSH candidate "
        "graph (damping 17/20, truncating integer arithmetic — canonical-"
        "document centrality inside duplication clusters)"
    ),
)
def near_dup_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = lsh_candidate_pairs(spark, sf_dir)
    edges = cand.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(cand.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    # localCheckpoint truncates lineage (the star-contraction CC pattern,
    # operators/dedup.py): without it iteration N's plan re-expands the
    # banded self-join N more times — 64 scans / 107 exchanges in the
    # compiled tree for 3 iterations, vs a linear plan over the
    # checkpointed edge list.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    deg = deg.select(F.col("src").alias("doc_id"), "deg")
    scores = deg.select("doc_id", F.lit(1000000).cast("long").alias("s"))
    e = edges.select(F.col("src").alias("doc_id"), "dst")
    for _ in range(_PR_ITERS):
        contrib = (
            e.join(scores, "doc_id")
            .join(deg, "doc_id")
            .select("dst", F.expr("s div deg").alias("c"))
        )
        scores = contrib.groupBy("dst").agg(
            (F.lit(150000) + F.expr("17 * sum(c) div 20")).cast("long").alias("s")
        ).select(F.col("dst").alias("doc_id"), "s")
    return scores.join(deg, "doc_id").select(
        "doc_id",
        "deg",
        F.col("s").alias("pr_micro"),
        F.round(F.col("s").cast("double") / F.lit(1000000.0), 6).alias("pagerank"),
    )

# Count-min sketch over token frequencies — the mergeable approximate-
# frequency structure (Cormode & Muthukrishnan 2005): d hash rows of w
# counters built in ONE grouped aggregation (counters are sums, so
# per-partition sketches merge by addition — the property that makes this
# the right 100 TB shape for frequency estimation, unlike exact
# vocabulary-sized counting). Estimates are min over the d rows and
# OVERCOUNT only (est >= exact, guaranteed), which the audit columns
# exhibit. The sketch itself is deterministic integer arithmetic, so both
# engines build the identical counter matrix and the comparison is exact —
# an oracle-checked SKETCH, unlike the HLL tier's rows-only checks.
_CMS_W = 1024  # counters per row
_CMS_ROWS = [(387420489, 12190087), (962892417, 55555333), (29986577, 271828182)]
_CMS_PROBES = ["dup", "merge", "scan", "the", "vector", "zzz_absent_token"]

def _cms_bucket_sql(i: int, expr: str) -> str:
    a, b = _CMS_ROWS[i]
    return f"(({a} * {_sql_h32(expr)} + {b}) % {MINHASH_PRIME}) % {_CMS_W}"

def _cms_bucket_col(i: int, col):
    a, b = _CMS_ROWS[i]
    return ((F.lit(a) * _h32(col) + F.lit(b)) % MINHASH_PRIME) % _CMS_W

@register(
    "countmin_token_estimates",
    f"""
    WITH tok AS (
      SELECT w FROM (
        SELECT {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), cells AS (
      {' UNION ALL '.join(f"SELECT {i} AS row_id, {_cms_bucket_sql(i, 'w')} AS bucket FROM tok" for i in range(len(_CMS_ROWS)))}
    ), sketch AS (
      SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row_id, bucket
    ), probes AS (
      SELECT * FROM (VALUES {', '.join(f"({i}, '{t}')" for i, t in enumerate(_CMS_PROBES))}) AS p(pid, token)
    ), probe_cells AS (
      {' UNION ALL '.join(f"SELECT pid, token, {i} AS row_id, {_cms_bucket_sql(i, 'token')} AS bucket FROM probes" for i in range(len(_CMS_ROWS)))}
    ), est AS (
      SELECT pc.token, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est_cf
      FROM probe_cells pc
      LEFT JOIN sketch s ON s.row_id = pc.row_id AND s.bucket = pc.bucket
      GROUP BY pc.token
    ), exact AS (
      SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS exact_cf
      FROM tok GROUP BY w
    )
    SELECT e.token, COALESCE(x.exact_cf, 0) AS exact_cf, e.est_cf,
           CAST(e.est_cf - COALESCE(x.exact_cf, 0) AS BIGINT) AS overcount
    FROM est e LEFT JOIN exact x ON e.token = x.token
    """,
    doc=(
        f"count-min sketch ({len(_CMS_ROWS)}x{_CMS_W} counters, one grouped "
        "pass, mergeable by addition) probed for literal tokens vs exact "
        "counts — an oracle-exact sketch (est >= exact by construction)"
    ),
)
def countmin_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_tokens(spark, sf_dir).select("w")
    cells = None
    for i in range(len(_CMS_ROWS)):
        part = tok.select(
            F.lit(i).alias("row_id"), _cms_bucket_col(i, F.col("w")).alias("bucket")
        )
        cells = part if cells is None else cells.unionAll(part)
    sketch = cells.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    probes = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CMS_PROBES)], "pid int, token string"
    )
    pc = None
    for i in range(len(_CMS_ROWS)):
        part = probes.select(
            "token",
            F.lit(i).alias("row_id"),
            _cms_bucket_col(i, F.col("token")).alias("bucket"),
        )
        pc = part if pc is None else pc.unionAll(part)
    # the sketch is <= d*w rows by construction: broadcast-safe at any
    # corpus size (the whole point of sketching the vocabulary)
    est = (
        pc.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cf"))
    )
    exact = tok.groupBy(F.col("w").alias("token")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_cf")
    )
    return est.join(exact, "token", "left").select(
        "token",
        F.coalesce("exact_cf", F.lit(0)).cast("long").alias("exact_cf"),
        "est_cf",
        (F.col("est_cf") - F.coalesce("exact_cf", F.lit(0)))
        .cast("long")
        .alias("overcount"),
    )

# BPE pair statistics — the first step of byte-pair-encoding tokenizer
# training: corpus-wide frequencies of ADJACENT symbol pairs inside
# tokens, ranked. (Full BPE iterates merge→recount; the counting pass is
# the distributed-scale part — each iteration is exactly this query over
# the re-segmented corpus.) Pure array arithmetic per token + one grouped
# count + TakeOrderedAndProject top-k: no UDFs, no corpus pair blowup
# (pairs per token = len-1).
_BPE_TOP_K = 20

@register(
    "bpe_pair_frequencies",
    f"""
    WITH tok AS (
      SELECT w FROM (
        SELECT {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), pairs AS (
      SELECT p FROM (
        SELECT list_transform(range(1, length(w)), i -> substr(w, i, 2)) AS ps
        FROM tok WHERE length(w) >= 2
      ), UNNEST(ps) AS t(p)
    ), counted AS (
      SELECT p AS pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY p
    )
    SELECT pair, n_occurrences, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rnk
      FROM counted
    ) WHERE rnk <= {_BPE_TOP_K}
    """,
    doc=(
        f"BPE tokenizer-training pair statistics: top-{_BPE_TOP_K} adjacent "
        "character pairs by corpus frequency (the counting pass of each "
        "BPE merge iteration)"
    ),
)
def bpe_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_tokens(spark, sf_dir).select("w").filter(F.length("w") >= 2)
    pairs = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    # top-k FIRST (compiles to TakeOrderedAndProject — per-partition heaps,
    # never a global sort of the pair-frequency table), then the rank
    # window runs over the k-row result only.
    top = counted.orderBy(F.desc("n_occurrences"), F.asc("pair")).limit(_BPE_TOP_K)
    w_rank = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return top.select(
        "pair",
        "n_occurrences",
        F.row_number().over(w_rank).cast("int").alias("rnk"),
    )


# BPE tokenizer APPLICATION — the other half of the tokenizer pair
# (bpe_pair_frequencies is the training counting pass; this applies a
# trained merge table to the corpus). Fully columnar, zero UDFs: each
# vocabulary word becomes a space-joined character stream and the ranked
# merges compile into chained JVM `replace` expressions (12 merges x 5
# passes — left-to-right non-overlapping replace at least halves the
# remaining adjacent occurrences per pass, so 5 passes cover chains of
# 2^5 overlapping occurrences; both engines share the identical pass
# count and replace semantics, so the comparison is exact by
# construction). Scale shape: the string pipeline runs once per DISTINCT
# word (vocabulary grain, Zipf-small), then joins back to (doc, word)
# counts — the vocabulary-scale join AQE owns (PLANS.md
# "Vocabulary-scale boundary"). The 12-row merge table is a bounded
# driver probe at plan-build time, the same trained-artifact pattern as
# the IVF centroid list (PLANS.md "sampled structures").
_BPE_APPLY_MERGES = 12
_BPE_APPLY_PASSES = 5

def _bpe_apply_replace_chain(expr: str) -> str:
    """The oracle's per-iteration replace chain — _BPE_APPLY_PASSES nested
    replaces, generated from the same constant the Spark side loops on so
    the two can never drift."""
    for _ in range(_BPE_APPLY_PASSES):
        expr = f"replace({expr}, m.pat, m.rep)"
    return expr


@register(
    "bpe_apply_token_counts",
    f"""
    WITH RECURSIVE tok AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, w FROM (
        SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
      ), UNNEST(ws) AS t(w)
    ), dw AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n_occ FROM tok GROUP BY 1, 2
    ), vocab AS (
      SELECT DISTINCT w FROM dw
    ), bpairs AS (
      SELECT p FROM (
        SELECT list_transform(range(1, length(w)), i -> substr(w, i, 2)) AS ps
        FROM tok WHERE length(w) >= 2
      ), UNNEST(ps) AS t(p)
    ), bcounted AS (
      SELECT p AS pair, COUNT(*) AS n FROM bpairs GROUP BY p
    ), merges AS (
      SELECT CAST(rnk AS INT) AS rnk,
             ' ' || substr(pair, 1, 1) || ' ' || substr(pair, 2, 1) || ' ' AS pat,
             ' ' || pair || ' ' AS rep
      FROM (
        SELECT pair, ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS rnk
        FROM bcounted
      ) WHERE rnk <= {_BPE_APPLY_MERGES}
    ), init AS (
      SELECT w,
             ' ' || array_to_string(
               list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), ' '
             ) || ' ' AS s,
             0 AS r
      FROM vocab
    ), ap AS (
      SELECT * FROM init
      UNION ALL
      SELECT a.w, {_bpe_apply_replace_chain("a.s")} AS s, a.r + 1
      FROM ap a JOIN merges m ON m.rnk = a.r + 1
      WHERE a.r < {_BPE_APPLY_MERGES}
    ), vt AS (
      -- the recursion ends at min(MERGES, available pairs): a degenerate
      -- corpus with fewer than MERGES distinct pairs stops early, so the
      -- terminal is the per-run MAX(r), never a hardcoded depth
      SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_bpe,
             CAST(length(w) AS BIGINT) AS n_char
      FROM ap WHERE r = (SELECT MAX(r) FROM ap)
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.n_occ) AS BIGINT) AS n_words,
           CAST(SUM(dw.n_occ * vt.n_char) AS BIGINT) AS n_char_tokens,
           CAST(SUM(dw.n_occ * vt.n_bpe) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(CAST(SUM(dw.n_occ * vt.n_char) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(SUM(dw.n_occ * vt.n_bpe) AS BIGINT) AS DOUBLE), 6)
             AS compression_ratio
    FROM dw JOIN vt ON dw.w = vt.w
    GROUP BY dw.doc_id
    """,
    doc=(
        f"apply the top-{_BPE_APPLY_MERGES} trained BPE merges to the "
        "corpus (vocabulary-grain chained replaces, zero UDFs) -> per-doc "
        "word/char/BPE token counts + compression ratio"
    ),
)
def bpe_apply_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_tokens(spark, sf_dir)
    # trained merge table: top-K adjacent char pairs in rank order — a
    # bounded (K-row) driver probe, collected once at plan-build time
    ranked = bpe_pair_frequencies(spark, sf_dir).filter(
        F.col("rnk") <= _BPE_APPLY_MERGES
    )
    merges = [r["pair"] for r in sorted(ranked.collect(), key=lambda r: r["rnk"])]

    dw = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("n_occ"))
    vocab = dw.select("w").distinct()
    chars = F.when(F.length("w") == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
    )
    col = F.concat(F.lit(" "), F.concat_ws(" ", chars), F.lit(" "))
    for m in merges:
        pat, rep = F.lit(f" {m[0]} {m[1]} "), F.lit(f" {m} ")
        for _ in range(_BPE_APPLY_PASSES):
            col = F.replace(col, pat, rep)
    vt = vocab.select(
        "w",
        F.size(F.split(F.trim(col), " ")).cast("long").alias("n_bpe"),
        F.length("w").cast("long").alias("n_char"),
    )
    agg = (
        dw.join(vt, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_char")).cast("long").alias(
                "n_char_tokens"
            ),
            F.sum(F.col("n_occ") * F.col("n_bpe")).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_char_tokens",
        "n_bpe_tokens",
        F.round(
            F.col("n_char_tokens").cast("double")
            / F.col("n_bpe_tokens").cast("double"),
            6,
        ).alias("compression_ratio"),
    )

# Edit-distance verification over the LSH candidate pairs — completes the
# dedup family (exact / Jaccard / containment / MinHash / SimHash /
# embedding-cosine) with the CHARACTER-grain measure: token-set metrics
# are blind to within-token edits and reorderings that Levenshtein sees.
# Levenshtein is classic integer DP — bit-identical on both engines — and
# is O(len_a * len_b) per pair, which is exactly why it runs only as a
# pair-local VERIFY over LSH candidates (cost scales with the candidate
# count, never corpus x corpus — the published dedup pattern: cheap
# blocking, expensive verify).
@register(
    "levenshtein_near_dup_verify",
    f"""
    WITH {_sql_lsh_cand_ctes()}
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
           CAST(length(da.text) AS BIGINT) AS len_a,
           CAST(length(db.text) AS BIGINT) AS len_b,
           ROUND(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                 / GREATEST(length(da.text), length(db.text)), 6)
             AS edit_similarity
    FROM cand c
    JOIN documents da ON da.doc_id = c.doc_a
    JOIN documents db ON db.doc_id = c.doc_b
    """,
    doc=(
        "character-grain edit-distance verify over the LSH candidate "
        "pairs (pair-local Levenshtein DP; completes the dedup family)"
    ),
)
def levenshtein_near_dup_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = lsh_candidate_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    j = cand.join(da, "doc_a").join(db, "doc_b")
    dist = F.levenshtein("ta", "tb").cast("long")
    return j.select(
        "doc_a",
        "doc_b",
        dist.alias("edit_distance"),
        F.length("ta").cast("long").alias("len_a"),
        F.length("tb").cast("long").alias("len_b"),
        F.round(
            F.lit(1.0)
            - dist.cast("double") / F.greatest(F.length("ta"), F.length("tb")),
            6,
        ).alias("edit_similarity"),
    )

# --- BPE TRAINING (iterative merge learning; r7) ---------------------------
# bpe_apply_token_counts (above) applies a merge table ranked ONCE from
# character-pair counts; this is the real iterative trainer: each round
# counts adjacent SYMBOL pairs in the CURRENT segmentation (symbols grow as
# merges land) weighted by word frequency, merges the argmax, and
# re-segments — the Sennrich-BPE learning loop. Scale shape: training runs
# at WORD-HISTOGRAM grain (distinct words + corpus counts, Zipf-small vs
# the corpus), each round is one linear pair-count aggregation and the
# argmax is a 1-row TakeOrdered driver probe (K bounded rounds ⇒ K bounded
# probes — the same trained-artifact pattern as the apply query's merge
# table). Cross-engine exactness: both engines re-segment with the
# identical fixed-pass replace chain (left-to-right non-overlap) and the
# identical (count DESC, pair ASC) tiebreak, so the learned table is
# deterministic and hash-comparable.
_BPE_TRAIN_MERGES = 10


def bpe_train(wf: DataFrame, k: int = _BPE_TRAIN_MERGES, passes: int = _BPE_APPLY_PASSES):
    """Learn ``k`` BPE merges from a (w, n) word-frequency frame; returns
    [(rank, pair, merged, count)] — stops early when the vocabulary
    exhausts its pairs (every word fully merged)."""
    chars = F.when(F.length("w") == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
    )
    # length-1 words carry no pairs and never merge — drop them before
    # the loop instead of re-segmenting them K times
    cur = wf.filter(F.length("w") >= 2).select(
        "n", F.concat(F.lit(" "), F.concat_ws(" ", chars), F.lit(" ")).alias("s")
    )
    merges: list[tuple] = []
    for rnk in range(1, k + 1):
        toks = F.split(F.trim("s"), " ")
        # descending-sequence guard: size-1 < 1 would generate a reversed
        # sequence and abort the job on element_at
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            cur.select("n", F.explode(pairs).alias("p"))
            .groupBy("p")
            .agg(F.sum("n").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # degenerate vocabulary: no adjacent pairs left
        pair, cnt = top[0]["p"], int(top[0]["cnt"])
        merged = pair.replace(" ", "")
        merges.append((rnk, pair, merged, cnt))
        col = F.col("s")
        for _ in range(passes):
            col = F.replace(col, F.lit(f" {pair} "), F.lit(f" {merged} "))
        # truncate lineage each round: without this, round r's pair count
        # re-runs all r-1 prior re-segmentations (quadratic in K); the
        # checkpointed state is one vocabulary-sized (n, s) frame
        cur = cur.select("n", col.alias("s")).localCheckpoint(eager=False)
    return merges


def _bpe_train_oracle(k: int, passes: int) -> str:
    """Generate the K-round training loop as nested DuckDB CTEs from the
    SAME constants the Spark trainer loops on, so the two can never
    drift: round r counts pairs over seg{r-1}, picks the (cnt DESC, pair
    ASC) argmax into m{r} (1 row; empty once pairs exhaust, which empties
    every later round and truncates the output), and re-segments into
    seg{r} via the fixed-pass replace chain against the 1-row m{r}."""
    # every seg{r} is read TWICE (p{r+1} and seg{r+1}) — without
    # MATERIALIZED the inlined CTE chain re-evaluates exponentially in K
    ctes = [
        f"""wf AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT doc_id, w FROM (
          SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
        ), UNNEST(ws) AS t(w)
      ) GROUP BY w
    ), seg0 AS MATERIALIZED (
      SELECT n,
             ' ' || array_to_string(
               list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), ' '
             ) || ' ' AS s
      FROM wf WHERE length(w) >= 2
    )"""
    ]
    for r in range(1, k + 1):
        chain = "g.s"
        for _ in range(passes):
            chain = (
                f"replace({chain}, ' ' || m.pair || ' ', ' ' || m.merged || ' ')"
            )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
      SELECT pr AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (
        SELECT n, list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1]) AS prs
        FROM (SELECT n, string_split(trim(s), ' ') AS toks FROM seg{r - 1})
        WHERE len(toks) >= 2
      ), UNNEST(prs) AS u(pr)
      GROUP BY pr
    ), m{r} AS MATERIALIZED (
      SELECT pair, replace(pair, ' ', '') AS merged, cnt
      FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1
    ), seg{r} AS MATERIALIZED (
      SELECT g.n, {chain} AS s FROM seg{r - 1} g, m{r} m
    )"""
        )
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rnk, pair, merged, cnt AS n_occurrences FROM m{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    {unions}"


@register(
    "bpe_train_merges",
    _bpe_train_oracle(_BPE_TRAIN_MERGES, _BPE_APPLY_PASSES),
    doc=(
        f"TRAIN {_BPE_TRAIN_MERGES} BPE merges (iterative Sennrich loop at "
        "word-histogram grain: per-round symbol-pair argmax + fixed-pass "
        "re-segmentation) -> the learned merge table"
    ),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_tokens(spark, sf_dir)
    wf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    merges = bpe_train(wf)
    return spark.createDataFrame(
        merges, "rnk int, pair string, merged string, n_occurrences long"
    )


# Restart-marker JPEG tier (VERDICT r9 ask #5): the same block-constant
# rasters as jpeg_pixel_stats, encoded with a DECLARED RESTART INTERVAL —
# a DRI segment plus RST0..RST7 markers splitting the scan into
# independently-decodable segments with per-segment DC prediction (ITU
# T.81 E.1.4; what libjpeg emits under error-resilience settings, the one
# profile a real-world corpus plausibly hits that the codec previously
# only decoded from hand-composed streams). The interval varies per image
# (1 + id % 4 blocks) so single-block segments, mid-row boundaries and
# the modulo-8 marker wraparound all occur in-fleet; the decoder verifies
# the marker SEQUENCE and raises on missing/out-of-order RSTn
# (tests/test_multimodal.py corrupted-marker cases). The restart layout
# is bit-exact to the plain baseline stream after decode, so the oracle
# is the same block-raster formula.
# operators/multimodal.py::encode_baseline_jpeg(restart_interval=...),
# _RestartWriter, _BitReader.skip_restart.
@register(
    "restart_jpeg_pixel_stats",
    """
    WITH g AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(1 + doc_id * 7 % 48 AS INT) AS width,
             CAST(1 + doc_id * 13 % 48 AS INT) AS height
      FROM documents
    )
    SELECT g.media_id, ANY_VALUE(g.width) AS width,
           ANY_VALUE(g.height) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS BIGINT) AS sum_pixels,
           CAST(MIN((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS min_pixel,
           CAST(MAX((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                AS INT) AS max_pixel,
           ROUND(SUM((11 * (x.x // 8) + 17 * (y.y // 8) + g.media_id) % 256)
                 * 1.0 / COUNT(*), 6) AS mean_pixel
    FROM g,
         UNNEST(range(0, g.width)) AS x(x),
         UNNEST(range(0, g.height)) AS y(y)
    GROUP BY g.media_id
    """,
    doc=(
        "baseline JPEG with DRI/RSTn restart segments (per-segment DC "
        "reset, strict marker-sequence verification) -> per-image raster "
        "stats; decode is bit-exact to the restart-free stream"
    ),
)
def restart_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.multimodal import (
        jpeg_pixel_stats_df,
        synthesize_pixel_restart_jpeg_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = jpeg_pixel_stats_df(synthesize_pixel_restart_jpeg_df(docs, "doc_id"))
    return stats.select(
        "media_id",
        "width",
        "height",
        "n_pixels",
        "sum_pixels",
        "min_pixel",
        "max_pixel",
        F.round(F.col("sum_pixels") * 1.0 / F.col("n_pixels"), 6).alias(
            "mean_pixel"
        ),
    )
