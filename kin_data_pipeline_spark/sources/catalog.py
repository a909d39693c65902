"""Parquet table catalog over the driver testdata layout.

Mirrors the reference's source surface (SURVEY.md §2.1 S1/S2: raw event
scans are plain table reads — ``fact_kin_transaction.sql:9``), expressed as
``spark.read.parquet`` so Catalyst gets predicate pushdown + column pruning
for free. At 100 TB these reads become partitioned-parquet/Delta scans with
partition pruning on the date key; the API here is layout-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def _timestamp_cols(path: str) -> tuple[list[str], list[str]]:
    """Classify parquet timestamp columns from the footer (footer-only read;
    negligible driver cost). Returns (nanos_cols, naive_cols):

    - ``nanos_cols``: TIMESTAMP(NANOS) — Spark's reader rejects them
      outright, so they are read as raw nanosecond longs and rebuilt.
    - ``naive_cols``: no-timezone timestamps Spark would surface as
      TIMESTAMP_NTZ, which breaks LTZ-only operations (epoch casts) and
      varies with the producer. Both classes are normalized to TimestampType
      so the engine's public timestamp semantics don't depend on how the
      upstream writer happened to encode the column."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    schema = pq.read_schema(path)
    nanos = [
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    naive = [
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit != "ns" and f.type.tz is None
    ]
    return nanos, naive

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Lazy: no action is triggered.

    TIMESTAMP(NANOS) parquet columns (e.g. ``events.ts``) are transparently
    converted to TimestampType at microsecond precision — the same
    truncation DuckDB applies, keeping oracle comparisons aligned.
    """
    # Pin UTC even on caller-provided sessions: timestamp→date truncation is
    # session-TZ-dependent and the oracle (DuckDB) is UTC-naive.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols, ntz_cols = _timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz_cols:
        # NTZ→LTZ under the pinned UTC session: identical wall-clock values,
        # but the column supports the full TimestampType surface.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df

# ---------------------------------------------------------------------------
# Session-scoped frame cache.
#
# In production each of these frames is a materialized warehouse table the
# DAG runner (plans/engine.py) writes once per run; when the models are
# instead evaluated ad hoc (driver correctness pass, bench, notebooks) the
# shared substrates — fact scans, price dims, activity observations — would
# be recomputed by every downstream query. `.cache()` + this registry give
# the ad-hoc path the same reuse the warehouse gives the scheduled path.
# Keyed by Spark application id so a fresh session never sees stale frames.

_FRAME_CACHE: dict[tuple, DataFrame] = {}
_FRAME_CACHE_LOCK = __import__("threading").RLock()

def frame_cache_names(spark: SparkSession) -> set:
    """Names of the substrate frames registered for this Spark app — a
    read-only probe so the bench can attribute shared-substrate first-toucher
    costs to the query that triggered each build."""
    app_id = spark.sparkContext.applicationId
    with _FRAME_CACHE_LOCK:
        return {k[1] for k in _FRAME_CACHE if k[0] == app_id}

# Pre-truncation substrate plans, for the plan-fingerprint manifest
# (scripts/gen_plan_manifest.py): a truncate=True frame exposes only a
# LogicalRDD leaf downstream, so fingerprinting a consumer query would be
# blind to changes in the substrate's own logic without this side record.
_FRAME_SOURCE_FRAMES: dict[tuple, DataFrame] = {}

def frame_cache_source_frames(spark: SparkSession) -> dict:
    """name -> the substrate DataFrame as built (BEFORE cache/checkpoint
    wrapping), for this Spark app."""
    app_id = spark.sparkContext.applicationId
    with _FRAME_CACHE_LOCK:
        return {k[1]: df for k, df in _FRAME_SOURCE_FRAMES.items() if k[0] == app_id}

def frame_cache_clear(spark: SparkSession) -> None:
    """Drop this app's substrate registry (fingerprinting only: forces the
    next query build to re-register every substrate it depends on, so the
    dependency inventory is per-query instead of first-toucher-order)."""
    app_id = spark.sparkContext.applicationId
    with _FRAME_CACHE_LOCK:
        for k in [k for k in _FRAME_CACHE if k[0] == app_id]:
            del _FRAME_CACHE[k]
        for k in [k for k in _FRAME_SOURCE_FRAMES if k[0] == app_id]:
            del _FRAME_SOURCE_FRAMES[k]

def frame_cached(
    spark: SparkSession, name: str, *key, build, truncate: bool = False
) -> DataFrame:
    """Build-once, cache, and reuse a DataFrame within one Spark app.
    Lock-guarded so concurrent DAG materialization (Runner.run_concurrent)
    never double-builds a shared substrate frame. Reentrant: substrate
    builders call other cached builders inside their ``build`` closure.

    ``truncate=True`` cuts the logical lineage at the substrate boundary
    (``localCheckpoint`` instead of ``cache``): a ``.cache()`` frame keeps
    its full logical plan, so EVERY downstream action re-runs Catalyst
    analysis over the whole upstream tree even though execution hits the
    InMemoryRelation — for deep chains (the KRE payout cascade) that
    re-analysis costs seconds per consumer query. Checkpointing replaces
    the plan with a LogicalRDD, so consumers plan against a leaf. Use it
    for small, many-consumer substrates (day/app grain); keep ``cache``
    for wide frames where losing size statistics could demote a broadcast.
    Lazy (``eager=False``): the first toucher pays materialization, same
    billing as the cache path."""
    k = (spark.sparkContext.applicationId, name, *key)
    with _FRAME_CACHE_LOCK:
        if k not in _FRAME_CACHE:
            # purge entries from STOPPED applications on insert: stale appId
            # keys are unreachable forever (the key embeds the appId) but
            # would pin their DataFrames + dead-JVM references for the
            # process lifetime in a long-lived host (test suite, notebook)
            stale = [sk for sk in _FRAME_CACHE if sk[0] != k[0]]
            for sk in stale:
                del _FRAME_CACHE[sk]
                _FRAME_SOURCE_FRAMES.pop(sk, None)
            built = build()
            _FRAME_SOURCE_FRAMES[k] = built
            _FRAME_CACHE[k] = (
                built.localCheckpoint(eager=False) if truncate else built.cache()
            )
        return _FRAME_CACHE[k]

def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}

def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
