"""Structured Streaming operators — a strict superset of the reference's
batch cadence (SURVEY.md §2.9: the reference emits only closed days and
reprocesses late data by delete+refill; a 1-day watermark + tumbling daily
window is the streaming-native equivalent of that complete-day guard).

All builders return unstarted streaming DataFrames; callers pick the sink
(`writeStream` with a checkpoint dir in production, `memory` sink in tests).
At scale these run with the same partitioning discipline as the batch path:
aggregations shuffle on (window, key), state is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events_from_parquet(
    spark: SparkSession, sf_dir: str, schema=None, staging: str | None = None
) -> DataFrame:
    """File-source stream over the testdata events layout.

    ``maxFilesPerTrigger=1`` gives deterministic micro-batches in tests;
    production would point at an arriving-files directory or Kafka.
    Pass ``staging`` to pin the source directory across restarts — a
    checkpoint binds the file-source path, so resuming a query requires
    the same directory it started from.
    """
    import os
    import tempfile

    import pyarrow.parquet as pq

    # Pin UTC like the batch twin (sources.catalog.load_table): windowing
    # and w.start→date casts are session-TZ-dependent, and the DuckDB
    # oracles are UTC-naive — an unpinned caller session would shift every
    # day window by its TZ offset.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # absolute: the symlink target is resolved relative to the STAGING
    # dir, so a caller-relative sf_dir would create a broken link and the
    # file source would silently stream ZERO rows (caught by the round-7
    # sf1 sweep, which passed `.scratch/sf1`)
    path = os.path.abspath(f"{sf_dir}/events.parquet")
    # The file source wants a directory of arriving files; expose the single
    # testdata file through a symlinked staging dir (production points at a
    # real landing directory or Kafka instead).
    if staging is None:
        staging = tempfile.mkdtemp(prefix="stream_events_")
    os.makedirs(staging, exist_ok=True)
    link = os.path.join(staging, "events.parquet")
    # lexists, not exists: a broken symlink must be detected (exists follows
    # the link). ANY stale entry — a link to a different corpus, OR a
    # non-symlink file/dir someone copied in — is replaced rather than
    # silently streamed as old/wrong data.
    if os.path.lexists(link):
        if not os.path.islink(link):
            import shutil

            (shutil.rmtree if os.path.isdir(link) else os.remove)(link)
            os.symlink(path, link)
        elif os.readlink(link) != path:
            os.remove(link)
            os.symlink(path, link)
    else:
        os.symlink(path, link)
    # Map timestamp columns by their physical unit from the footer: millis
    # and micros are read natively as TimestampType; nanos have no Spark
    # equivalent and the reader only permits the read-as-LONG carve-out for
    # them (spark.sql.legacy.parquet.nanosAsLong), so they are rebuilt from
    # raw longs. Assuming one unit breaks silently when the producer changes
    # resolution (every row lands in one window). The footer probe runs even
    # for caller-supplied schemas: a ns column the caller reads as LONG is
    # still rebuilt into a timestamp (declaring it anything else is the
    # caller taking over unit conversion explicitly).
    from kin_data_pipeline_spark.sources.catalog import _timestamp_cols

    arrow = pq.read_schema(path)
    # ONE authoritative footer probe (shared with the batch reader) — a
    # second local copy of the ns-column classification would drift
    ns_cols, _ = _timestamp_cols(path)
    nanos: list[str] = []
    if schema is None:
        # explicit arrow→Spark type map, raising on anything unmapped: a
        # silent STRING fallback would mistype int32/date/decimal columns
        # and make streaming answers diverge from the batch read of the
        # same file ('10' < '9', concatenating sums) with no error
        scalar_map = {
            "int8": "TINYINT",
            "int16": "SMALLINT",
            "int32": "INT",
            "int64": "LONG",
            "float": "FLOAT",
            "double": "DOUBLE",
            "bool": "BOOLEAN",
            "string": "STRING",
            "large_string": "STRING",
            "binary": "BINARY",
            "large_binary": "BINARY",
            "date32[day]": "DATE",
        }
        fields = []
        for f in arrow:
            t = str(f.type)
            if t.startswith("timestamp"):
                if f.name in ns_cols:
                    fields.append(f"`{f.name}` LONG")
                    nanos.append(f.name)
                else:
                    fields.append(f"`{f.name}` TIMESTAMP")
            elif t.startswith("decimal128(") or t.startswith("decimal("):
                fields.append(f"`{f.name}` DECIMAL{t[t.index('('):]}")
            elif t in scalar_map:
                fields.append(f"`{f.name}` {scalar_map[t]}")
            else:
                raise ValueError(
                    f"stream_events_from_parquet cannot infer a Spark type "
                    f"for column {f.name!r} ({t}); pass an explicit schema"
                )
        schema = ", ".join(fields)
    elif ns_cols:
        from pyspark.sql.types import LongType, StructType

        declared = (
            schema
            if isinstance(schema, StructType)
            else spark.createDataFrame([], schema).schema
        )
        nanos = [
            c
            for c in ns_cols
            if c in declared.fieldNames()
            and isinstance(declared[c].dataType, LongType)
        ]
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    for name in nanos:
        df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    return df

def daily_rollup_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day windowed aggregation with late-data watermark — the
    streaming form of the reference's complete-day batch rollup
    (fact_kin_transaction.sql:11 + daily models)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").cast("date").alias("date_key"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )

def running_balance_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    value_type: str = "DOUBLE",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running balance + event count, carried in explicit GroupState across
    micro-batches (the arbitrary-stateful tier beyond watermarked windows —
    what ``sum`` can't express once the update rule stops being algebraic).

    Emits one row per key per micro-batch in ``update`` mode. State is one
    (value, long) pair per key — bounded by key cardinality, not stream
    length; at 100 TB the state store shards with the shuffle partitioning
    on ``key_col``. Pass ``value_type="LONG"`` with a pre-quantized integer
    value column (e.g. cents) for an exactly-summed, order-independent
    balance — the form whose converged result is oracle-comparable.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    integral = value_type.upper() in ("LONG", "BIGINT", "INT", "INTEGER")
    # the key's output type follows the INPUT frame — hardcoding LONG would
    # reject (or corrupt) string keys like the kin wallet ids
    key_type = dict(events.dtypes)[key_col]
    out_schema = f"`{key_col}` {key_type}, balance {value_type}, n_events LONG"
    state_schema = f"balance {value_type}, n_events LONG"

    def update(key, pdfs, state: GroupState):
        bal, n = state.get if state.exists else (0 if integral else 0.0, 0)
        for pdf in pdfs:
            s = pdf[value_col].sum()
            bal += int(s) if integral else float(s)
            n += len(pdf)
        state.update((bal, n))
        yield pd.DataFrame({key_col: [key[0]], "balance": [bal], "n_events": [n]})

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Session-window aggregation (gap-based) per user — the stateful
    streaming operator family the reference lacks entirely; included as part
    of the beyond-reference surface."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )

def purchase_view_join_stream(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """Stream-stream inner join: each purchase paired with the same user's
    views from the preceding ``lookback`` — the attribution-join shape, on
    the streaming tier (both sides watermarked; state for the view side is
    bounded by watermark + lookback, the purchase side by the watermark).
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") < F.col("p_ts"))
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id"), "p_ts", "v_ts"
    )

def purchase_view_left_join_stream(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "0 seconds"
) -> DataFrame:
    """Stream-stream LEFT OUTER attribution join — the missing-match
    semantics of the inner form above: purchases with NO qualifying prior
    view emit once the watermark proves no future view can match
    (v_ts < p_ts and watermark has passed p_ts). State stays bounded
    exactly as in the inner join; the outer rows are emitted from evicted
    left-side state, so a finite run's NULL set is the watermark-closed
    prefix of the stream — the oracle applies the same horizon."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") < F.col("p_ts"))
    )
    return purchases.join(views, cond, "leftOuter").select(
        "purchase_id", "view_id", F.col("p_user").alias("user_id"), "p_ts", "v_ts"
    )
