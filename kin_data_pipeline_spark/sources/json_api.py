"""REST/JSON dimension seeding (SURVEY.md §2.1 S3, §3 E2).

The reference pulls an app registry over HTTP and flattens the JSON payload
inside Snowflake (``external_endpoint_data_seed.py:46-71``:
``PARSE_JSON($$…$$) → TABLE(flatten(…)) → value:field``). Here the payload
(a string — tests feed fixtures, production feeds ``requests.get().text``)
is parsed with ``from_json`` + ``explode``; no driver-side row loops, so a
multi-MB payload still lands as a single-task parse while anything larger
should arrive via ``spark.read.json`` on files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

APP_PAYLOAD_SCHEMA = ArrayType(
    StructType(
        [
            StructField("index", IntegerType()),
            StructField("name", StringType()),
            StructField("status", StringType()),
            StructField("public_wallet", StringType()),
        ]
    )
)

def dim_from_json_payload(
    spark: SparkSession, payload: str, run_date
) -> DataFrame:
    """Flatten a JSON array payload into the ``dim_kin_app`` shape
    (external_endpoint_data_seed.py:144-149: id, name, status,
    public_wallet, created_date, updated_date).

    Malformed payloads raise: ``from_json`` returns NULL for unparseable
    input (an HTML error page, a truncated response) and ``explode(NULL)``
    emits zero rows — which would SILENTLY seed an empty dim and drop
    every downstream join row. The reference's PARSE_JSON errors on
    malformed input; this mirrors that with a driver-side parse check
    (the payload is one bounded API response, not distributed data).
    """
    import json as _json

    try:
        parsed = _json.loads(payload)
    except (ValueError, TypeError) as exc:
        raise ValueError(f"dim payload is not valid JSON: {exc}") from exc
    if not isinstance(parsed, list):
        raise ValueError(
            f"dim payload must be a JSON array, got {type(parsed).__name__}"
        )
    raw = spark.createDataFrame([(payload,)], "payload string")
    exploded = raw.select(
        F.explode(F.from_json("payload", APP_PAYLOAD_SCHEMA)).alias("value")
    )
    return exploded.select(
        F.col("value.index").alias("id"),
        # trim(value:name, '"') — the reference strips stray quotes (:148)
        F.regexp_replace(F.col("value.name"), '^"|"$', "").alias("name"),
        F.col("value.status").alias("status"),
        F.col("value.public_wallet").alias("public_wallet"),
        F.lit(run_date).cast("date").alias("created_date"),
        F.lit(None).cast("date").alias("updated_date"),
    )

def timeseries_from_records(
    spark: SparkSession, records: list[dict], run_date
) -> DataFrame:
    """CoinGecko-style market chart → daily dim
    (external_endpoint_data_seed.py:84-118): ms-epoch rows keyed per metric,
    merged on timestamp, ``date_key = day(ts) − 1``, in-progress day dropped.
    """
    df = spark.createDataFrame(
        records, "timestamp long, prices double, market_caps double, total_volumes double"
    )
    out = df.withColumn(
        "date_key",
        F.date_sub(F.to_date(F.timestamp_millis(F.col("timestamp"))), 1),
    )
    # drop the in-progress day (reference drops the max-timestamp row, :110-111)
    return out.filter(F.col("date_key") < F.lit(run_date))
