"""Kin-shaped source projection over the driver testdata (FIXTURES.md §4).

The reference consumes raw Solana event feeds (``raw_kintransaction``,
``raw_kincreateaccount``) plus seeded dimensions (``dim_kin_app``,
``dim_kin_price``). The driver provides only TPC-H-ish tables, so this
module derives deterministic Kin-shaped frames from ``events`` / ``nation``
with pure column arithmetic — every projection exists twice, as a Spark
builder AND as a DuckDB SQL CTE, value-identical, so Kin model queries can
be oracle-checked end-to-end.

Schema mirrors FIXTURES.md §1–§2 (inferred from
``fact_kin_transaction.sql:3-50`` / ``fact_kin_creations.sql:3-53`` /
``external_endpoint_data_seed.py:84-156``): sentinel ``'<NA>'`` types,
nullable amounts/appindex, ~1% duplicate ids, an Agora-style fee payer,
quark (1e-5 Kin) integer amounts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kin_data_pipeline_spark.sources.catalog import frame_cached, load_table

AGORA_FEE_PAYER = "AgoraFeePayer11111"
QUARKS_PER_KIN = 100_000
LAMPORTS_PER_SOL = 1_000_000_000

# ---------------------------------------------------------------------------
# raw_kintransaction: one row per transfer instruction, ~1% duplicated rows.

def raw_kintransaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    base = ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("ts").alias("date"),
        F.unix_timestamp("ts").alias("timestamp"),
        F.expr("event_id div 10").alias("block"),
        F.concat(F.lit("tx"), F.expr("event_id div 3").cast("string")).alias(
            "transactionid"
        ),
        (F.col("event_id") % 3).cast("int").alias("instructionidx"),
        F.when(F.col("k") % 11 == 0, F.lit(None))
        .otherwise(
            (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            * ((F.col("k") + 1) * (F.col("k") + 1))
        )
        .alias("amount"),
        F.concat(F.lit("m"), (F.col("k") % 4).cast("string")).alias("memo"),
        F.concat(F.lit("w"), F.col("user_id").cast("string")).alias("fromaccount"),
        F.concat(
            F.lit("w"), ((F.col("user_id") * 7 + F.col("k")) % 40).cast("string")
        ).alias("toaccount"),
        F.when(F.col("k") % 13 == 0, F.lit(None))
        .when(F.col("k") % 17 == 0, F.lit(0).cast("long"))  # emptied wallets
        .otherwise(
            (F.col("value").cast("decimal(18,2)") * 100000).cast("long")
            * ((F.col("k") % 5) + 1)
        )
        .alias("fromaccountbalance"),
        (
            (F.col("value").cast("decimal(18,2)") * 100000).cast("long")
            * ((F.col("k") % 7) + 1)
        ).alias("toaccountbalance"),
        ((F.col("k") % 3) * 5000).alias("fee"),
        F.when(F.col("k") % 7 == 0, F.lit(AGORA_FEE_PAYER))
        .otherwise(F.concat(F.lit("fp"), (F.col("user_id") % 5).cast("string")))
        .alias("feepayer"),
        F.when(F.col("k") % 5 == 0, F.lit(None))
        .otherwise((F.col("user_id") % 20).cast("int"))
        .alias("appindex"),
        F.when(F.col("k") % 4 == 0, F.lit("1"))
        .when(F.col("k") % 4 == 1, F.lit("2"))
        .when(F.col("k") % 4 == 2, F.lit("3"))
        .otherwise(F.lit("<NA>"))
        .alias("transactiontype"),
        F.when(F.col("event_type") == "error", F.lit("Failed"))
        .otherwise(F.lit("Ok"))
        .alias("status"),
        F.col("event_id").alias("_eid"),
    )
    dups = base.filter(F.col("_eid") % 97 == 0)
    return base.unionByName(dups).drop("_eid")

RAW_KINTRANSACTION_SQL = """
raw_kintransaction AS (
  WITH ev AS (
    SELECT *, CAST(props->>'$.k' AS BIGINT) AS k FROM events
  ), base AS (
    SELECT
      CAST(event_id AS VARCHAR) AS id,
      ts AS date,
      CAST(floor(epoch(ts)) AS BIGINT) AS timestamp,
      event_id // 10 AS block,
      'tx' || CAST(event_id // 3 AS VARCHAR) AS transactionid,
      CAST(event_id % 3 AS INT) AS instructionidx,
      CASE WHEN k % 11 = 0 THEN NULL
           ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * ((k + 1) * (k + 1))
      END AS amount,
      'm' || CAST(k % 4 AS VARCHAR) AS memo,
      'w' || CAST(user_id AS VARCHAR) AS fromaccount,
      'w' || CAST((user_id * 7 + k) % 40 AS VARCHAR) AS toaccount,
      CASE WHEN k % 13 = 0 THEN NULL
           WHEN k % 17 = 0 THEN 0
           ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100000 AS BIGINT) * ((k % 5) + 1)
      END AS fromaccountbalance,
      CAST(CAST(value AS DECIMAL(18,2)) * 100000 AS BIGINT) * ((k % 7) + 1) AS toaccountbalance,
      (k % 3) * 5000 AS fee,
      CASE WHEN k % 7 = 0 THEN 'AgoraFeePayer11111'
           ELSE 'fp' || CAST(user_id % 5 AS VARCHAR) END AS feepayer,
      CASE WHEN k % 5 = 0 THEN NULL ELSE CAST(user_id % 20 AS INT) END AS appindex,
      CASE WHEN k % 4 = 0 THEN '1' WHEN k % 4 = 1 THEN '2'
           WHEN k % 4 = 2 THEN '3' ELSE '<NA>' END AS transactiontype,
      CASE WHEN event_type = 'error' THEN 'Failed' ELSE 'Ok' END AS status,
      event_id AS _eid
    FROM ev
  )
  SELECT * EXCLUDE (_eid) FROM base
  UNION ALL
  SELECT * EXCLUDE (_eid) FROM base WHERE _eid % 97 = 0
)
"""

# ---------------------------------------------------------------------------
# raw_kincreateaccount: one row per account-creation instruction.

def raw_kincreateaccount(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
    )
    base = ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("ts").alias("date"),
        F.unix_timestamp("ts").alias("timestamp"),
        F.concat(F.lit("p"), (F.col("k") % 3).cast("string")).alias("program_id"),
        F.expr("event_id div 10").alias("block"),
        # 4-id blocks per transaction → multi-instruction creates occur
        F.concat(F.lit("ctx"), F.expr("event_id div 4").cast("string")).alias("tx_id"),
        (F.col("event_id") % 4).cast("int").alias("instr_idx"),
        F.concat(
            F.lit("w"), ((F.col("user_id") * 3 + F.col("k")) % 40).cast("string")
        ).alias("account_id"),
        F.concat(F.lit("o"), F.col("user_id").cast("string")).alias("account_owner"),
        F.concat(F.lit("m"), (F.col("k") % 4).cast("string")).alias("memo"),
        # close authority is optional on-chain (fact_kin_creations.sql:31)
        F.when(F.col("k") % 6 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("auth"), (F.col("k") % 4).cast("string")))
        .alias("close_account_authority"),
        F.lit("kinmint1").alias("mint"),
        F.when(F.col("k") % 2 == 0, F.lit(None))
        .otherwise(
            F.concat(F.lit("tx"), F.expr("event_id div 3").cast("string"))
        )
        .alias("source_transfer"),
        (
            (F.col("value").cast("decimal(18,2)") * 100000).cast("long")
            * ((F.col("k") % 3) + 1)
        ).alias("balance"),
        ((F.col("k") % 2) * 5000).alias("fee"),
        F.lit(2039280).alias("create_fee"),
        # fee payer is per-transaction (all instructions of a tx share it)
        F.when(F.expr("event_id div 4") % 5 == 0, F.lit(AGORA_FEE_PAYER))
        .otherwise(F.concat(F.lit("fp"), (F.col("user_id") % 5).cast("string")))
        .alias("fee_payer"),
        F.when(F.col("k") % 5 == 0, F.lit(None))
        .otherwise((F.col("user_id") % 20).cast("int"))
        .alias("appindex"),
        F.when(F.col("k") % 4 == 0, F.lit("1"))
        .when(F.col("k") % 4 == 1, F.lit("2"))
        .when(F.col("k") % 4 == 2, F.lit("3"))
        .otherwise(F.lit("<NA>"))
        .alias("transactiontype"),
        F.lit("Ok").alias("status"),
        F.lit("1").alias("version"),
        F.col("event_id").alias("_eid"),
    )
    dups = base.filter(F.col("_eid") % 53 == 0)
    return base.unionByName(dups).drop("_eid")

RAW_KINCREATEACCOUNT_SQL = """
raw_kincreateaccount AS (
  WITH ev AS (
    SELECT *, CAST(props->>'$.k' AS BIGINT) AS k FROM events
    WHERE event_type = 'signup'
  ), base AS (
    SELECT
      CAST(event_id AS VARCHAR) AS id,
      ts AS date,
      CAST(floor(epoch(ts)) AS BIGINT) AS timestamp,
      'p' || CAST(k % 3 AS VARCHAR) AS program_id,
      event_id // 10 AS block,
      'ctx' || CAST(event_id // 4 AS VARCHAR) AS tx_id,
      CAST(event_id % 4 AS INT) AS instr_idx,
      'w' || CAST((user_id * 3 + k) % 40 AS VARCHAR) AS account_id,
      'o' || CAST(user_id AS VARCHAR) AS account_owner,
      'm' || CAST(k % 4 AS VARCHAR) AS memo,
      CASE WHEN k % 6 = 0 THEN NULL
           ELSE 'auth' || CAST(k % 4 AS VARCHAR) END AS close_account_authority,
      'kinmint1' AS mint,
      CASE WHEN k % 2 = 0 THEN NULL
           ELSE 'tx' || CAST(event_id // 3 AS VARCHAR) END AS source_transfer,
      CAST(CAST(value AS DECIMAL(18,2)) * 100000 AS BIGINT) * ((k % 3) + 1) AS balance,
      (k % 2) * 5000 AS fee,
      2039280 AS create_fee,
      CASE WHEN (event_id // 4) % 5 = 0 THEN 'AgoraFeePayer11111'
           ELSE 'fp' || CAST(user_id % 5 AS VARCHAR) END AS fee_payer,
      CASE WHEN k % 5 = 0 THEN NULL ELSE CAST(user_id % 20 AS INT) END AS appindex,
      CASE WHEN k % 4 = 0 THEN '1' WHEN k % 4 = 1 THEN '2'
           WHEN k % 4 = 2 THEN '3' ELSE '<NA>' END AS transactiontype,
      'Ok' AS status,
      '1' AS version,
      event_id AS _eid
    FROM ev
  )
  SELECT * EXCLUDE (_eid) FROM base
  UNION ALL
  SELECT * EXCLUDE (_eid) FROM base WHERE _eid % 53 = 0
)
"""

# ---------------------------------------------------------------------------
# dim_kin_app: app registry (REST-seed analog, external_endpoint_data_seed.py:144-149).

def dim_kin_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_cached(
        spark, "dim_kin_app", sf_dir, build=lambda: _dim_kin_app(spark, sf_dir)
    )

def _dim_kin_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").cast("int").alias("id"),
        F.col("n_name").alias("name"),
        F.lit("live").alias("status"),
        F.concat(F.lit("w"), F.col("n_nationkey").cast("string")).alias(
            "public_wallet"
        ),
        F.lit("2024-01-01").cast("date").alias("created_date"),
        F.lit(None).cast("date").alias("updated_date"),
    )

DIM_KIN_APP_SQL = """
dim_kin_app AS (
  SELECT CAST(n_nationkey AS INT) AS id, n_name AS name, 'live' AS status,
         'w' || CAST(n_nationkey AS VARCHAR) AS public_wallet,
         DATE '2024-01-01' AS created_date, CAST(NULL AS DATE) AS updated_date
  FROM nation
)
"""

# ---------------------------------------------------------------------------
# dim_kin_price: daily market series in integer cents (CoinGecko analog,
# external_endpoint_data_seed.py:84-118). Integer cents keep every
# downstream aggregate exact.

def dim_kin_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cached: a full-events aggregation feeding volatility/market/summary
    # marts — one scan per session instead of one per downstream model.
    return frame_cached(
        spark, "dim_kin_price", sf_dir, build=lambda: _dim_kin_price(spark, sf_dir)
    )

def _dim_kin_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return ev.groupBy(F.to_date("ts").alias("date_key")).agg(
        F.max(cents).alias("price_cents"),
        F.sum(cents).cast("long").alias("volume_cents"),
        # market_caps analog (the reference dim carries CoinGecko
        # prices/market_caps/total_volumes, external_endpoint_data_seed.py):
        # cap = price × synthetic supply (the day's event count), so
        # cap / price recovers an exact integer circulating supply.
        (F.max(cents) * F.count(F.lit(1))).cast("long").alias("market_cap_cents"),
    )

DIM_KIN_PRICE_SQL = """
dim_kin_price AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS date_key,
         MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS price_cents,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS volume_cents,
         CAST(MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) * COUNT(*) AS BIGINT) AS market_cap_cents
  FROM events GROUP BY 1
)
"""

# ---------------------------------------------------------------------------
# dim_solana_price: daily SOL market series in integer cents (the reference's
# second price feed, kin_data/daily_models/api/daily_account_summary_by_app.sql
# joins dim_solana_price). MIN (vs the Kin dim's MAX) keeps the two series
# distinct while staying deterministic.

def dim_solana_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_cached(
        spark,
        "dim_solana_price",
        sf_dir,
        build=lambda: _dim_solana_price(spark, sf_dir),
    )

def _dim_solana_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("date_key")).agg(
        F.min((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias(
            "sol_price_cents"
        )
    )

DIM_SOLANA_PRICE_SQL = """
dim_solana_price AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS date_key,
         MIN(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sol_price_cents
  FROM events GROUP BY 1
)
"""
