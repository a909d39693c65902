"""Relational operator queries (SURVEY.md §2.2–§2.8) over the testdata tables.

Every query exercises one operator family from the reference inventory,
re-expressed Spark-first, with a DuckDB oracle. Reference citations sit on
each query (paths relative to /root/reference/kin-data-pipeline/).

Determinism conventions (so the value-hash matches the oracle):
- money/value sums go through DECIMAL(18,2) internally → exact &
  aggregation-order-free — but the FINAL projected column is cast to DOUBLE
  on BOTH sides: the driver canonicalizes results float-style, so a DECIMAL
  terminal ('100523.00' vs '100523.0') can never hash-match. Decimal→double
  is correctly rounded on both engines for unscaled values < 2^53, which
  every sum here satisfies by orders of magnitude.
- day grain is DATE on both sides
- unavoidable double outputs are ROUND(x, 6)
- every computed column is aliased identically in Spark and SQL
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kin_data_pipeline_spark.functions.compat import (
    bucketize,
    date_trunc_month,
    date_trunc_week,
)
from kin_data_pipeline_spark.operators.rangejoin import (
    asof_join,
    forward_inactivity_anti,
    trailing_distinct_count,
    trailing_window_agg,
)
from kin_data_pipeline_spark.operators.relational import (
    anti_join,
    argmax_rows,
    semi_join,
    top_k_per_group,
    union_dedup,
    unpivot_roles,
)
from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

DEC = "decimal(18,2)"
DECW = "decimal(38,2)"

def _dec_sum(col, alias):
    """Exact decimal aggregation, published as DOUBLE (terminal column)."""
    return F.sum(F.col(col).cast(DEC)).cast("double").alias(alias)

def _dec_sum_internal(col, alias):
    """Exact decimal aggregation kept DECIMAL for further exact math
    (window sums, rank keys); cast the final projection to double."""
    return F.sum(F.col(col).cast(DEC)).cast(DECW).alias(alias)

# ---------------------------------------------------------------------------
# A1/A3/P3: TPC-H Q1-style pricing summary — scan → filter → hash agg.
# Mirrors the reference's daily summary aggregations (daily_kin_transactions.sql:2-17).
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(date_trunc('day', l_shipdate) AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="hash aggregation with decimal sums + complete-day filter (P3/A1/A3)",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            # Cast each factor to decimal BEFORE multiplying: the product is
            # then exact (scale 4) and the sum is order-independent. Casting
            # the double product directly drifts at half-cent boundaries
            # (DuckDB rounds the shortest decimal repr, the JVM rounds the
            # exact binary expansion).
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

# A1 at day grain — the fact-table daily rollup (fact_kin_transaction.sql:20).
@register(
    "daily_order_revenue",
    """
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    doc="daily-grain rollup (A1, date_trunc day)",
)
def daily_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue"))
    )

# date_trunc('week') — Monday-start parity pin (weekly_kin_transactions.sql:4).
@register(
    "weekly_order_revenue",
    """
    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    doc="weekly rollup; pins Monday week-start compatibility (§1.4)",
)
def weekly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(date_trunc_week("o_orderdate").alias("week"))
        .agg(F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue"))
    )

# date_trunc('month') (monthly_kin_transactions.sql:4).
@register(
    "monthly_order_revenue",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    doc="monthly rollup (A1)",
)
def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(date_trunc_month("o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue"))
    )

# A2: exact count(distinct) per day — active accounts (daily_active_accounts_app.sql:17).
@register(
    "daily_active_users",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    doc="count(distinct) daily actives (A2)",
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

# A4: exact median (daily_kin_transactions.sql:29,47,65).
@register(
    "median_value_by_type",
    """
    SELECT event_type,
           ROUND(MEDIAN(value), 6) AS median_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="exact interpolated median (A4)",
)
def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.median("value"), 6).alias("median_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )

# W1/W2/O2: dense_rank top-k per group (weekly_kre_payout_summary.sql:9,32).
@register(
    "top_customers_per_nation",
    """
    WITH rev AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey
    )
    SELECT * FROM (
      SELECT n.n_name, c.c_custkey, r.revenue,
             CAST(DENSE_RANK() OVER (PARTITION BY n.n_name ORDER BY r.revenue DESC, c.c_custkey ASC) AS INT) AS rnk
      FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rnk <= 5
    """,
    doc="per-group top-k via rank window + broadcast dim joins (W2/O2/J2)",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(_dec_sum("o_totalprice", "revenue"))
    joined = rev.join(
        F.broadcast(customer), rev.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return top_k_per_group(
        joined.select("n_name", "c_custkey", "revenue"),
        partition_by=["n_name"],
        order_by=[F.desc("revenue"), F.asc("c_custkey")],
        k=5,
        rank_col="rnk",
        keep_rank=True,
    ).withColumn("rnk", F.col("rnk").cast("int"))

# W3/O3: rank=1 argmax — latest row per key (multi_create_impacted_accounts.sql:27,42).
@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, value, ts AS event_ts FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="argmax per key via rank=1 (W3/O3)",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return argmax_rows(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "event_type", "value", F.col("ts").alias("event_ts"))

# U1: bare UNION = union + dedup (closing_account_balance_per_day.sql:32-53).
@register(
    "purchase_or_click_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
    doc="Snowflake bare-UNION dedup semantics (U1)",
)
def purchase_or_click_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return union_dedup(
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        ev.filter(F.col("event_type") == "click").select("user_id"),
    )

# U2 + J6: UNION ALL via the OR-join unpivot rewrite (average_account_balance_per_day.sql:22-34,
# closing_account_balance_per_day.sql:79-84) — entity appears in two roles.
@register(
    "entity_role_activity",
    """
    SELECT role, entity_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM (
      SELECT 'part' AS role, l_partkey AS entity_id, l_quantity FROM lineitem
      UNION ALL
      SELECT 'supplier' AS role, l_suppkey AS entity_id, l_quantity FROM lineitem
    ) GROUP BY role, entity_id
    """,
    doc="UNION ALL role stack replacing an OR-join (U2/J6 rewrite)",
)
def entity_role_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stacked = unpivot_roles(
        li,
        role_cols={"part": "l_partkey", "supplier": "l_suppkey"},
        carry_cols=["l_quantity"],
    )
    return stacked.groupBy("role", "entity_id").agg(
        F.count(F.lit(1)).alias("n_rows"), _dec_sum("l_quantity", "total_qty")
    )

# J2: left-outer dim enrichment chain, broadcast (daily_kin_transactions.sql:93-99).
@register(
    "revenue_by_region",
    """
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="broadcast left-join dim enrichment chain (J2)",
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue"))
    )

# J3: composite-key equi-join of two aggregates (daily_kin_transactions.sql:93-98).
@register(
    "user_day_purchase_vs_activity",
    """
    WITH p AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), a AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT p.day, p.user_id, p.purchase_value, a.n_events
    FROM p JOIN a ON p.day = a.day AND p.user_id = a.user_id
    """,
    doc="multi-key (date, entity) equi-join of sibling aggregates (J3)",
)
def user_day_purchase_vs_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("day", "user_id")
        .agg(_dec_sum("value", "purchase_value"))
    )
    a = ev.groupBy("day", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return p.join(a, ["day", "user_id"], "inner")

# J8: IN (subquery) → left-semi join (multi_create_impacted_accounts.sql:17).
@register(
    "lineitems_of_big_orders",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY l_returnflag
    """,
    doc="semi join from IN-subquery (J8)",
)
def lineitems_of_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        semi_join(li, big, ["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"), _dec_sum("l_quantity", "sum_qty"))
    )

# J9: NOT IN (subquery) → left-anti join (monthly_inactive_wallets.sql:31).
@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_nationkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="anti join from NOT IN (J9; non-null keys per §1.4)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(c, o, ["c_custkey"]).select("c_custkey", "c_name", "c_nationkey")

# A7: HAVING (multi_create_impacted_accounts.sql:5-10).
@register(
    "multi_item_orders",
    """
    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5
    """,
    doc="group-having filter (A7)",
)
def multi_item_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"), _dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("n_items") >= 5)
    )

# P8: CASE bucketing histogram (daily_kin_transaction_counts_by_amount.sql:5-13).
@register(
    "order_value_buckets",
    """
    SELECT CASE WHEN o_totalprice <= 1000 THEN '0-1k'
                WHEN o_totalprice <= 10000 THEN '1k-10k'
                WHEN o_totalprice <= 50000 THEN '10k-50k'
                WHEN o_totalprice <= 100000 THEN '50k-100k'
                WHEN o_totalprice <= 200000 THEN '100k-200k'
                ELSE '200k+' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    doc="CASE-expression histogram bucketing (P8)",
)
def order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket",
            bucketize(
                "o_totalprice",
                [1000, 10000, 50000, 100000, 200000],
                ["0-1k", "1k-10k", "10k-50k", "50k-100k", "100k-200k", "200k+"],
            ),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue"))
    )

# A9: segmented single-pass conditional aggregation (daily_kin_transactions.sql:2-99
# fused per §2.4 A9 — 4 filtered CTEs + join become one pass).
@register(
    "daily_event_segments",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'signup' THEN user_id END) AS BIGINT) AS n_signup_users
    FROM events GROUP BY 1
    """,
    doc="per-segment metrics in ONE aggregation pass (A9 fusion)",
)
def daily_event_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(is_type("purchase"), F.col("value").cast(DEC)))
        .cast("double")
        .alias("purchase_value"),
        F.count(F.when(is_type("click"), F.lit(1))).alias("n_clicks"),
        F.count(F.when(is_type("error"), F.lit(1))).alias("n_errors"),
        F.countDistinct(F.when(is_type("signup"), F.col("user_id"))).alias(
            "n_signup_users"
        ),
    )

# S3-analog: JSON field extraction from a string payload column
# (external_endpoint_data_seed.py:57 PARSE_JSON → field access).
@register(
    "props_json_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
           ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
    doc="semi-structured JSON extraction + agg (S3 flatten analog)",
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return ev.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
    )

# P7/P9: sentinel → NULL normalization + coalesce default (fact_kin_transaction.sql:44-47).
@register(
    "returnflag_normalized",
    """
    SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'UNKNOWN') AS flag,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
    doc="sentinel normalization + null default (P7/P9)",
)
def returnflag_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    flag = F.coalesce(
        F.when(F.col("l_returnflag") == "N", F.lit(None)).otherwise(
            F.col("l_returnflag")
        ),
        F.lit("UNKNOWN"),
    ).alias("flag")
    return li.groupBy(flag).agg(F.count(F.lit(1)).alias("n"))

# J7 → F.lag rewrite: prev-day self-join (daily_net_inflation.sql:53-54).
@register(
    "day_over_day_revenue",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day, revenue,
           LAG(revenue) OVER (ORDER BY day) AS prev_revenue,
           revenue - LAG(revenue) OVER (ORDER BY day) AS revenue_diff
    FROM d
    """,
    doc="prev-day self-join rewritten as lag window (J7)",
)
def day_over_day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # revenue is a double terminal (exact decimal sum, one correctly-rounded
    # conversion); lag copies it and the diff is a single IEEE subtraction —
    # bit-identical on both engines.
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(_dec_sum("o_totalprice", "revenue"))
    )
    w = Window.orderBy("day")
    return d.select(
        "day",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_diff"),
    )

# J4 → RANGE window frame: trailing sum over a sliding day window
# (daily_volatility_factor.sql:25-26 family, 13 sites).
@register(
    "trailing_7d_revenue",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day, CAST(revenue AS DOUBLE) AS revenue,
           CAST(SUM(revenue) OVER (
             ORDER BY datediff('day', DATE '1970-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_revenue
    FROM d
    """,
    doc="trailing range join rewritten as RANGE window frame (J4)",
)
def trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The window SUM runs over DECIMAL (window-frame summation order differs
    # between engines, so double accumulation would drift); only the final
    # projections convert to double.
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(_dec_sum_internal("o_totalprice", "revenue"))
    )
    out = trailing_window_agg(
        d,
        date_col="day",
        aggs={"trailing_7d_revenue": F.sum("revenue")},
        days=7,
    )
    return out.select(
        "day",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("trailing_7d_revenue").cast("double").alias("trailing_7d_revenue"),
    )

# J4 + A2: trailing COUNT(DISTINCT) — exploded date-spine rewrite
# (daily_active_accounts_app.sql / monthly_active_accounts_app.sql:19-20).
@register(
    "trailing_7d_active_users",
    """
    WITH ed AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
    ), spine AS (SELECT DISTINCT day FROM ed)
    SELECT s.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
    FROM spine s JOIN ed e ON e.day BETWEEN s.day - 6 AND s.day
    GROUP BY s.day
    """,
    doc="trailing count(distinct) via exploded date spine (J4+A2, the §4 risk center)",
)
def trailing_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return trailing_distinct_count(
        ev,
        date_col="day",
        distinct_col="user_id",
        days=7,
        out_col="active_users_7d",
        spine=ev.select("day"),
    )

# As-of join (hand-rolled in the reference as max-date + equi-join,
# daily_active_user_balance_by_app.sql:38-60) — here via the single-shuffle
# union/last-carry rewrite; oracle uses DuckDB's native ASOF JOIN.
@register(
    "purchase_with_last_view",
    """
    WITH v AS (
      SELECT user_id, ts, MAX(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
           v.view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="as-of join: most recent prior observation per key (J4 as-of variant)",
)
def purchase_with_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["view_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        "view_value",
    )

# J5: forward-window inactivity (churn) — lead rewrite of the left range join
# + IS NULL pattern (daily_churn_volume.sql:45-48).
@register(
    "part_shipment_churn_90d",
    """
    WITH pd AS (
      SELECT DISTINCT l_partkey, CAST(date_trunc('day', l_shipdate) AS DATE) AS day
      FROM lineitem
    )
    SELECT l_partkey, day FROM (
      SELECT l_partkey, day, LEAD(day) OVER (PARTITION BY l_partkey ORDER BY day) AS next_day
      FROM pd
    ) WHERE (next_day IS NULL OR next_day - day > 90) AND day + 90 < DATE '2001-09-01'
    """,
    doc="forward-inactivity anti join via lead window (J5)",
)
def part_shipment_churn_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    pd_ = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", F.to_date("l_shipdate").alias("day"))
        .distinct()
    )
    return forward_inactivity_anti(
        pd_,
        date_col="day",
        horizon_days=90,
        partition_by=["l_partkey"],
        run_date_col=F.lit("2001-09-01").cast("date"),
    ).select("l_partkey", "day")

# A6: abs-deviation volatility (daily_volatility_factor.sql:32,42-43).
@register(
    "monthly_revenue_volatility",
    """
    WITH d AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM d GROUP BY month
    )
    SELECT d.month,
           ROUND(MIN(m.total_cents) / 100.0 / MIN(m.n_days), 6) AS avg_daily_revenue,
           ROUND(CAST(SUM(ABS(d.rev_cents * m.n_days - m.total_cents)) AS BIGINT) / 100.0
                 / (MIN(m.n_days) * MIN(m.n_days)), 6) AS avg_abs_deviation
    FROM d JOIN m ON d.month = m.month
    GROUP BY d.month
    """,
    doc="two-stage abs-deviation aggregate (A6/A8); exact integer-cent arithmetic",
)
def monthly_revenue_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All intermediate math in integer cents: exact, aggregation-order-free,
    # and identical on both engines; only the final division touches doubles.
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            date_trunc_month("o_orderdate").alias("month"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    m = d.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev_cents").cast("long").alias("total_cents"),
    )
    return (
        d.join(m, "month")
        .groupBy("month")
        .agg(
            F.round(F.min("total_cents") / 100.0 / F.min("n_days"), 6).alias(
                "avg_daily_revenue"
            ),
            F.round(
                F.sum(
                    F.abs(F.col("rev_cents") * F.col("n_days") - F.col("total_cents"))
                ).cast("long")
                / 100.0
                / (F.min("n_days") * F.min("n_days")),
                6,
            ).alias("avg_abs_deviation"),
        )
    )

# A5 tie-max: closing value per (user, day) with max-on-tie semantics
# (closing_account_balance_per_day.sql:54-89).
@register(
    "closing_value_per_user_day",
    """
    WITH mx AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id, MAX(ts) AS max_ts
      FROM events GROUP BY 1, 2
    )
    SELECT mx.day, mx.user_id, MAX(e.value) AS closing_value
    FROM mx JOIN events e
      ON e.user_id = mx.user_id AND e.ts = mx.max_ts
     AND CAST(date_trunc('day', e.ts) AS DATE) = mx.day
    GROUP BY mx.day, mx.user_id
    """,
    doc="last-timestamp row per key/day, max value on timestamp ties (A5/O3)",
)
def closing_value_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    # max_by on a (ts, value) struct = latest timestamp, max value on ties —
    # one aggregation pass instead of the reference's max-join-back.
    return ev.groupBy("day", "user_id").agg(
        F.max(F.struct("ts", "value"))["value"].alias("closing_value")
    )

# A11: JSON top-k aggregation (weekly_kre_payout_summary.sql:23-39):
# rank → filter → collect sorted structs → to_json.
@register(
    "weekly_top3_buyers_json",
    """
    WITH w AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY week ORDER BY n_purchases DESC, user_id ASC) AS rn
      FROM w
    )
    SELECT week, '[' || string_agg(CAST(json_object('user_id', user_id, 'n', n_purchases) AS VARCHAR),
                                   ',' ORDER BY rn) || ']' AS top_buyers
    FROM r WHERE rn <= 3 GROUP BY week
    """,
    doc="per-group top-k serialized as a JSON array (W2+A11)",
)
def weekly_top3_buyers_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = ev.groupBy(
        date_trunc_week("ts").alias("week"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_purchases"))
    ranked = top_k_per_group(
        w,
        partition_by=["week"],
        order_by=[F.desc("n_purchases"), F.asc("user_id")],
        k=3,
        rank_col="rn",
        dense=False,
        keep_rank=True,
    )
    # Pin collect_list order under shuffle: sort the collected structs by rank.
    return ranked.groupBy("week").agg(
        F.to_json(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "user_id", "n_purchases"))),
                lambda s: F.struct(
                    s["user_id"].alias("user_id"), s["n_purchases"].alias("n")
                ),
            )
        ).alias("top_buyers")
    )

# A5 + incremental probe: high-watermark scan (incremental_anchor.sql:1-5,
# snowflake_postgres_replicator.py:132-144).
@register(
    "orders_high_watermark",
    """
    SELECT CAST(MAX(date_trunc('day', o_orderdate)) AS DATE) AS max_day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    """,
    doc="high-watermark probe used by incremental materialization (A5/S6)",
)
def orders_high_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.max(F.to_date("o_orderdate")).alias("max_day"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
