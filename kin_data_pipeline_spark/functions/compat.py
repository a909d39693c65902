"""Scalar compatibility layer (SURVEY.md §2.8).

Re-expresses the Snowflake-dialect scalar surface the reference's models use
(``date_trunc``/``dateadd``/``ifnull``/sentinel normalization/CASE
bucketing) as thin wrappers over built-in ``pyspark.sql.functions`` — every
helper stays JVM-side inside whole-stage codegen; nothing here is a UDF.

Dialect notes preserved from the reference:
- ``date_trunc('week', …)``: Snowflake weeks start Monday; Spark
  ``F.trunc(d, 'week')`` is also Monday-start (pinned by a unit test).
- ``'<NA>'`` string sentinels become NULL before integer casts
  (``fact_kin_transaction.sql:44-47``).
- ``dateadd(unit, n, d)`` maps to ``F.date_add`` / ``F.add_months``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def date_trunc_day(col: Column | str) -> Column:
    """``date_trunc('day', x)::DATE`` — day grain as a DateType."""
    return F.to_date(col)

def date_trunc_week(col: Column | str) -> Column:
    """``date_trunc('week', x)::DATE`` — Monday-start week as a DateType."""
    return F.trunc(F.to_date(col), "week")

def date_trunc_month(col: Column | str) -> Column:
    """``date_trunc('month', x)::DATE`` — first of month as a DateType."""
    return F.trunc(F.to_date(col), "month")

_TRUNCS = {"day": date_trunc_day, "week": date_trunc_week, "month": date_trunc_month}

def date_trunc(unit: str, col: Column | str) -> Column:
    return _TRUNCS[unit.lower()](col)

def dateadd(unit: str, n: int, col: Column | str) -> Column:
    """Snowflake ``dateadd(unit, n, d)`` over day/week/month units."""
    unit = unit.lower()
    if unit == "day":
        return F.date_add(col, n)
    if unit == "week":
        return F.date_add(col, 7 * n)
    if unit == "month":
        return F.add_months(col, n)
    raise ValueError(f"unsupported dateadd unit: {unit}")

def to_timestamp_seconds(col: Column | str) -> Column:
    """Snowflake ``to_timestamp(epoch_seconds)``."""
    return F.timestamp_seconds(col)

def ifnull(col: Column | str, default) -> Column:
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(default))

def normalize_sentinel(col: Column | str, sentinel: str = "<NA>") -> Column:
    """``'<NA>'`` → NULL (then callers cast), per the fact models."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == sentinel, F.lit(None)).otherwise(c)

def bucketize(col: Column | str, edges: list[float], labels: list[str]) -> Column:
    """CASE-expression histogram bucketing (amount/balance buckets, §2.2 P8).

    ``edges`` are the inclusive upper bounds of each bucket except the last
    label, which catches everything above the final edge. Stays a single
    chained ``CASE WHEN`` so Catalyst folds it into codegen (no Bucketizer /
    ML dependency, no extra pass).
    """
    if len(labels) != len(edges) + 1:
        raise ValueError("need exactly one more label than edges")
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c <= F.lit(edges[0]), F.lit(labels[0]))
    for i in range(1, len(edges)):
        expr = expr.when(c <= F.lit(edges[i]), F.lit(labels[i]))
    return expr.otherwise(F.lit(labels[-1]))
