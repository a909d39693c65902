"""Cross-store export sink (SURVEY.md §2.1 S8, §3 E3) + grants (S10).

The reference replicates mart tables to Postgres by pulling EVERY row
through driver memory (``snowflake_postgres_replicator.py:158``
``fetch_pandas_all``) and pandas ``to_sql``. The Spark-native form is a
distributed JDBC write with the same watermark-append contract — no
driver materialization at any size:

    export_jdbc(df, url, table, mode="append", watermark_col="date", watermark=v)

No JDBC driver jar nor target DB exists in this container, so the write
call is issued only when a URL is supplied; the watermark/projection logic
(which is the reference's actual business logic) is pure DataFrame code and
unit-tested.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

def apply_export_watermark(
    df: DataFrame, watermark_col: str | None, watermark
) -> DataFrame:
    """Incremental export filter: only rows past the target's stored
    high watermark (snowflake_postgres_replicator.py:132-144 probes
    ``SELECT max(date_col)`` and injects ``WHERE DATE_KEY > max``)."""
    if watermark_col is None or watermark is None:
        return df
    from pyspark.sql import functions as F

    return df.filter(F.col(watermark_col) > F.lit(watermark))

def export_jdbc(
    df: DataFrame,
    url: str | None,
    table: str,
    mode: str = "append",  # append (incremental) | overwrite (rebuild)
    watermark_col: str | None = None,
    watermark=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed JDBC export. Returns the (possibly filtered) frame that
    was—or would be—written, so callers and tests can assert on it."""
    out = apply_export_watermark(df, watermark_col, watermark)
    if url is None:
        log.info("export_jdbc dry-run: table=%s mode=%s", table, mode)
        return out
    writer = out.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
    return out

def grant_select(table: str, role: str) -> None:
    """S10 permission grant — catalog ACLs are deployment-specific; the
    engine records the intent (execute_snowflake_load.py:109-121 equivalent)."""
    log.info("GRANT SELECT ON %s TO ROLE %s (catalog ACL no-op)", table, role)
