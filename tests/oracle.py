"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
canonicalizes values (columns sorted by name, rows sorted, dates/decimals/
floats normalized to strings), and diffs them exactly.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from kin_data_pipeline_spark.sources.catalog import TABLES

def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if isinstance(v, Decimal):
        # Deliberately NOT normalized: the driver's canonicalization renders
        # decimals float-style, so a trailing-zero Decimal ('100523.00') can
        # never hash-match ('100523.0'). Keeping the raw form here makes any
        # DECIMAL output column fail locally too (registered queries must
        # publish DOUBLE/BIGINT terminals; see test_no_decimal_outputs).
        return f"{v:f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    return str(v)

def _rows_to_canon(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)

def run_oracle(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        return cols, res.fetchall()
    finally:
        con.close()

def assert_no_decimal_terminals(sdf) -> None:
    """Registered queries must publish DOUBLE/BIGINT terminals, never
    DECIMAL: the driver's canonicalization renders decimals float-style, so
    trailing-zero decimal strings ('100523.00') hash-mismatch ('100523.0')
    even when the values are byte-identical."""
    from pyspark.sql.types import DecimalType

    bad = [f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"DECIMAL terminal column(s) {bad} would fail the driver canon"

def compare_query(spark, sf_dir: str, fn, oracle: str) -> int:
    """Assert spark-vs-DuckDB parity; returns the matched row count so
    callers can additionally reject vacuous empty-vs-empty greens."""
    sdf = fn(spark, sf_dir)
    assert_no_decimal_terminals(sdf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sf_dir, oracle)
    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in o_cols
    ), f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_canon = _rows_to_canon([c.lower() for c in s_cols], s_rows)
    o_canon = _rows_to_canon([c.lower() for c in o_cols], o_rows)
    for i, (a, b) in enumerate(zip(s_canon, o_canon)):
        assert a == b, f"first differing row #{i}:\n  spark : {a}\n  oracle: {b}"
    return len(s_rows)
