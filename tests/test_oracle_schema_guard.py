"""Oracle-side twin of ``assert_no_decimal_terminals``.

The Spark side has always been guarded (every registered query's result
schema is checked for DECIMAL terminals in test_oracle_parity), but round 3
proved the ORACLE side can ship one anyway: DuckDB widens SUM(BIGINT) to
HUGEINT, which surfaces as Arrow decimal128(38,0), and the driver's canon
renders decimals float-style — so the hash can never match even when every
value is identical (sequence_packing_index, the one red r3 row). This guard
runs every registered oracle through DuckDB with LIMIT 0 and asserts the
Arrow terminal schema contains no decimal column, closing the class.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from kin_data_pipeline_spark.queries import QUERIES
from kin_data_pipeline_spark.sources.catalog import TABLES

_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(_SF_DIR, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield c
    c.close()


_ORACLES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_terminal_schema_has_no_decimal(con, name):
    sql = QUERIES[name].oracle
    # LIMIT 0 keeps the terminal schema (types are resolved at bind time)
    # without materializing rows — the whole registry checks in seconds.
    tbl = con.execute(f"SELECT * FROM ({sql}) AS _q LIMIT 0").arrow()
    bad = [
        f.name
        for f in tbl.schema
        if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"oracle '{name}' ships decimal terminal(s) {bad} — CAST to "
        "BIGINT/DOUBLE; the driver canon renders decimals float-style and "
        "the hash can never match"
    )
