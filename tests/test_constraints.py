"""CHECK constraints on write (Delta ADD CONSTRAINT shape): declared per
table, scanned once at declaration time, enforced TASK-SIDE during every
top-level write — a violating row aborts the job with the constraint
name and the row, and the table is left unchanged (staging discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)
from pyspark.errors import SparkRuntimeException

from kin_data_pipeline_spark.plans.engine import Catalog

DDL = "id long, grp string, val long"


def _cat(spark, tmp_path, rows=((1, "a", 10), (2, "b", 20))):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.write_full("t", spark.createDataFrame(list(rows), DDL), None)
    return cat


def test_add_list_drop(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.add_constraint("t", "val_pos", "val > 0")
    cat.add_constraint("t", "grp_known", "grp IN ('a','b','c')")
    assert cat.constraints("t") == {
        "val_pos": "val > 0",
        "grp_known": "grp IN ('a','b','c')",
    }
    with pytest.raises(ValueError, match="already"):
        cat.add_constraint("t", "val_pos", "val > 5")
    assert cat.drop_constraint("t", "grp_known")
    assert not cat.drop_constraint("t", "grp_known")
    assert cat.constraints("t") == {"val_pos": "val > 0"}


def test_add_refused_when_existing_rows_violate(spark, tmp_path):
    cat = _cat(spark, tmp_path, [(1, "a", 10), (2, "b", -5)])
    with pytest.raises(ValueError, match="existing row violates"):
        cat.add_constraint("t", "val_pos", "val > 0")
    assert cat.constraints("t") == {}


def test_writes_enforce_and_leave_table_unchanged(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.add_constraint("t", "val_pos", "val > 0")
    # append of a violating batch aborts task-side with the name + row
    with pytest.raises(SparkRuntimeException, match="val_pos"):
        cat.write_append(
            "t", spark.createDataFrame([(3, "c", -1)], DDL), None
        )
    # full rewrite and upsert enforce too
    with pytest.raises(SparkRuntimeException, match="val_pos"):
        cat.write_full("t", spark.createDataFrame([(9, "z", 0)], DDL), None)
    with pytest.raises(SparkRuntimeException, match="val_pos"):
        cat.upsert_by_key(
            "t", spark.createDataFrame([(1, "a", -7)], DDL), ["id"], None
        )
    # changelog merge checks its surviving upserts (a trailing D needs no
    # check; the I that the D then erases is compressed away first)
    with pytest.raises(SparkRuntimeException, match="val_pos"):
        cat.apply_changelog(
            "t",
            spark.createDataFrame(
                [(5, "e", -9, "I", 1)],
                f"{DDL}, op string, seq int",
            ),
            ["id"],
        )
    # the table survived every aborted write intact
    assert sorted((r.id, r.val) for r in cat.table("t").collect()) == [
        (1, 10),
        (2, 20),
    ]
    # and a conforming write still lands
    cat.write_append("t", spark.createDataFrame([(3, "c", 99)], DDL), None)
    assert cat.table("t").count() == 3


def test_null_passes_like_sql_check(spark, tmp_path):
    """SQL CHECK semantics: only FALSE violates; NULL (unknown) passes."""
    cat = _cat(spark, tmp_path)
    cat.add_constraint("t", "val_pos", "val > 0")
    cat.write_append(
        "t", spark.createDataFrame([(4, "d", None)], DDL), None
    )
    assert cat.table("t").filter("val IS NULL").count() == 1


def test_constraints_compose_with_versioning_and_cdf(spark, tmp_path):
    """An aborted constrained write on a VERSIONED table commits nothing
    and stages no CDF rows — the next commit records only its own diff."""
    cat = _cat(spark, tmp_path)
    cat.enable_versioning("t")  # v0
    cat.add_constraint("t", "val_pos", "val > 0")
    with pytest.raises(SparkRuntimeException, match="val_pos"):
        cat.write_append(
            "t", spark.createDataFrame([(3, "c", -1)], DDL), None
        )
    assert [e["version"] for e in cat.history("t")] == [0]
    cat.write_append("t", spark.createDataFrame([(3, "c", 30)], DDL), None)
    ch = sorted(
        (r["_change_type"], r.id) for r in cat.table_changes("t", 0, 1).collect()
    )
    assert ch == [("insert", 3)]
