"""Catalog snapshots / time travel: tagged zero-copy versions that survive
every later write path (overwrite, append, upsert, compaction), instant
restore with the compaction swap discipline, and hygiene (list_tables
exclusion, clone/bucketed guardrails)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kin_data_pipeline_spark.plans.engine import Catalog

def _rows(df):
    return sorted(tuple(r) for r in df.collect())

@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))

def _df(spark, *vals):
    return spark.createDataFrame([(v, f"r{v}") for v in vals], "id long, s string")

def test_snapshot_survives_overwrite_and_restore_rolls_back(spark, cat):
    cat.write_full("t", _df(spark, 1, 2, 3), date_col=None)
    cat.snapshot("t", "v1")
    cat.write_full("t", _df(spark, 9), date_col=None)
    assert _rows(cat.table("t")) == [(9, "r9")]
    assert _rows(cat.table_at("t", "v1")) == [(1, "r1"), (2, "r2"), (3, "r3")]
    cat.restore("t", "v1")
    assert _rows(cat.table("t")) == [(1, "r1"), (2, "r2"), (3, "r3")]
    # the snapshot outlives its own restore
    assert cat.list_snapshots("t") == ["v1"]

def test_snapshot_is_zero_copy_hardlinks(spark, cat):
    cat.write_full("t", _df(spark, 1, 2), date_col=None)
    cat.snapshot("t", "v1")
    snap_data = cat._snapshot_dir("t", "v1") + "/data"
    linked = 0
    for root, _dirs, files in os.walk(snap_data):
        for f in files:
            st = os.stat(os.path.join(root, f))
            if st.st_nlink >= 2:
                linked += 1
    assert linked > 0, "snapshot copied bytes instead of hardlinking"

def test_snapshot_unaffected_by_append_upsert_compact(spark, cat):
    cat.write_full("t", _df(spark, 1, 2), date_col=None)
    cat.snapshot("t", "v1")
    cat.write_append("t", _df(spark, 3), date_col=None)
    cat.upsert_by_key("t", _df(spark, 2), key_cols=["id"], date_col=None)
    cat.compact("t", date_col=None)
    assert _rows(cat.table("t")) == [(1, "r1"), (2, "r2"), (3, "r3")]
    assert _rows(cat.table_at("t", "v1")) == [(1, "r1"), (2, "r2")]

def test_snapshot_of_empty_partitioned_table_readable(spark, cat):
    df = _df(spark, 1).filter(F.col("id") > 99)
    cat.write_full("t", df, date_col=None)
    cat.snapshot("t", "empty")
    got = cat.table_at("t", "empty")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "s"]

def test_snapshot_tags_are_isolated_and_droppable(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    cat.snapshot("t", "v1")
    cat.write_full("t", _df(spark, 2), date_col=None)
    cat.snapshot("t", "v2")
    assert cat.list_snapshots("t") == ["v1", "v2"]
    assert _rows(cat.table_at("t", "v1")) == [(1, "r1")]
    assert _rows(cat.table_at("t", "v2")) == [(2, "r2")]
    cat.drop_snapshot("t", "v1")
    assert cat.list_snapshots("t") == ["v2"]
    with pytest.raises(ValueError, match="no snapshot"):
        cat.table_at("t", "v1")

def test_snapshot_guardrails(spark, cat):
    cat.write_full("src", _df(spark, 1), date_col=None)
    cat.clone("alias", "src")
    # snapshot through a clone captures the resolved data (under the alias)
    cat.snapshot("alias", "v1")
    assert _rows(cat.table_at("alias", "v1")) == [(1, "r1")]
    # but restore through a clone must refuse (would mutate the source)
    with pytest.raises(ValueError, match="clone"):
        cat.restore("alias", "v1")
    with pytest.raises(ValueError, match="missing table"):
        cat.snapshot("nope", "v1")
    with pytest.raises(ValueError, match="already exists"):
        cat.snapshot("alias", "v1")
    with pytest.raises(ValueError, match="invalid snapshot tag"):
        cat.snapshot("src", "../escape")
    # empty/whitespace tags would resolve os.path.join to the snapshots
    # BASE dir — publishing AT the base and turning 'data'/'schema.json'
    # into bogus list_snapshots entries
    for bad in ("", "   "):
        with pytest.raises(ValueError, match="invalid snapshot tag"):
            cat.snapshot("src", bad)
    # a tag colliding with the atomic-publish scratch suffix would be
    # hidden by list_snapshots and rmtree'd by the next base-tag snapshot
    with pytest.raises(ValueError, match="invalid snapshot tag"):
        cat.snapshot("src", "x.__staging")
    # snapshot dirs never surface as tables
    assert "src.__snapshots" not in cat.list_tables()
    assert set(cat.list_tables()) == {"src", "alias"}

def test_snapshot_dir_excluded_from_list_tables_after_many_tags(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    for i in range(3):
        cat.snapshot("t", f"v{i}")
    assert cat.list_tables() == ["t"]

def test_diff_snapshot_reports_added_and_removed(spark, cat):
    cat.write_full("t", _df(spark, 1, 2, 3), date_col=None)
    cat.snapshot("t", "v1")
    # remove 3, add 4 and a DUPLICATE of 2 (multiplicity must surface)
    cat.write_full(
        "t",
        spark.createDataFrame(
            [(1, "r1"), (2, "r2"), (2, "r2"), (4, "r4")], "id long, s string"
        ),
        date_col=None,
    )
    added, removed = cat.diff_snapshot("t", "v1")
    assert _rows(added) == [(2, "r2"), (4, "r4")]
    assert _rows(removed) == [(3, "r3")]

def test_diff_snapshot_refuses_schema_drift(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    cat.snapshot("t", "v1")
    cat.write_full(
        "t",
        spark.createDataFrame([(1, "r1", 9)], "id long, s string, extra long"),
        date_col=None,
    )
    with pytest.raises(ValueError, match="column sets differ"):
        cat.diff_snapshot("t", "v1")

def test_restore_clears_interim_bucket_layout(spark, cat):
    # snapshot plain -> convert the live table to bucketed -> restore the
    # tag: a surviving bucket sidecar would route table() through a
    # bucketed scan over restored non-bucket-named files
    cat.write_full("t", _df(spark, 1, 2), date_col=None)
    cat.snapshot("t", "v1")
    cat.write_bucketed("t", _df(spark, 7, 8), bucket_cols=["id"], n_buckets=2)
    assert _rows(cat.table("t")) == [(7, "r7"), (8, "r8")]
    cat.restore("t", "v1")
    assert _rows(cat.table("t")) == [(1, "r1"), (2, "r2")]

def test_delete_by_keys_list_and_frame(spark, cat):
    cat.write_full("t", _df(spark, 1, 2, 3, 4), date_col=None)
    removed = cat.delete_by_keys("t", "id", [2, 4])
    assert removed == 2
    assert _rows(cat.table("t")) == [(1, "r1"), (3, "r3")]
    keys = spark.createDataFrame([(3,)], "id long")
    assert cat.delete_by_keys("t", "id", keys) == 1
    assert _rows(cat.table("t")) == [(1, "r1")]
    # idempotent on absent keys
    assert cat.delete_by_keys("t", "id", [99]) == 0

def test_delete_by_keys_preserves_partition_layout(spark, cat):
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02")],
        "id long, d string",
    ).withColumn("d", F.to_date("d"))
    cat.write_full("t", df, date_col="d")
    assert cat.delete_by_keys("t", "id", [2]) == 1
    assert sorted(r[0] for r in cat.table("t").select("id").collect()) == [1, 3]
    parts = [e for e in os.listdir(cat.path("t")) if e.startswith("d=")]
    assert sorted(parts) == ["d=2024-01-01", "d=2024-01-02"]

def test_delete_by_keys_guardrails(spark, cat):
    cat.write_full("src", _df(spark, 1), date_col=None)
    cat.clone("alias", "src")
    with pytest.raises(ValueError, match="clone"):
        cat.delete_by_keys("alias", "id", [1])
    with pytest.raises(ValueError, match="no column"):
        cat.delete_by_keys("src", "nope", [1])


def test_vacuum_prunes_snapshots_to_keep_last(spark, cat):
    import time

    cat.write_full("t", _df(spark, 1), date_col=None)
    for i in range(4):
        cat.snapshot("t", f"v{i}")
        time.sleep(0.05)  # distinct publish mtimes for the retention order
    report = cat.vacuum("t", keep_snapshots=2, min_age_s=0.0)
    assert report["snapshots_dropped"] == {"t": ["v0", "v1"]}
    assert cat.list_snapshots("t") == ["v2", "v3"]
    # the kept snapshots still read
    assert _rows(cat.table_at("t", "v3")) == [(1, "r1")]


def test_vacuum_sweeps_aged_orphan_scratch_but_spares_fresh(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    stale = cat.path("t.__staging")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk"), "w") as f:
        f.write("x")
    # fresh scratch (age 0) survives a retention-guarded vacuum ...
    assert cat.vacuum("t", min_age_s=3600.0)["scratch_removed"] == []
    assert os.path.isdir(stale)
    # ... and is swept once it is older than the retention window
    report = cat.vacuum("t", min_age_s=0.0)
    assert report["scratch_removed"] == ["t.__staging"]
    assert not os.path.exists(stale)
    assert _rows(cat.table("t")) == [(1, "r1")]


def test_vacuum_heals_crashed_swap_before_sweeping(spark, cat):
    import shutil

    cat.write_full("t", _df(spark, 1, 2), date_col=None)
    # simulate a crash inside the rename-aside window: root renamed away,
    # staging never renamed in
    os.rename(cat.path("t"), cat.path("t.__precompact"))
    assert not os.path.exists(cat.path("t"))
    cat.vacuum("t", min_age_s=0.0)
    assert _rows(cat.table("t")) == [(1, "r1"), (2, "r2")]
    assert not os.path.exists(cat.path("t.__precompact"))


def test_vacuum_sweeps_half_published_snapshot_staging(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    cat.snapshot("t", "good")
    half = cat._snapshot_dir("t", "bad") + ".__staging"
    os.makedirs(os.path.join(half, "data"))
    report = cat.vacuum("t", min_age_s=0.0)
    assert report["scratch_removed"] == ["t.__snapshots/bad.__staging"]
    assert cat.list_snapshots("t") == ["good"]


def test_vacuum_sweeps_orphaned_journal_tmp(spark, cat):
    cat.write_full("t", _df(spark, 1), date_col=None)
    jt = cat._swap_journal("t") + ".tmp"
    with open(jt, "w") as f:
        f.write('{"entries": []}')
    report = cat.vacuum("t", min_age_s=0.0)
    assert os.path.basename(jt) in report["scratch_removed"]
    assert not os.path.exists(jt)
