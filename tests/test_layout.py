"""Z-order layout: correctness of the Morton code and a measured
file-skipping comparison against a naive layout on real testdata.

The skipping assertion reads the written parquet footers (per-file
min/max) directly — the same statistics a scan planner prunes with — so
the test measures the layout property itself, not a Spark version's
pruning behavior.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kin_data_pipeline_spark.operators.layout import (
    interleave_bits,
    quantize,
    zorder_layout,
)
from kin_data_pipeline_spark.sources.catalog import load_table

def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 9)], "x long, y long"
    )
    got = [
        r[0]
        for r in df.select(interleave_bits(F.col("x"), F.col("y"), 8)).collect()
    ]

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 9)]]

def test_quantize_is_monotone_and_bounded(spark):
    df = spark.createDataFrame([(v,) for v in (-5.0, 0.0, 3.7, 49.9, 50.0, 99.0)], "v double")
    got = [r[0] for r in df.select(quantize(F.col("v"), 0.0, 50.0, 16)).collect()]
    assert got == sorted(got)
    assert all(0 <= b <= 15 for b in got)

def _file_ranges(path: str, cols: list[str]):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append((mins, maxs))
    return out

def test_zorder_files_prune_2d_box_better_than_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("double").alias("value")
    ).filter(F.col("value").isNotNull())
    bounds = ev.agg(
        F.min("user_id").alias("ul"),
        F.max("user_id").alias("uh"),
        F.min("value").alias("vl"),
        F.max("value").alias("vh"),
    ).first()
    # a narrow (~15%-wide) slice of each dimension, centered
    u_lo = bounds["ul"] + (bounds["uh"] - bounds["ul"]) * 0.45
    u_hi = bounds["ul"] + (bounds["uh"] - bounds["ul"]) * 0.60
    v_lo = bounds["vl"] + (bounds["vh"] - bounds["vl"]) * 0.45
    v_hi = bounds["vl"] + (bounds["vh"] - bounds["vl"]) * 0.60
    n_files = 16
    with tempfile.TemporaryDirectory() as td:
        naive_dir = os.path.join(td, "naive")
        z_dir = os.path.join(td, "zorder")
        # naive: hash-repartitioned (every file spans the full value space)
        ev.repartition(n_files).write.parquet(naive_dir)
        zx = quantize(F.col("user_id"), bounds["ul"], bounds["uh"] + 1, 1 << 8)
        zy = quantize(F.col("value"), bounds["vl"], bounds["vh"] + 1.0, 1 << 8)
        zorder_layout(ev, zx, zy, n_files, bits=8).write.parquet(z_dir)

        # 2-D box: a narrow user slice AND a narrow value slice
        def hit_count(path):
            hits = 0
            for mins, maxs in _file_ranges(path, ["user_id", "value"]):
                u_ok = mins["user_id"] <= u_hi and maxs["user_id"] >= u_lo
                v_ok = mins["value"] <= v_hi and maxs["value"] >= v_lo
                hits += 1 if (u_ok and v_ok) else 0
            return hits

        naive_hits = hit_count(naive_dir)
        z_hits = hit_count(z_dir)
        # naive files all intersect the box; the z-layout prunes most
        assert naive_hits >= n_files - 1
        assert z_hits < naive_hits / 2

        # layout must not change the data
        a = spark.read.parquet(naive_dir)
        b = spark.read.parquet(z_dir)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

def test_zorder_model_materializes_through_runner(spark, sf_dir, tmp_path):
    """Model.zorder_by routes the write through the z-ordered layout and
    always full-refreshes; the stored table round-trips the data and its
    files carry tight 2-D min/max boxes."""
    import datetime

    from kin_data_pipeline_spark.plans.engine import Catalog, Runner
    from kin_data_pipeline_spark.plans.model import Model

    cat = Catalog(spark, str(tmp_path / "wh"))
    m = Model(
        name="events_zordered",
        builder=lambda ctx: load_table(ctx.spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "user_id", F.col("value").cast("double").alias("value")),
        date_col=None,
        zorder_by=("user_id", "value"),
        n_zfiles=8,
    )
    Runner(spark, cat).run([m], datetime.date(2024, 2, 1))
    stored = cat.table("events_zordered")
    src = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    assert stored.count() == src.count()

    ranges = _file_ranges(str(tmp_path / "wh" / "events_zordered"), ["user_id"])
    assert len(ranges) > 1
    # tight boxes: the per-file user_id spans cover far less than the full
    # domain on average (a hash layout would put the full span in every file)
    full = src.agg(
        (F.max("user_id") - F.min("user_id")).alias("span")
    ).first()["span"]
    spans = [maxs["user_id"] - mins["user_id"] for mins, maxs in ranges]
    assert sum(spans) / len(spans) < full * 0.8

    # second run stays a full rewrite (no append path for the layout)
    Runner(spark, cat).run([m], datetime.date(2024, 2, 2))
    assert cat.table("events_zordered").count() == src.count()

def test_zorder_model_declaration_validates():
    import pytest as _pytest

    from kin_data_pipeline_spark.plans.model import Model

    with _pytest.raises(ValueError, match="exactly two"):
        Model(name="bad1", builder=lambda c: None, date_col=None, zorder_by=("x",))
    with _pytest.raises(ValueError, match="date_col=None"):
        Model(name="bad2", builder=lambda c: None, zorder_by=("x", "y"))
    with _pytest.raises(ValueError, match="mutually exclusive"):
        Model(
            name="bad3",
            builder=lambda c: None,
            date_col=None,
            zorder_by=("x", "y"),
            bucket_by=("x",),
        )
