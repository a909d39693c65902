"""Empty-corpus robustness: every pair-former / ranker must return a
correctly-shaped empty frame on zero rows, not crash on a driver-side
probe (`first()` returning None) — the edge every production backfill or
freshly-created source hits at least once."""

from __future__ import annotations

from pyspark.sql import functions as F

from kin_data_pipeline_spark.sources.catalog import load_table

def _empty_emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").filter("vec_id < 0")

def _empty_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter("doc_id < 0")

def test_similarity_operators_empty_corpus(spark, sf_dir):
    from kin_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_near_dup_pairs,
        lsh_topk,
    )

    emb = _empty_emb(spark, sf_dir)
    assert lsh_near_dup_pairs(emb).count() == 0
    assert cosine_topk(emb, emb).count() == 0
    assert lsh_topk(emb, emb).count() == 0
    assert ivf_topk(emb, emb).count() == 0

def test_dedup_operators_empty_corpus(spark, sf_dir):
    from kin_data_pipeline_spark.operators.dedup import (
        exact_dedup,
        jaccard_pairs,
        minhash_signatures,
        shingle_postings,
        simhash,
    )

    docs = _empty_docs(spark, sf_dir)
    assert exact_dedup(docs, "text", "doc_id").count() == 0
    postings = shingle_postings(docs, "text", "doc_id")
    assert postings.count() == 0
    assert jaccard_pairs(postings).count() == 0
    assert minhash_signatures(postings, [(3, 7), (11, 13)]).count() == 0
    assert simhash(docs, "text", "doc_id").count() == 0

def test_rangejoin_operators_empty_input(spark, sf_dir):
    from kin_data_pipeline_spark.operators.rangejoin import (
        trailing_distinct_count,
        trailing_window_agg,
    )

    ev = load_table(spark, sf_dir, "events").filter("event_id < 0")
    daily = ev.select(F.to_date("ts").alias("day"), "value", "user_id")
    assert (
        trailing_window_agg(daily, "day", {"s": F.sum("value")}, days=7).count()
        == 0
    )
    assert (
        trailing_distinct_count(daily, "day", "user_id", days=7).count() == 0
    )

def test_round3_operators_empty_input(spark, sf_dir):
    from pyspark.sql import functions as F2

    from kin_data_pipeline_spark.operators.dedup import connected_components_star
    from kin_data_pipeline_spark.operators.layout import zorder_layout
    from kin_data_pipeline_spark.operators.shards import (
        shard_assignment,
        shard_manifest,
    )
    from kin_data_pipeline_spark.operators.webfilter import (
        blocklist_filter,
        blocklist_mark,
        domain_cap,
    )

    docs = _empty_docs(spark, sf_dir)
    blocked = spark.createDataFrame([("x.example",)], "domain string")
    assert blocklist_mark(docs.withColumn("dom", F2.lit("a.b")), "dom", blocked).count() == 0
    assert blocklist_filter(docs.withColumn("dom", F2.lit("a.b")), "dom", blocked).count() == 0
    assert domain_cap(docs.withColumn("dom", F2.lit("a.b")), "dom", "doc_id", 3).count() == 0
    assigned = shard_assignment(docs, "doc_id", 8)
    assert assigned.count() == 0
    assert shard_manifest(assigned, "n_chars").count() == 0
    empty_edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_star(empty_edges).count() == 0
    ev = load_table(spark, sf_dir, "events").filter("event_id < 0")
    assert zorder_layout(ev, F2.col("user_id"), F2.col("value").cast("long"), 4).count() == 0

def test_late_round3_additions_empty_input(spark, sf_dir):
    """The late-round-3 additions (clean-stage rewrite, cell outliers,
    sketch rollups) must return correctly-shaped empties on zero rows."""
    from pyspark.sql import functions as F2

    from kin_data_pipeline_spark.operators.similarity import assign_cells

    emb = _empty_emb(spark, sf_dir)
    assert assign_cells(emb).count() == 0

    # sketch aggregates over empty inputs: no groups, no rows, no crash
    ev = load_table(spark, sf_dir, "events").filter("event_id < 0")
    sk = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F2.hll_sketch_agg("user_id", F2.lit(14)).alias("sk"))
        .agg(F2.hll_sketch_estimate(F2.hll_union_agg("sk")).alias("est"))
    )
    assert sk.collect()[0]["est"] is None or sk.collect()[0]["est"] == 0

    # clean-stage rewrite on an empty survivor table
    from kin_data_pipeline_spark.models.corpus import corpus_release_models
    import datetime as _dt

    from kin_data_pipeline_spark.plans.engine import Catalog, Runner
    import tempfile

    with tempfile.TemporaryDirectory() as wh:
        cat = Catalog(spark, wh)
        cat.write_full(
            "corpus_survivors",
            spark.createDataFrame([], "doc_id long, source string, text string"),
            date_col=None,
        )
        clean = [m for m in corpus_release_models(sf_dir) if m.name == "corpus_clean"]
        Runner(spark, cat).run(clean, _dt.date(2024, 2, 1))
        out = cat.table("corpus_clean")
        assert out.count() == 0
        assert set(out.columns) == {
            "doc_id", "source", "text", "n_tokens", "n_dropped_chunks",
        }

def test_wav_and_pq_empty_inputs(spark, sf_dir):
    from kin_data_pipeline_spark.operators.multimodal import (
        synthesize_pcm_wav_df,
        wav_sample_stats_df,
    )

    docs = _empty_docs(spark, sf_dir)
    assert wav_sample_stats_df(synthesize_pcm_wav_df(docs, "doc_id")).count() == 0

def test_prefix_filter_jaccard_empty_corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from kin_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = _empty_docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("words")
    )
    shingled = docs.select(
        "doc_id", F.array_distinct(F.col("words")).alias("shingles")
    )
    assert prefix_filter_jaccard_pairs(shingled, 1, 2).count() == 0

def test_snapshot_diff_of_unchanged_table_is_empty(spark, tmp_path):
    from kin_data_pipeline_spark.plans.engine import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    cat.write_full("t", df, date_col=None)
    cat.snapshot("t", "v1")
    added, removed = cat.diff_snapshot("t", "v1")
    assert added.count() == 0 and removed.count() == 0

def test_timeseries_operators_empty_input(spark, sf_dir):
    from kin_data_pipeline_spark.operators.timeseries import (
        gapfill_locf_interpolate_frame,
        time_weighted_avg,
    )

    ev = load_table(spark, sf_dir, "events").filter("event_id < 0")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.lit(1)).alias("v")
    )
    gf = gapfill_locf_interpolate_frame(daily, "user_id", "day", "v")
    assert gf.count() == 0
    assert gf.columns == [
        "user_id", "day", "is_observed", "v", "locf", "interp_num", "interp_den",
    ]
    obs = ev.select("user_id", F.unix_micros("ts").alias("t"), F.lit(1).alias("v"))
    twa = time_weighted_avg(obs, "user_id", "t", "v")
    assert twa.count() == 0
    assert twa.columns == ["user_id", "n_obs", "twa_num", "twa_den"]
    # single-observation entities: still no output (no interval)
    one = load_table(spark, sf_dir, "events").limit(1).select(
        "user_id", F.unix_micros("ts").alias("t"), F.lit(1).alias("v")
    )
    assert time_weighted_avg(one, "user_id", "t", "v").count() == 0

def test_rolling_zscore_empty_and_sparse_calendar(spark, sf_dir):
    from kin_data_pipeline_spark.operators.timeseries import rolling_zscore

    ev = load_table(spark, sf_dir, "events").filter("event_id < 0")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.lit(1)).alias("v")
    )
    z = rolling_zscore(daily, "event_type", "day", "v")
    assert z.count() == 0
    # RANGE frame: a calendar hole must shrink n_window, never stretch it
    sparse = spark.createDataFrame(
        [("a", "2024-01-01", 10), ("a", "2024-01-02", 10), ("a", "2024-01-20", 10)],
        "e string, d string, v long",
    ).selectExpr("e", "CAST(d AS DATE) AS d", "v")
    rows = {r.d.isoformat(): r for r in rolling_zscore(sparse, "e", "d", "v").collect()}
    assert rows["2024-01-02"].n_window == 2
    assert rows["2024-01-20"].n_window == 1, "gap must reset the RANGE frame"
    assert not any(r.is_anomaly for r in rows.values())
