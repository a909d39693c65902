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
