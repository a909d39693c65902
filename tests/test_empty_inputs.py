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
