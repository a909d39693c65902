"""Lifecycle-integrated dedup index: the corpus's LSH band table is
materialized ONCE as a catalog model, and an arriving batch probes the
STORED index with a broadcast join — byte-identical collisions to the
recompute-everything form, without re-deriving corpus signatures."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kin_data_pipeline_spark.plans.engine import Catalog, Runner
from kin_data_pipeline_spark.plans.model import Model
from kin_data_pipeline_spark.queries.curation import (
    _BATCH_MOD,
    document_bands,
    document_signatures,
)
from kin_data_pipeline_spark.queries.registry import QUERIES
from kin_data_pipeline_spark.sources.catalog import load_table

RUN = datetime.date(2024, 2, 1)

def test_persisted_band_index_matches_recompute(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    corpus_bands_model = Model(
        name="doc_lsh_bands",
        builder=lambda ctx: document_bands(
            document_signatures(
                load_table(ctx.spark, sf_dir, "documents").filter(
                    F.col("doc_id") % _BATCH_MOD != 0
                )
            )
        ),
        date_col=None,
    )
    Runner(spark, cat).run([corpus_bands_model], RUN)

    # arriving batch probes the STORED index
    batch_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _BATCH_MOD == 0
    )
    batch_bands = document_bands(document_signatures(batch_docs))
    stored = cat.table("doc_lsh_bands").select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    hits = (
        F.broadcast(batch_bands)
        .join(stored, ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(F.count_distinct("corpus_doc").cast("long").alias("n_collisions"))
    )
    probed = {
        (r["doc_id"], r["n_collisions"]) for r in hits.collect()
    }
    expected = {
        (r["doc_id"], r["n_collisions"])
        for r in QUERIES["incremental_dedup_check"].fn(spark, sf_dir).collect()
        if r["n_collisions"] > 0
    }
    assert probed == expected
