"""Web-corpus filtering tier: operator unit behavior + plan shape.

Oracle parity for the four registered queries is covered by
tests/test_oracle_parity.py; here we pin the operator semantics on edge
inputs and the scale-critical plan shapes (blocklist gate broadcasts, the
corpus side never becomes the build side).
"""

from __future__ import annotations

from kin_data_pipeline_spark.operators.webfilter import (
    blocklist_filter,
    blocklist_mark,
    domain_cap,
    domain_of,
    registrable_domain,
)

def test_domain_of_extracts_and_normalizes(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.COM/path?q=1",),
            ("http://a.b.co.uk/",),
            ("ftp://files.example.org",),
            ("not a url",),
            ("https://host:8443/x",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(domain_of("url")).collect()]
    assert got == ["www.example.com", "a.b.co.uk", "files.example.org", "", "host"]

def test_registrable_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [("www.news.example.com",), ("example.com",), ("localhost",)],
        "host string",
    )
    got = [r[0] for r in df.select(registrable_domain("host")).collect()]
    assert got == ["example.com", "example.com", "localhost"]

def test_blocklist_mark_and_filter_agree(spark):
    docs = spark.createDataFrame(
        [(1, "ads.example"), (2, "good.example"), (3, "ads.example")],
        "id long, dom string",
    )
    blocked = spark.createDataFrame([("ads.example",)], "domain string")
    marked = blocklist_mark(docs, "dom", blocked)
    assert {r["id"]: r["blocked"] for r in marked.collect()} == {
        1: True,
        2: False,
        3: True,
    }
    kept = blocklist_filter(docs, "dom", blocked)
    assert [r["id"] for r in kept.collect()] == [2]

def test_blocklist_gate_broadcasts_the_small_side(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i % 3}.example") for i in range(20)], "id long, dom string"
    )
    blocked = spark.createDataFrame([("d0.example",)], "domain string")
    for frame in (
        blocklist_mark(docs, "dom", blocked),
        blocklist_filter(docs, "dom", blocked),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

def test_domain_cap_keeps_deterministic_prefix(spark):
    rows = [(d, i) for d in ("a.x", "b.x") for i in range(5)]
    df = spark.createDataFrame(rows, "dom string, ord long")
    capped = domain_cap(df, "dom", "ord", 2)
    got = sorted((r["dom"], r["ord"]) for r in capped.collect())
    assert got == [("a.x", 0), ("a.x", 1), ("b.x", 0), ("b.x", 1)]

def test_url_filter_stats_blocklist_is_broadcast(spark, sf_dir):
    from kin_data_pipeline_spark.queries.filtering import url_domain_filter_stats

    plan = (
        url_domain_filter_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan

def test_token_rarity_lm_side_is_broadcast(spark, sf_dir):
    from kin_data_pipeline_spark.queries.filtering import token_rarity_scores

    plan = (
        token_rarity_scores(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the vocabulary (LM) side broadcasts; the token stream never shuffles
    # for the score join
    assert "BroadcastHashJoin" in plan

def test_repeated_chunk_stats_counts_cross_doc_repeats_only(spark):
    # doc 1 and 2 share one 8-token chunk; doc 3 repeats its own chunk
    # twice (intra-doc repeat: both instances count as shared only if the
    # chunk spans >= 2 DISTINCT docs, so doc 3's stay unshared).
    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    other = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [
            (1, eight, "s"),
            (2, eight + " tail ignored because partial", "s"),
            (3, other + " " + other, "s"),
        ],
        "doc_id long, text string, source string",
    )
    from kin_data_pipeline_spark.queries import filtering as flt

    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        # testdata tables are single parquet FILES (the catalog probes their
        # footer with pyarrow), so write the fixture the same way
        pq.write_table(
            pa.Table.from_pylist([r.asDict() for r in docs.collect()]),
            os.path.join(td, "documents.parquet"),
        )
        out = {
            r["source"]: r
            for r in flt.repeated_chunk_stats(spark, td).collect()
        }
    row = out["s"]
    assert row["n_docs"] == 3
    # doc1: 1 chunk, doc2: 1 chunk (partial tail dropped), doc3: 2 chunks
    assert row["total_chunks"] == 4
    # only the doc1/doc2 shared chunk's two instances are cross-doc shared
    assert row["shared_chunks"] == 2

def test_domain_of_agrees_with_urllib_reference(spark):
    """Differential check: the JVM-regex host extraction must agree with
    Python's urllib.parse over a structured URL corpus (schemes, ports,
    userinfo-free hosts, queries, fragments, traps)."""
    from urllib.parse import urlparse

    hosts = ["example.com", "a.b.c.example.org", "localhost", "x--y.co.uk",
             "sub.domain.example", "site7.tracker.example"]
    paths = ["", "/", "/a/b", "/a?q=1", "/a#frag", "/a/b?q=1&r=2#z"]
    schemes = ["http", "https", "ftp", "ws+ssl"]
    urls = [f"{s}://{h}{p}" for s in schemes for h in hosts for p in paths]
    urls += [f"https://{h}:8443/x" for h in hosts]

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["host"]
        for r in df.select("url", domain_of("url").alias("host")).collect()
    }
    for u in urls:
        expect = (urlparse(u).hostname or "").lower()
        assert got[u] == expect, (u, got[u], expect)

def test_registrable_domain_agrees_with_suffix_reference(spark):
    hosts = ["a.b.c.d.example.com", "example.com", "com", "x.y", "single",
             "deep.sub.tracker.example"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select("host", registrable_domain("host").alias("reg")).collect()
    }
    for h in hosts:
        parts = h.split(".")
        expect = h if len(parts) <= 2 else ".".join(parts[-2:])
        assert got[h] == expect

def _cdc_chunks(spark, docs_rows):
    """Run the CDC boundary/segmentation logic standalone over literal
    (doc_id, text) rows, returning {(doc_id, chunk_hash)} instances."""
    from pyspark.sql import Window, functions as F

    from kin_data_pipeline_spark.queries.filtering import _CDC_G
    from kin_data_pipeline_spark.queries.llmops import _h32

    df = spark.createDataFrame(docs_rows, "doc_id long, text string")
    tok = df.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("i", "w"),
    )
    flagged = tok.withColumn("bnd", ((_h32(F.col("w")) % _CDC_G) == 0).cast("int"))
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("chunk_id", F.sum("bnd").over(w_doc))
    chunks = numbered.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s["w"],
                ),
            )
        ).alias("c")
    )
    return {(r["doc_id"], r["c"]) for r in chunks.collect()}

def test_cdc_chunking_resynchronizes_after_insertion(spark):
    # THE property content-defined chunking exists for: prepend one token
    # to a long document and the chunk set must stay almost identical
    # (boundaries re-synchronize at the first content-defined cut), where
    # fixed-width chunking would shift every boundary and share ~nothing.
    import hashlib

    words = [
        "tok%d" % (int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 97)
        for i in range(400)
    ]
    base = " ".join(words)
    edited = "inserted " + base
    orig = {c for _d, c in _cdc_chunks(spark, [(1, base)])}
    new = {c for _d, c in _cdc_chunks(spark, [(1, edited)])}
    shared = len(orig & new)
    # everything after the first boundary following the edit is identical;
    # with ~400/16 = ~25 chunks, at most the first chunk differs
    assert shared >= len(orig) - 1, (len(orig), len(new), shared)
    # and the insertion produced at least one NEW chunk hash
    assert new - orig

def test_countmin_overcount_invariant_holds_for_every_token(spark, sf_dir):
    # est >= exact must hold for ALL tokens, not just the registered
    # probes: rebuild the sketch, probe the full vocabulary, assert the
    # guarantee corpus-wide (the count-min correctness property).
    from pyspark.sql import functions as F

    from kin_data_pipeline_spark.queries.llmops import (
        _CMS_ROWS,
        _cms_bucket_col,
        doc_tokens,
    )

    tok = doc_tokens(spark, sf_dir).select("w")
    cells = None
    for i in range(len(_CMS_ROWS)):
        part = tok.select(
            F.lit(i).alias("row_id"), _cms_bucket_col(i, F.col("w")).alias("bucket")
        )
        cells = part if cells is None else cells.unionAll(part)
    sketch = cells.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("exact_cf"))
    pc = None
    for i in range(len(_CMS_ROWS)):
        part = vocab.select(
            "w", "exact_cf", F.lit(i).alias("row_id"),
            _cms_bucket_col(i, F.col("w")).alias("bucket"),
        )
        pc = part if pc is None else pc.unionAll(part)
    est = (
        pc.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("w", "exact_cf")
        .agg(F.min("cnt").alias("est_cf"))
    )
    bad = est.filter(F.col("est_cf") < F.col("exact_cf")).count()
    assert bad == 0
