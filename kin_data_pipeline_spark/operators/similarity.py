"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk``  — brute-force exact top-k: broadcast the (small) query
  set, stream the corpus once. The correctness baseline; O(|Q|·N) dot
  products, all JVM-side (zip_with/aggregate higher-order functions).
- ``lsh_topk``     — random-hyperplane (sign) LSH bucketing: corpus and
  queries hash to sign-bit buckets; only matching buckets are scanned,
  with multi-probe (Hamming-1 neighbors) to recover recall. The scale
  path: shuffle keys are bucket ids, never a cross join.

Hyperplanes come from a seeded deterministic generator so plans are
reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )

def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    emb = F.col(vec_col).cast("array<double>")
    return df.withColumn("__emb", emb).withColumn("__nrm", F.sqrt(_dot(emb, emb)))

def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k. ``queries`` must be small enough to
    broadcast (the standard ANN-evaluation shape)."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__emb").alias("c_emb"),
        F.col("__nrm").alias("c_nrm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__emb").alias("q_emb"),
        F.col("__nrm").alias("q_nrm"),
    )
    sims = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from SHA-256."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()[:8]
            (u,) = struct.unpack(">q", h)
            vals.append(u / float(2**63))  # [-1, 1)
        planes.append(vals)
    return planes

def _bucket_expr(vec_col, planes: list[list[float]]):
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket

def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    dim: int | None = None,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via sign-bit LSH bucketing.

    Candidates = corpus vectors in the query's bucket (plus all Hamming-1
    buckets when ``multiprobe``). 2^n_planes buckets; shuffle is an
    equi-join on the bucket id — linear, AQE-friendly, no cross join.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__emb").alias("c_emb"),
        F.col("__nrm").alias("c_nrm"),
        _bucket_expr(F.col("__emb"), planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__emb").alias("q_emb"),
        F.col("__nrm").alias("q_nrm"),
        _bucket_expr(F.col("__emb"), planes).alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes)).drop("q_bucket")
    else:
        q = q.withColumnRenamed("q_bucket", "bucket")
    sims = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
            "sim"
        ),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )
