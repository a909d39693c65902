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

from kin_data_pipeline_spark.operators.dedup import within_list_pairs

def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )

def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast to double + attach the L2 norm; NULL vectors are dropped —
    similarity is undefined for them, and downstream sign-LSH would hash
    every NULL to the same bucket (a quadratic pair blowup at scale)."""
    emb = F.col(vec_col).cast("array<double>")
    return (
        df.filter(F.col(vec_col).isNotNull())
        .withColumn("__emb", emb)
        .withColumn("__nrm", F.sqrt(_dot(emb, emb)))
    )

#: Target sampled-centroid count for the IVF family. Fixed and small so the
#: centroid broadcast is bounded BY CONSTRUCTION at any corpus size and the
#: N x K assignment pass stays linear in N. (The round-4 stride-31 scheme
#: made K grow as N/31: at 10x data the assignment did 100x the dot
#: products — the sf1 superlinearity sweep's top-4 flags, all one cause.)
IVF_CENTROID_TARGET = 64

def ivf_centroid_stride(corpus: DataFrame, target: int = IVF_CENTROID_TARGET) -> int:
    """Data-dependent centroid stride: ``max(1, N // target)`` keeps the
    deterministic sample (``id % stride == 0``) at ~target..2·target
    centroids at any N. One bounded count() action on the driver — the
    same arithmetic the SQL oracles embed as a scalar subquery
    (``(SELECT GREATEST(1, COUNT(*) // target) FROM embeddings)``)."""
    return max(1, corpus.count() // target)

def _normalized(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vid, emb, nrm) projection of with_norm — the frame every IVF-family
    stage consumes. Built ONCE per operator call and threaded through
    ``assign_cells`` so assignment and probing share a single corpus scan +
    normalization pass instead of re-deriving it (the self-join recompute
    trap, at 100 TB = a second full corpus read)."""
    return with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vid"), F.col("__emb").alias("emb"), F.col("__nrm").alias("nrm")
    )

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

def _bucket_expr(vec_sql: str, planes: list[list[float]]):
    """Sign-bit bucket id for ``vec_sql`` (a SQL column reference) against
    ``planes``, built as ONE ``F.expr`` string. Literal construction cost
    lives on the driver: materializing each plane via ``F.lit(list)`` costs
    one gateway round-trip per element (~1.5s for 4 bands × 8 planes × 64
    dims, measured), while a single SQL string ships all bands·planes·dim
    float literals in one call and lets the JVM parser fold them. The
    arithmetic is byte-identical to the Column form: zip_with multiply,
    left-fold add over double literals (``D`` suffix pins DoubleType)."""
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(f"{v!r}D" for v in plane)
        dot = (
            f"aggregate(zip_with({vec_sql}, array({lits}), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(terms))

def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bands: int = 4,
    n_planes: int = 6,
    seed: int = 42,
    broadcast_embeddings: bool = True,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH.

    The all-pairs dedup analog of ``lsh_topk``: every vector hashes to one
    bucket per band (independent hyperplane sets, seed+band), candidate
    pairs are the within-bucket pairs of any band. Pair forming is a
    grouped bucket-list expansion — one groupBy on ``(band, bucket)`` and
    a higher-order-function pair blowup per list — NOT a bucketed
    self-join: the self-join form evaluates the whole hyperplane-hashing
    chain (n_bands·n_planes dot products per row) once per join side,
    doubling the dominant cost, while the grouped form traverses it once.
    Candidates carry only the two ids out of the expansion and are deduped
    BEFORE the exact-cosine verify, so each unique pair pays for exactly
    one dot product regardless of how many bands it collides in;
    embeddings are re-attached by id afterwards.

    Scale notes: per-band bucket occupancy is ~N/2^n_planes, so raise
    ``n_planes`` with corpus size to keep the within-bucket pair expansion
    bounded; ``n_bands`` buys recall linearly at the cost of one extra
    bucket copy per band. ``bucket_cap`` drops buckets holding more than
    that many vectors before any list is buffered (the skew guard for
    adversarial corpora — mirrors ``jaccard_pairs_grouped(df_cap=...)``);
    the aggregation buffer itself is spillable. ``broadcast_embeddings``
    suits corpora whose (id, vector) table fits the broadcast budget; at
    100 TB set it False and the re-attach becomes a linear shuffle join
    on id.
    """
    e = with_norm(df, vec_col).select(
        F.col(id_col).alias("vid"), F.col("__emb").alias("emb"), F.col("__nrm").alias("nrm")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _bucket_expr(
                    "emb", _hyperplanes(_dim_of(df, vec_col), n_planes, seed + b)
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    bucketed = e.withColumn("bb", F.explode(bands)).select(
        "vid", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    lists = bucketed.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("vid")).alias("vids"),
        F.count(F.lit(1)).alias("occ"),
    )
    if bucket_cap is not None:
        lists = lists.filter(F.col("occ") <= bucket_cap)
    pair = within_list_pairs(
        "vids", lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))
    ).alias("p")
    cand = lists.select(pair).select("p.id_a", "p.id_b").distinct()
    ea = e.select(F.col("vid").alias("id_a"), F.col("emb").alias("ea"), F.col("nrm").alias("na"))
    eb = e.select(F.col("vid").alias("id_b"), F.col("emb").alias("eb"), F.col("nrm").alias("nb"))
    if broadcast_embeddings:
        ea, eb = F.broadcast(ea), F.broadcast(eb)
    sims = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("sim"),
        )
    )
    return sims.filter(F.col("sim") >= threshold)

_DIM_CACHE: dict[tuple, int] = {}

def clear_dim_cache() -> None:
    """Reset the dimensionality probe cache (call after overwriting a
    vector table in place with different-dimension embeddings)."""
    _DIM_CACHE.clear()

def _dim_of(df: DataFrame, vec_col: str) -> int:
    # Probe a NON-NULL row: the first row's vector being NULL must not
    # decide the dimensionality (a dim-1 guess would zip_with-pad real
    # vectors with NULLs and collapse every bucket to 0). NULL vectors
    # themselves are dropped by with_norm before hashing.
    #
    # The probe is a driver action, so composed ANN pipelines (assign +
    # probe + verify over the same corpus) would otherwise re-run it per
    # build; cache by (session, plan identity, column). Benign under
    # threads: racers compute the same value.
    #
    # Staleness contract: the cache assumes a plan's dimensionality is
    # stable for the session. Overwriting a table in place with vectors of
    # a DIFFERENT dimension makes the same plan hash resolve to the old
    # dim — call clear_dim_cache() after such a reload (or use a fresh
    # session). The cache is size-bounded so a long-lived driver composing
    # many distinct plans cannot grow it without limit.
    key = (
        df.sparkSession.sparkContext.applicationId,
        df.semanticHash(),
        vec_col,
    )
    hit = _DIM_CACHE.get(key)
    if hit is not None:
        return hit
    if len(_DIM_CACHE) >= 1024:
        _DIM_CACHE.clear()
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if row is None:
        # truly empty corpus: any positive dim keeps the hyperplane
        # expressions type-correct; no rows ever evaluate them, so the
        # result is the correctly-shaped empty frame, not a driver crash.
        # Not cached — the same plan could be non-empty later in a session
        # (e.g. after an incremental load).
        return 1
    _DIM_CACHE[key] = len(row[0])
    return _DIM_CACHE[key]

def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    centroid_stride: int | None = None,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) cell probing.

    Centroids are sampled deterministically from the corpus itself
    (``id % centroid_stride == 0`` — no training step, engine-reproducible;
    stride defaults to ``ivf_centroid_stride``, which keeps K bounded at
    ~IVF_CENTROID_TARGET at ANY corpus size). Every vector joins its
    nearest centroid's inverted list (one N×K broadcast pass — linear in N
    since K is fixed); each query probes its ``nprobe`` nearest cells and
    scores only those lists exactly.

    The scale shape: assignment is a broadcast nested-loop over the
    bounded centroid set, the probe is an equi-join on centroid id, and
    cell occupancy (~N/K) bounds every per-key expansion; pair-forming
    consumers cap it further (``cell_cap``).
    """
    if centroid_stride is None:
        centroid_stride = ivf_centroid_stride(corpus)
    e = _normalized(corpus, id_col, vec_col)
    cent = e.filter(F.col("vid") % centroid_stride == 0).select(
        F.col("vid").alias("cid"), F.col("emb").alias("cemb"), F.col("nrm").alias("cnrm")
    )
    sim_to_cent = _dot(F.col("emb"), F.col("cemb")) / (F.col("nrm") * F.col("cnrm"))
    rank_w = Window.partitionBy("vid").orderBy(F.desc("csim"), F.asc("cid"))
    # corpus→cell assignment: the shared max_by hash-aggregate operator,
    # fed the SAME normalized frame (one corpus scan serves both sides)
    assign = assign_cells(corpus, id_col, vec_col, centroid_stride, normalized=e)
    qe = with_norm(queries, vec_col).select(
        F.col(id_col).alias("vid"), F.col("__emb").alias("emb"), F.col("__nrm").alias("nrm")
    )
    probes = (
        qe.crossJoin(F.broadcast(cent))
        .withColumn("csim", sim_to_cent)
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vid").alias("query_id"), "cid")
    )
    inv = e.join(assign, "vid").select(
        F.col("vid").alias("neighbor_id"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        "cid",
    )
    q_side = probes.join(
        qe.select(
            F.col("vid").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        ),
        "query_id",
    )
    sims = (
        inv.join(F.broadcast(q_side), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )

def assign_cells(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_stride: int | None = None,
    normalized: DataFrame | None = None,
) -> DataFrame:
    """Nearest-centroid cell assignment with deterministically sampled
    centroids (``id % centroid_stride == 0`` — the IVF scheme, no training
    step; stride defaults to the bounded-K ``ivf_centroid_stride``).
    Returns ``(vid, cid)``. The cross join is only against the bounded
    broadcast centroid set; everything else is linear. Callers that already
    hold the ``_normalized`` frame pass it via ``normalized`` so assignment
    shares their corpus scan instead of re-deriving it.
    """
    if centroid_stride is None:
        centroid_stride = ivf_centroid_stride(corpus)
    e = normalized if normalized is not None else _normalized(corpus, id_col, vec_col)
    cent = e.filter(F.col("vid") % centroid_stride == 0).select(
        F.col("vid").alias("cid"), F.col("emb").alias("cemb"), F.col("nrm").alias("cnrm")
    )
    sim_to_cent = _dot(F.col("emb"), F.col("cemb")) / (F.col("nrm") * F.col("cnrm"))
    # argmax as a hash aggregate, not a row_number window: max_by over the
    # lexicographic struct (csim, -cid) == ORDER BY csim DESC, cid ASC
    # LIMIT 1 per vid, but partial aggregation collapses the K candidate
    # rows per vector map-side — no corpus-wide sort shuffle at 100 TB.
    return (
        e.crossJoin(F.broadcast(cent))
        .withColumn("csim", sim_to_cent)
        .groupBy("vid")
        .agg(F.expr("max_by(cid, struct(csim, -cid))").alias("cid"))
    )

def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    centroid_stride: int | None = None,
    cell_cap: int | None = None,
    broadcast_embeddings: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the corpus into
    centroid cells, then verify exact cosine only WITHIN each cell.

    This is the embedding analog of blocked dedup (Abbas et al., "SemDeDup",
    arXiv:2303.09540, public method): the quadratic pair space is restricted
    to cells of expected occupancy ~stride, so total pair work is
    O(N · stride) instead of O(N²). Pair forming reuses the grouped
    bucket-list expansion shape from ``lsh_near_dup_pairs`` (one groupBy on
    the cell id, pairs blown up JVM-side from the sorted id list, deduped
    ids only — embeddings re-attached by id for the verify). ``cell_cap``
    drops cells above that occupancy before any list is buffered (skew
    guard for degenerate corpora where many vectors share a centroid).
    ``broadcast_embeddings`` defaults to False — the scale-safe shuffled
    equi-join re-attach; set it True only when the (id, vector) table fits
    the broadcast budget (it saves two shuffles at test/bench scale).

    Returns ``(id_a, id_b, cid, sim)`` with ``id_a < id_b``.
    """
    e = _normalized(df, id_col, vec_col)
    assign = assign_cells(df, id_col, vec_col, centroid_stride, normalized=e)
    lists = assign.groupBy("cid").agg(
        F.array_sort(F.collect_list("vid")).alias("vids"),
        F.count(F.lit(1)).alias("occ"),
    )
    if cell_cap is not None:
        lists = lists.filter(F.col("occ") <= cell_cap)
    pair = within_list_pairs(
        "vids", lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))
    ).alias("p")
    cand = lists.select(F.col("cid"), pair).select("cid", "p.id_a", "p.id_b")
    ea = e.select(F.col("vid").alias("id_a"), F.col("emb").alias("ea"), F.col("nrm").alias("na"))
    eb = e.select(F.col("vid").alias("id_b"), F.col("emb").alias("eb"), F.col("nrm").alias("nb"))
    if broadcast_embeddings:
        ea, eb = F.broadcast(ea), F.broadcast(eb)
    sims = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            "cid",
            (_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("sim"),
        )
    )
    return sims.filter(F.col("sim") >= threshold)

def semantic_dedup_survivors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    centroid_stride: int | None = None,
    cell_cap: int | None = None,
    broadcast_embeddings: bool = False,
) -> DataFrame:
    """Greedy min-id survivor set under semantic dedup: a vector is DROPPED
    iff some same-cell vector with a SMALLER id is cosine-similar above the
    threshold. Since pairs carry ``id_a < id_b``, the dropped set is exactly
    ``distinct id_b`` — one anti join, no iteration.

    Rows with a NULL embedding can never be dropped (similarity is
    undefined for them) and therefore ARE survivors — the id universe is
    taken from ``df`` itself, not from the norm-filtered pair substrate.

    Deliberately NOT transitive (a~b, b~c with a≁c drops both b and c even
    though b — c's only partner — was itself dropped): the greedy policy is
    deterministic, single-pass, and SQL-expressible; transitive-closure
    dedup is ``operators.dedup.connected_components_star`` composed over
    these pairs when cluster-level semantics are wanted.
    """
    pairs = semantic_dedup_pairs(
        df, id_col, vec_col, threshold, centroid_stride, cell_cap,
        broadcast_embeddings,
    )
    ids = df.select(F.col(id_col).alias("vid"))
    dropped = pairs.select(F.col("id_b").alias("vid")).distinct()
    return ids.join(dropped, "vid", "left_anti").select(F.col("vid").alias(id_col))

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
        dim = _dim_of(corpus, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__emb").alias("c_emb"),
        F.col("__nrm").alias("c_nrm"),
        _bucket_expr("__emb", planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__emb").alias("q_emb"),
        F.col("__nrm").alias("q_nrm"),
        _bucket_expr("__emb", planes).alias("q_bucket"),
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

def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column, exact enough
    to verify across engines (the real-centroid upgrade of the stride-based
    IVF/SemDeDup assignment).

    Exactness design (the BPE-training playbook applied to vectors):

    - vectors quantize to integers: ``floor(x * scale + 0.5)`` — the same
      fixed-order IEEE expression on any engine, so the working data is
      BIGINT from the first step;
    - centroids stay integers: the rounded mean ``floor((2s + c) / (2c))``
      over exact integer sums (s) and counts (c) — again one IEEE division
      + floor, identical everywhere;
    - assignment is a total order: argmin of (squared L2 distance, k), so
      ties break to the smallest cluster id deterministically.

    Scale shape, per iteration: the K×dim centroid table is a BOUNDED
    driver probe (K·dim values — constants, not data; the documented
    merge-table pattern from BPE apply), embedded as literal arrays so the
    assignment is a single codegen'd fold over the cached quantized corpus
    — no join, no shuffle. The update is ONE linear shuffle: posexplode to
    (cluster, pos) partial sums. Empty clusters keep their previous
    centroid. Initial centroids are the k smallest ids' vectors.

    Returns the final assignment: (id, cluster int, dist bigint) where
    dist is the squared integer distance to the assigned centroid.
    """
    q = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.floor(x * float(scale) + F.lit(0.5)),
            ).alias("__q"),
        )
        .localCheckpoint(eager=False)  # scanned once per iteration
    )
    init = {
        r["__id"]: list(r["__q"])
        for r in q.filter(F.col("__id") < k).collect()
    }
    cents = {kk: init[kk] for kk in sorted(init)}

    def _assign(centroids: dict[int, list[int]]) -> DataFrame:
        # One nested-array LITERAL + transform-with-index instead of K
        # expanded struct candidates of dim literal nodes each: the old
        # form re-built (and re-codegen-compiled) a K×dim expression tree
        # every iteration — at k=8/dim=64 that compile dominated the
        # iteration (measured ~1s/round at sf0.1); the literal form keeps
        # the plan tiny and data-driven. Same arithmetic, same (dist, k)
        # total-order tie-break, byte-identical assignments.
        keys = list(centroids)
        cent_lit = F.lit([[int(m) for m in centroids[kk]] for kk in keys])
        key_lit = F.lit([int(kk) for kk in keys])
        cand = F.transform(
            cent_lit,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with("__q", c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.get(key_lit, i).cast("int").alias("k"),
            ),
        )
        best = F.sort_array(cand).getItem(0)
        return q.select(
            "__id", "__q", best["k"].alias("cluster"), best["dist"].alias("dist")
        )

    for _ in range(iters):
        asg = _assign(cents)
        # bounded probe: K·dim (cluster, pos) rows — constants, not data
        sums = (
            asg.select("cluster", F.posexplode("__q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        import math

        by_k: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_k.setdefault(r["cluster"], {})[r["pos"]] = (int(r["s"]), int(r["c"]))
        for kk in cents:
            if kk in by_k:
                cents[kk] = [
                    # mirror of the oracle's FLOOR((2s + c) / (2c)): python
                    # float division IS the same IEEE double division
                    math.floor((2 * by_k[kk][p][0] + by_k[kk][p][1]) / (2 * by_k[kk][p][1]))
                    for p in range(len(cents[kk]))
                ]
    # final assignment under the T-times-updated centroids
    return _assign(cents).select("__id", "cluster", "dist")
