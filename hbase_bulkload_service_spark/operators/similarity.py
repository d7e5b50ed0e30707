"""Similarity search over embedding columns (north-star surface):
brute-force cosine top-k baseline + IVF-style cell-probed variant.

Scale posture:
- brute force is the correctness baseline: broadcast the (small) query set
  against the corpus — a map-side cross product with a per-row fold, then
  a top-k window. At 100 TB the corpus side stays partitioned; only
  queries broadcast.
- IVF: assign every vector to its nearest centroid (deterministic
  pseudo-centroids here; plug in k-means at scale), bucket the corpus by
  cell, and probe only nprobe cells per query — turning ANN into a
  partition-pruned equi-join on cell id.

Determinism: dot products are sequential left-to-right folds over the
array (``aggregate``), elements cast to double first — bit-identical to
DuckDB's ``list_reduce`` fold; outputs expose ``floor(cos * 1e6)`` so the
oracle hash never sees float formatting drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hbase_bulkload_service_spark.session import local_frame, pinned_width


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_micros(a: Column, b: Column) -> Column:
    """cosine scaled to integer micros (floor) — cross-engine-stable."""
    return F.floor(cosine(a, b) * 1000000).cast("long")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding itself).
    queries: (query_id, qvec). Ties broken by neighbor id."""
    q = F.broadcast(queries)
    scored = (
        q.crossJoin(embeddings)
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_micros(F.col("qvec"), F.col(vec_col)).alias("cos_micros"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micros").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_micros")
    )


def pseudo_centroids(embeddings: DataFrame, every: int = 50) -> DataFrame:
    """Deterministic centroid set: every Nth vector by id (k-means init
    stand-in; swap for ml.clustering.KMeans at scale — the IVF plumbing is
    identical)."""
    return embeddings.filter(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (cos desc, centroid asc).
    Broadcast the centroid table; one window per vector."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        cosine_micros(F.col("embedding"), F.col("cvec")).alias("cos_micros"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_micros").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"), "cos_micros")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold_micros: int,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, north star):
    all (a, b) with a < b and cosine >= threshold.

    Scale path: block by IVF cell (nearest centroid) so the O(n²) pair
    space becomes per-cell — an equi-join on cell id (one shuffle keyed by
    cell) followed by an exact cosine verify inside each cell. With
    centroids=None the exact brute-force baseline runs instead (cross
    product — validation-scale only). Blocking misses cross-cell pairs
    (the standard ANN recall trade); raise the centroid count or assign
    to multiple cells to buy recall with cost."""
    a = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    if centroids is not None:
        assign = ivf_assign(embeddings, centroids).select(id_col, "cell")
        # numbered repartition on the join key: the in-cell cosine verify
        # is byte-small but CPU-heavy, and AQE's byte-based coalescing
        # serializes it onto one task otherwise (the q36/q102 trap —
        # r05 stage audit caught a 1-task 1 s verify stage here)
        w = pinned_width(embeddings.sparkSession)
        a = a.join(assign.withColumnRenamed(id_col, "vec_a"), "vec_a").repartition(
            w, "cell"
        )
        b = b.join(assign.withColumnRenamed(id_col, "vec_b"), "vec_b").repartition(
            w, "cell"
        )
        pairs = a.join(b, "cell").filter(F.col("vec_a") < F.col("vec_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    return pairs.select(
        "vec_a",
        "vec_b",
        cosine_micros(F.col("va"), F.col("vb")).alias("cos_micros"),
    ).filter(F.col("cos_micros") >= threshold_micros)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: per query, rank centroids, keep nprobe cells, search
    only vectors assigned to those cells. Same output shape as brute force
    (recall < 1.0 by design — that's the scale trade)."""
    assign = ivf_assign(embeddings, centroids)
    qcells_scored = queries.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "centroid_id",
        cosine_micros(F.col("qvec"), F.col("cvec")).alias("qc_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qc_cos").desc(), F.col("centroid_id"))
    probe = (
        qcells_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("cell"))
    )
    corpus = embeddings.join(assign.select("vec_id", "cell"), "vec_id")
    scored = (
        probe.join(F.broadcast(queries), "query_id")
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_micros(F.col("qvec"), F.col("embedding")).alias("cos_micros"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_micros").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_micros")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Real k-means centroids for IVF — the scale path that
    :func:`pseudo_centroids` stands in for. Distributed Lloyd iterations
    via ml.clustering.KMeans (map-side partial sums per partition, one
    reduce per iteration); the returned (centroid_id, cvec) table drops
    into :func:`ivf_assign` / :func:`ivf_topk` unchanged. Seeded ⇒
    deterministic on fixed data, so tests can pin exact results."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    X = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=10).fit(X)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return local_frame(
        embeddings.sparkSession, rows, "centroid_id int, cvec array<float>"
    )


def label_centroids(embeddings: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Per-label centroid accumulators in fixed point — the k-means /
    IVF-training primitive (one Lloyd's-iteration reduce) as a first-class
    distributed aggregation: ``(label, pos, n, sum_micros)`` where
    ``sum_micros = Σ floor(v * scale)`` over the label's vectors at that
    dimension. Centroid = sum/n, left to the caller so no division mode
    crosses the oracle boundary.

    Scale shape: posexplode fans each vector to its dims, then ONE hash
    aggregate keyed (label, pos) — map-side partial combine reduces the
    exchange to |labels| × dim rows per task regardless of corpus size.
    This is exactly how the IVF/k-means scale path recomputes centroids at
    100 TB: no driver-side vectors, no collect."""
    e = embeddings.select("label", F.posexplode("embedding").alias("pos", "v"))
    return e.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("v").cast("double") * scale).cast("long")).alias(
            "sum_micros"
        ),
    )


# ---------------------------------------------------------------------------
# SRP-LSH (signed random projection / hyperplane LSH) — ANN bucketing for
# cosine similarity; complements MinHash (sets) and IVF (trained cells)
# ---------------------------------------------------------------------------

def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible across engines
    and sessions with no RNG state. Plane p, dim d gets +1 when the first
    hex nibble of md5(f"{p}:{d}") is even. Rademacher (±1) projections
    satisfy the same Johnson-Lindenstrauss bounds as Gaussian ones, and
    make the dot product EXACT in IEEE (sign flips only, no rounding) —
    which is what lets the oracle reproduce bucket assignment bit-for-bit.
    """
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_sig_col(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """The SRP signature as a Column expression — ONE expression looping
    over a plane-matrix literal (transform over array<array<double>>)
    instead of n_planes unrolled fold expressions: identical
    arithmetic/order per plane, ~3× faster measured — the unrolled form's
    whole-stage codegen blows up with n_planes × dim literal nodes. Bit
    weights fold as exact small doubles (2^p < 2^53), cast to long at the
    end."""
    planes = srp_planes(n_planes, dim)
    w_matrix = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    pow_weights = F.array(*[F.lit(float(1 << p)) for p in range(n_planes)])
    v = F.transform(vec, lambda x: x.cast("double"))
    dots = F.transform(
        w_matrix,
        lambda w: F.aggregate(
            F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        ),
    )
    return F.aggregate(
        F.zip_with(
            dots, pow_weights, lambda d, pw: F.when(d >= 0, pw).otherwise(F.lit(0.0))
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ).cast("long")


def srp_signature(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH bucket assignment for cosine ANN: ``signature`` packs the sign
    bit of ⟨v, plane_p⟩ for each of ``n_planes`` hyperplanes; vectors with
    equal signatures land in one candidate bucket (P[bit match] =
    1 - θ/π). Output adds the bucket population so callers can see the
    candidate-set size a probe would scan.

    Scale shape: signatures are a pure map (plane matrix is a literal in
    the plan — broadcast-free, ~n_planes×dim doubles of codegen
    constants); the bucket count is one hash aggregate on an 8-byte key.
    Probe-time ANN = equi-join on ``signature`` (optionally multi-probe:
    flip k bits) — a keyed shuffle join, never a cross join. The dot
    product folds left-to-right (F.aggregate), so the float sum is
    reproducible cross-engine.
    """
    out = embeddings.withColumn("signature", srp_sig_col(F.col(vec_col), n_planes, dim))
    from pyspark.sql import Window

    return out.select(
        "vec_id",
        "label",
        "signature",
        F.count("*").over(Window.partitionBy("signature")).alias("bucket_n"),
    )


def srp_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    k: int = 3,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """SRP-LSH probe-time ANN top-k: candidates are vectors whose bucket
    signature is within ``max_hamming`` bit flips of the query's (0 = the
    query's own bucket, 1 = multi-probe over n_planes+1 buckets — the
    standard recall lever: P[sig match] falls as (1-θ/π)^n_planes, and
    probing Hamming-1 neighbors recovers most single-bit misses for a
    (n_planes+1)× candidate cost, still ≪ brute force).

    Scale shape: signatures are a pure map; probing explodes each query
    into ≤ n_planes+1 signature keys; candidates come from an EQUI-join
    on the 8-byte signature (keyed shuffle, never a cross join); exact
    cosine + per-query window top-k rank the survivors. Same output shape
    and tie-breaking as brute_force_topk / ivf_topk (recall < 1.0 by
    design — pinned by tests/test_analytics_ext.py).
    """
    if not 0 <= max_hamming <= 1:
        raise ValueError("max_hamming supports 0 (own bucket) or 1 (multi-probe)")
    corpus = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        srp_sig_col(F.col(vec_col), n_planes, dim).alias("signature"),
    )
    qs = queries.select(
        F.col(qid_col),
        F.col(qvec_col),
        srp_sig_col(F.col(qvec_col), n_planes, dim).alias("qsig"),
    )
    flips = [F.lit(0)] + (
        [F.lit(1 << p) for p in range(n_planes)] if max_hamming >= 1 else []
    )
    probes = qs.withColumn("flip", F.explode(F.array(*flips))).select(
        qid_col,
        qvec_col,
        F.col("qsig").bitwiseXOR(F.col("flip")).alias("signature"),
    )
    scored = (
        probes.join(corpus, "signature")
        .filter(F.col(qid_col) != F.col(id_col))
        .select(
            qid_col,
            F.col(id_col).alias("neighbor_id"),
            cosine_micros(F.col(qvec_col), F.col(vec_col)).alias("cos_micros"),
        )
        .distinct()
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("cos_micros").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "neighbor_id", "cos_micros")
    )


def ivf_multi_assign(
    embeddings: DataFrame, centroids: DataFrame, nprobe: int = 2
) -> DataFrame:
    """Multi-cell IVF assignment — each vector lands in its ``nprobe``
    nearest cells (rank 1 = the :func:`ivf_assign` cell). This is the
    documented recall lever for cell-blocked near-dup search: two vectors
    straddling a cell boundary meet in SOME common cell with probability
    rising in nprobe, at an nprobe× index-size cost (the corpus is
    replicated per assigned cell, never pair-scanned).

    Same plan shape as single assignment: broadcast centroids, one window
    per vector, rank filter — no extra shuffle."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        cosine_micros(F.col("embedding"), F.col("cvec")).alias("cos_micros"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_micros").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= nprobe)
        .select(
            "vec_id",
            F.col("centroid_id").alias("cell"),
            F.col("cell_rank").cast("int").alias("cell_rank"),
            "cos_micros",
        )
    )


def k_for(n_vectors: int, cell_target: int = 50) -> int:
    """SemDeDup centroid-count rule (the published recipe, encoded):
    enough clusters that EXPECTED CELL SIZE stays at ``cell_target`` as
    the corpus grows — ``k = ceil(n / cell_target)``. Bounds the in-cell
    quadratic verify at ~cell_target² per cell; with k ∝ n the flat
    nearest-centroid scoring would itself be n·k = n²/cell_target, which
    is why :func:`semantic_dedup` assigns through a two-level coarse
    quantizer (~2·n·sqrt(k) cosines). :func:`pseudo_centroids` with
    ``every=cell_target`` realizes this rule for dense id spaces."""
    if n_vectors < 0:
        raise ValueError("n_vectors must be >= 0")
    if cell_target < 1:
        raise ValueError("cell_target must be >= 1")
    return max(1, -(-n_vectors // cell_target))


def _nearest(
    items: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    cent_id: str,
    cent_vec: str,
    out_col: str,
) -> DataFrame:
    """Per-item nearest centroid (cos desc, centroid id asc) as ONE
    broadcast cross product + a map-side-combinable max_by hash agg —
    no per-item sort window. Passes the item vector through."""
    scored = items.crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        F.col(cent_id).alias("__cid"),
        cosine_micros(F.col(vec_col), F.col(cent_vec)).alias("__cm"),
    )
    return scored.groupBy(id_col).agg(
        F.expr("max_by(__cid, struct(__cm, -__cid))").alias(out_col),
        F.first(vec_col).alias(vec_col),
    )


def semantic_dedup(
    embeddings: DataFrame,
    tau_micros: int,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then inside each
    cluster drop every vector that has a near-identical neighbor with a
    smaller id, keeping the smallest id of each semantic-duplicate group
    as its canonical representative.

    Output: one row per input vector — (vec_id, cell, dup_of, keep) where
    dup_of is the smallest lower-id in-cell neighbor with cosine >=
    tau_micros (NULL for keepers) and keep = dup_of IS NULL. Deterministic:
    winners are decided by id order, never by float ties.

    Scale shape: identical blocking to :func:`cosine_neardup_pairs` — the
    O(n^2) comparison space is confined to IVF cells (equi-join on cell,
    one keyed shuffle per side), which is exactly the SemDeDup recipe:
    k-means with enough clusters that cell size, not corpus size, bounds
    the quadratic term (:func:`k_for`). With k ∝ n the ASSIGNMENT is the
    hidden quadratic — flat nearest-centroid scoring is n·k cosines — so
    assignment goes through a TWO-LEVEL coarse quantizer (the IVF-HNSW /
    IMI coarse-assign pattern): rank the k centroids by id, take every
    ceil(sqrt(k))-th as a coarse centroid, map each centroid to its
    nearest coarse centroid, send each vector to its nearest coarse cell
    (n·sqrt(k) cosines), then score it only against that cell's
    centroids (~n·sqrt(k) more). Total ~2·n·sqrt(k) vs n·k — at k = n/50
    that is n^1.5/7 instead of n²/50, and the r05 linearity probe is the
    measured receipt. Deterministic: all argmaxes break ties by id, both
    assignment levels use the same rule, so a duplicate coarse centroid
    starves consistently (no vector NOR centroid routes to it). A vector
    whose true nearest fine centroid sits in a neighboring coarse cell
    may land one cell over — the standard coarse-quantizer recall trade,
    same lever as nprobe (:func:`ivf_multi_assign`).

    The vector rides THROUGH the assignment as a pass-through column
    instead of being re-joined onto the (id, cell) assignment, the
    verdict is folded into the pair join (LEFT, with the near-dup
    predicate in the join condition), and the assignment is
    localCheckpoint'd so its subtree runs ONCE, not once per self-join
    side (Spark does not share common subplans without explicit
    truncation)."""
    cents = centroids.select("centroid_id", "cvec")
    kdf = cents.agg(F.count("*").alias("__k"))
    # every ceil(sqrt(k))-th centroid by id rank — metadata-scale window
    # (k rows, k = n/cell_target), same discipline as plan_merges
    coarse = (
        cents.withColumn(
            "__crn", F.row_number().over(Window.orderBy("centroid_id"))
        )
        .crossJoin(F.broadcast(kdf))
        .filter(
            (F.col("__crn") - 1) % F.ceil(F.sqrt("__k")).cast("long") == 0
        )
        .select(
            F.col("centroid_id").alias("coarse_id"),
            F.col("cvec").alias("covec"),
        )
        # eager: consumed by TWO broadcasts (c2c and vcoarse) — a lazy
        # checkpoint would compute the metadata-scale window twice
        .localCheckpoint(eager=True)
    )
    c2c = _nearest(
        cents, coarse, "centroid_id", "cvec", "coarse_id", "covec", "coarse"
    ).localCheckpoint(eager=False)
    vcoarse = _nearest(
        embeddings, coarse, id_col, vec_col, "coarse_id", "covec", "coarse"
    )
    fscored = vcoarse.join(F.broadcast(c2c), "coarse").select(
        id_col,
        vcoarse[vec_col].alias(vec_col),
        F.col("centroid_id").alias("__cid"),
        cosine_micros(vcoarse[vec_col], c2c["cvec"]).alias("__cm"),
    )
    assign = fscored.groupBy(id_col).agg(
        F.expr("max_by(__cid, struct(__cm, -__cid))").alias("cell"),
        F.first(vec_col).alias(vec_col),
    # eager: the two join sides' exchanges run CONCURRENTLY in one job;
    # a lazy checkpoint materializes under both before either populates
    # the cache, double-computing the whole assignment pipeline
    # (measured: two parallel 2 s/task 5-task stages at the 10x probe)
    ).localCheckpoint(eager=True)
    # the in-cell verify is BYTE-small (ids + cells after the agg) but
    # CPU-heavy (a 64-element cosine fold per candidate pair): AQE's
    # byte-based coalescing squeezes it onto a handful of tasks (the
    # q36 trap — measured 5-task/2.9s-per-task join stages at the 10x
    # probe). A user-numbered repartition on each side's join key is
    # exempt from coalescing AND satisfies the join's distribution, so
    # the verify spreads without an extra exchange.
    a = assign.select(
        F.col(id_col).alias("vec_a"),
        F.col("cell").alias("cell_a"),
        F.col(vec_col).alias("va"),
    ).repartition(pinned_width(embeddings.sparkSession), "cell_a")
    b = assign.select(
        F.col(id_col).alias("vec_b"),
        F.col("cell").alias("cell_b"),
        F.col(vec_col).alias("vb"),
    ).repartition(pinned_width(embeddings.sparkSession), "cell_b")
    # LEFT join with the near-dup predicate IN the join condition: keepers
    # survive with vec_b NULL, so the verdict needs no third re-join of
    # the assignment (the subtree is evaluated twice, not three times)
    pairs = a.join(
        b,
        (F.col("cell_a") == F.col("cell_b"))
        & (F.col("vec_b") < F.col("vec_a"))
        & (cosine_micros(F.col("va"), F.col("vb")) >= tau_micros),
        "left",
    )
    return (
        pairs.groupBy("vec_a", "cell_a")
        .agg(F.min("vec_b").alias("dup_of"))
        .select(
            F.col("vec_a").alias(id_col),
            F.col("cell_a").alias("cell"),
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def _quantized(
    embeddings: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, vm) with vm = floor(v * scale) micros, localCheckpoint'd so
    the quantization scan runs once across iterative consumers."""
    return embeddings.select(
        id_col,
        F.transform(
            vec_col, lambda v: F.floor(v.cast("double") * scale).cast("long")
        ).alias("vm"),
    ).localCheckpoint()


def _lloyd_scored(vm: DataFrame, cdf: DataFrame, id_col: str) -> DataFrame:
    """Exact integer d2 of every vector against every (broadcast)
    centroid — the per-round scoring kernel of :func:`kmeans_lloyd`."""
    return vm.crossJoin(F.broadcast(cdf)).select(
        id_col,
        "vm",
        "cid",
        F.aggregate(
            F.zip_with("vm", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )


def _lloyd_centroids(
    spark, vm: DataFrame, k: int, iters: int, id_col: str
) -> list[tuple[int, list[int]]]:
    """``iters`` integer-exact Lloyd rounds over quantized vectors; init =
    the k lowest-id vectors, truncating centroid division, empty clusters
    keep their previous centroid. Returns the final centroid list (the
    loop body of :func:`kmeans_lloyd`, shared with :func:`ivfpq_topk`'s
    coarse quantizer)."""
    init = vm.orderBy(id_col).limit(k).collect()
    cents = [(i, list(r["vm"])) for i, r in enumerate(init)]
    for _ in range(iters):
        cdf = local_frame(spark, cents, "cid int, cvec array<long>")
        assign = (
            _lloyd_scored(vm, cdf, id_col)
            .groupBy(id_col, "vm")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select(id_col, "vm", F.col("m.cid").alias("cid"))
        )
        agg = (
            assign.select("cid", F.posexplode("vm").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(x) div count(*)").alias("c"))
            .collect()  # k*dim rows — metadata-scale, the Lloyd round-trip
        )
        new_c: dict = {}
        for r in agg:
            new_c.setdefault(r["cid"], {})[r["pos"]] = r["c"]
        cents = [
            (
                cid,
                [new_c[cid][p] for p in range(len(old))]
                if cid in new_c
                else old,  # empty cluster keeps its previous centroid
            )
            for cid, old in cents
        ]
    return cents


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact distributed Lloyd's k-means — the ITERATIVE
    counterpart of the one-round :func:`label_centroids` reduce, built so
    every round is reproducible bit-for-bit by an unrolled SQL oracle
    (same recipe as the q114 PageRank gate).

    Protocol (all integer arithmetic, no float crosses a verdict):
    vectors quantize once to ``floor(v * scale)`` micros; the initial
    centroids are the ``k`` lowest-id vectors; each round assigns every
    vector to the centroid minimizing the exact integer squared distance
    (ties -> lowest centroid id), then recomputes each centroid
    dimension as ``SUM(x) div COUNT(*)`` (truncating integer division —
    identical semantics in Spark ``div`` and DuckDB ``//``). Empty
    clusters keep their previous centroid. After ``iters`` update rounds
    the FINAL assignment is returned: (id, cluster, d2) with d2 the
    exact integer squared distance.

    Scale shape: this is textbook 100 TB k-means — the per-round
    centroid table is k x dim integers (metadata-scale), collected to
    the driver and re-broadcast each round exactly like
    ml.clustering.KMeans does; per-vector work is a broadcast crossJoin
    (k rows) scored by a codegen'd zip_with fold, then ONE map-side-
    combined min-struct agg per vector. The quantized vectors are
    localCheckpoint'd so the quantization scan runs once, not
    iters+1 times. d2 bounds: dim * (2 * scale * max|v|)^2 must fit
    int64 — at scale=1e6 that allows |v| <= ~48 for dim 64.
    """
    if k <= 0 or iters < 0:
        raise ValueError("need k > 0 and iters >= 0")
    spark = embeddings.sparkSession
    vm = _quantized(embeddings, id_col, vec_col, scale)
    cents = _lloyd_centroids(spark, vm, k, iters, id_col)
    cdf = local_frame(spark, cents, "cid int, cvec array<long>")
    return (
        _lloyd_scored(vm, cdf, id_col)
        .groupBy(F.col(id_col), "vm")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(
            id_col,
            F.col("m.cid").alias("cluster"),
            F.col("m.d2").alias("d2"),
        )
    )


def quantize_int8(
    embeddings: DataFrame,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 vector quantization — the memory lever of
    billion-vector ANN serving (4 bytes -> 1 byte per dim; quantized
    dot products stay in cheap integer SIMD). Kept integer-exact end to
    end so the oracle gate reproduces it bit-for-bit: floats quantize
    once to micros (floor(v*scale)), the per-vector scale is the max
    absolute micro value, and each code is ``(vm * 127) div qscale``
    (truncating integer division — identical in Spark `div` and DuckDB
    `//`). All-zero vectors get qscale 0 and all-zero codes.

    Output: (id, qvec array<long> of codes in [-127, 127], qscale long).
    Approximate dot(a, b) is reconstructed monotonically as
    ``dot(qa, qb) * qscale_a * qscale_b`` (the shared 127^2*scale^2
    factor cancels in ranking).
    """
    vm = F.transform(
        vec_col, lambda v: F.floor(v.cast("double") * scale).cast("long")
    )
    # project qscale ONCE in an intermediate select — Catalyst does not
    # CSE the higher-order aggregate fold across copies, so inlining it
    # in the CASE condition + divisor + output column would evaluate the
    # O(dim) fold three times per row
    return (
        embeddings.select(id_col, vm.alias("vm"))
        .select(
            id_col,
            "vm",
            F.expr(
                "aggregate(vm, CAST(0 AS BIGINT), (m, x) -> greatest(m, abs(x)))"
            ).alias("qscale"),
        )
        .select(
            id_col,
            F.expr(
                "CASE WHEN qscale = 0"
                " THEN transform(vm, x -> CAST(0 AS BIGINT))"
                " ELSE transform(vm, x -> (x * 127) div qscale)"
                " END"
            ).alias("qvec"),
            "qscale",
        )
    )


def quantized_topk(
    embeddings: DataFrame,
    k: int = 5,
    every: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k neighbors in the int8-quantized space — the
    validation baseline for quantized ANN (same role q38 plays for the
    float space; compose with the IVF/SRP blocking operators for the
    100 TB path — quantization and blocking are orthogonal levers).

    Scoring is pure integer: ``dot(qa, qb) * qscale_a * qscale_b``,
    bounded by 127^2 * dim * scale^2 < 2^63 for dim 64 at micro scale.
    Ties break by neighbor id. Queries = every Nth id (broadcast side);
    ONE broadcast nested-loop over the corpus + per-query top-k via
    window — no shuffle of the corpus beyond the final k rows/query.
    """
    q = quantize_int8(embeddings, id_col=id_col, vec_col=vec_col)
    queries = q.filter(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qa"),
        F.col("qscale").alias("sa"),
    )
    corpus = q.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("qb"),
        F.col("qscale").alias("sb"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.expr(
                    "aggregate(zip_with(qa, qb, (x, y) -> x * y),"
                    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                )
                * F.col("sa")
                * F.col("sb")
            ).alias("score_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "neighbor_id", "score_q")
    )


def ann_recall(truth: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Recall@k evaluation harness for ANN variants: per query,
    ``hits = |approx ∩ truth|`` and ``recall_ppm = hits * 1e6 div k`` —
    the quality metric every blocking/quantization trade is judged by,
    as a first-class distributed operator (integer-exact, so the whole
    evaluation — including the approximate searcher under test — can sit
    behind the oracle gate when the searcher is deterministic).

    Inputs are (query_id, neighbor_id[, ...]) top-k tables. One keyed
    equi-join on (query_id, neighbor_id) + a per-query count; queries
    with zero hits are kept via a left join from the truth's query set.
    Both sides are top-k tables (k rows/query), so this is
    metadata-scale relative to the corpus.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    t = truth.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = (
        t.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        t.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.expr(f"(coalesce(hits, 0) * 1000000) div {k}").alias(
                "recall_ppm"
            ),
        )
    )


def rank_fusion(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    k_out: int = 5,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings — the standard
    zero-tuning hybrid-search combiner (Cormack et al.): each list
    contributes ``scale div (k_rrf + rank)`` per (query, candidate) and
    candidates re-rank by the summed score. Integer throughout: the
    truncating quotient is identical cross-engine, so fused ORDER — not
    just membership — is oracle-exact. Ties by neighbor id.

    Inputs: each ranking is (query_id, rank, neighbor_id, ...); extra
    columns are dropped. Output: (query_id, rank, neighbor_id,
    rrf_score, n_lists) — n_lists = how many input rankings proposed
    the candidate (agreement diagnostic).

    Plan: union of k-bounded lists (each already tiny relative to the
    corpora that produced them) → hash agg on (query_id, neighbor_id)
    → per-query top-k window. Cost is queries x k x n_lists rows — the
    fusion itself never touches corpus-sized data; scale lives entirely
    in the upstream searchers.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    if k_rrf < 0 or k_out < 1:
        raise ValueError("k_rrf must be >= 0 and k_out >= 1")
    parts = [
        r.select(
            "query_id",
            "neighbor_id",
            F.expr(f"{scale} div ({k_rrf} + rank)").alias("__c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "neighbor_id").agg(
        F.sum("__c").alias("rrf_score"),
        F.count("*").cast("long").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_out)
        .select("query_id", "rank", "neighbor_id", "rrf_score", "n_lists")
    )


def centroid_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots, per
    class label: quantize each vector to integer micros, average per
    (label, dimension) with truncating division, and report the L1 and
    L-inf distance between the two snapshots' centroids — the cheap
    first-line monitor for "did the embedding space move" (encoder
    retrained, upstream corpus shifted, pipeline bug zeroed a field)
    before spending on ANN-recall re-evaluation. Integer end to end, so
    the drift NUMBERS are oracle-exact, not just directionally right.

    Output per label: (label, n_a, n_b, l1_micros, linf_micros); the
    distances are NULL when a side has no vectors for the label
    (drift from an absent snapshot is undefined — surface it, don't
    zero it).

    Plan: union of the two tagged scans → posexplode to (label, dim)
    → ONE hash agg keyed (label, dim) with conditional sums (map-side
    combined: the exchange carries labels x dims x 2 sums, not
    vectors) → a labels-sized final agg. 100 TB of vectors reduce at
    the combiner; nothing downstream of the first agg exceeds
    |labels| x dim rows.
    """
    tagged = emb_a.select(
        F.col(label_col).alias("lbl"), F.col(vec_col).alias("v"),
        F.lit("a").alias("side"),
    ).unionByName(
        emb_b.select(
            F.col(label_col).alias("lbl"), F.col(vec_col).alias("v"),
            F.lit("b").alias("side"),
        )
    )
    per_dim = (
        tagged.select(
            "lbl", "side", F.posexplode("v").alias("pos", "comp")
        )
        .filter(F.col("pos") < dim)
        .select(
            "lbl",
            "side",
            (F.col("pos") + 1).alias("dim"),
            F.floor(F.col("comp").cast("double") * 1_000_000)
            .cast("long")
            .alias("vm"),
        )
        .groupBy("lbl", "dim")
        .agg(
            F.sum(F.when(F.col("side") == "a", F.col("vm"))).alias("sa"),
            F.sum(F.when(F.col("side") == "b", F.col("vm"))).alias("sb"),
            F.count(F.when(F.col("side") == "a", 1)).alias("na"),
            F.count(F.when(F.col("side") == "b", 1)).alias("nb"),
        )
    )
    delta = F.abs(
        F.expr("sa div nullif(na, 0)") - F.expr("sb div nullif(nb, 0)")
    )
    return (
        per_dim.select("lbl", "na", "nb", delta.alias("d"))
        .groupBy(F.col("lbl").alias(label_col))
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.sum("d").alias("l1_micros"),
            F.max("d").alias("linf_micros"),
        )
    )


def _subdim(quant: DataFrame, m: int) -> int:
    """dim // m, validating divisibility against the actual corpus."""
    dim = len(quant.select("vm").first()["vm"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def _pq_subspaces(quant: DataFrame, m: int, d: int, id_col: str) -> DataFrame:
    """Explode quantized vectors into (id, sub, svec) subvector rows."""
    return quant.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("sub"),
                        F.slice("vm", s * d + 1, d).alias("svec"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("__e"),
    ).select(id_col, "__e.sub", "__e.svec")


def _pq_scored(cdf: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Exact integer d2 of every subvector against its subspace's
    (broadcast) codebook — the PQ twin of :func:`_lloyd_scored`."""
    return df.join(F.broadcast(cdf), "sub").select(
        id_col,
        "sub",
        "cid",
        F.aggregate(
            F.zip_with("svec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )


def _pq_codebooks(
    spark,
    quant: DataFrame,
    subs: DataFrame,
    m: int,
    k: int,
    iters: int,
    d: int,
    id_col: str,
) -> DataFrame:
    """Per-subspace integer Lloyd training (the :func:`_lloyd_centroids`
    device with the subspace as an extra group key): init = the k
    lowest-id vectors' subvectors, truncating centroid division, empty
    clusters keep their previous centroid. Returns the final codebook
    frame (sub, cid, cvec) — shared by :func:`pq_ann_topk` and
    :func:`ivfpq_topk`."""
    init = quant.orderBy(id_col).limit(k).collect()
    cents = {
        (s, i): list(r["vm"][s * d : (s + 1) * d])
        for i, r in enumerate(init)
        for s in range(m)
    }

    def cdf_of(c):
        return local_frame(spark,
            [(s, i, v) for (s, i), v in sorted(c.items())],
            "sub int, cid int, cvec array<long>",
        )

    for _ in range(iters):
        assign = (
            _pq_scored(cdf_of(cents), subs, id_col)
            .groupBy(id_col, "sub")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select(id_col, "sub", F.col("m.cid").alias("cid"))
        )
        agg = (
            assign.join(subs, [id_col, "sub"])
            .select("sub", "cid", F.posexplode("svec").alias("pos", "x"))
            .groupBy("sub", "cid", "pos")
            .agg(F.expr("sum(x) div count(*)").alias("c"))
            .collect()  # m*k*d integers — metadata-scale Lloyd round-trip
        )
        new_c: dict = {}
        for r in agg:
            new_c.setdefault((r["sub"], r["cid"]), {})[r["pos"]] = r["c"]
        cents = {
            key: [new_c[key][p] for p in range(d)] if key in new_c else old
            for key, old in cents.items()  # empty cluster keeps previous
        }
    return cdf_of(cents)


def _pq_codes(cdf: DataFrame, subs: DataFrame, id_col: str) -> DataFrame:
    """Final per-(vector, subspace) argmin code assignment."""
    return (
        _pq_scored(cdf, subs, id_col)
        .groupBy(F.col(id_col), F.col("sub"))
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(id_col, "sub", F.col("m.cid").alias("cid"))
    )


def _pq_adc_table(
    cdf: DataFrame, subs: DataFrame, qids: list, id_col: str
) -> DataFrame:
    """ADC lookup table: exact integer d2 from each query subvector to
    each of its subspace's centroids — n_queries*m*k rows."""
    qsubs = subs.filter(F.col(id_col).isin(qids)).select(
        F.col(id_col).alias("qid"), "sub", "svec"
    )
    return qsubs.join(F.broadcast(cdf), "sub").select(
        "qid",
        "sub",
        "cid",
        F.aggregate(
            F.zip_with("svec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qd2"),
    )


def pq_ann_topk(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    n_queries: int = 4,
    topk: int = 5,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): train per-subspace codebooks with
    integer-exact Lloyd rounds, encode every vector as ``m`` centroid
    codes, and answer queries by Asymmetric Distance Computation — the
    memory-bound billion-vector regime where IVF cells are still too
    big to scan raw (each vector stores m bytes, not dim floats).

    Protocol (integer-exact; the :func:`kmeans_lloyd` device with the
    subspace as an extra group key, so the SQL oracle unrolls it the
    same way): vectors quantize once to micros; each of the ``m``
    dim/m-wide subspaces trains its own size-``k`` codebook (init = the
    k lowest-id vectors' subvectors, truncating-integer centroid
    updates, (d2, cid) argmin ties, empty clusters keep their previous
    centroid); codes are the final per-subspace argmin. Queries are the
    ``n_queries`` lowest-id vectors; the ADC table holds the exact
    integer squared distance from each query subvector to each centroid,
    and the approximate distance of a corpus vector is the sum of its
    ``m`` looked-up entries. Returns the ``topk`` nearest per query
    (ties -> lowest id), the query's own vector included.

    Scale shape for 100 TB: training round-trips are k*dim integers per
    round (metadata-scale, identical to kmeans_lloyd); encoding is one
    broadcast crossJoin scored by a codegen'd zip_with fold plus ONE
    map-side-combined min-struct agg; the ADC table is n_queries*m*k
    rows BROADCAST onto the codes, so search is one map-side lookup
    join plus a (query, vector)-keyed sum — no shuffle ever carries a
    raw vector, and the per-vector search state is m longs.
    """
    if m <= 0 or k <= 0 or iters < 0:
        raise ValueError("need m > 0, k > 0, iters >= 0")
    spark = embeddings.sparkSession
    quant = _quantized(embeddings, id_col, vec_col, scale)
    d = _subdim(quant, m)
    subs = _pq_subspaces(quant, m, d, id_col)
    cdf = _pq_codebooks(spark, quant, subs, m, k, iters, d, id_col)
    codes = _pq_codes(cdf, subs, id_col)

    # ADC table: exact integer d2 from each query subvector to each centroid
    qids = [r[id_col] for r in quant.orderBy(id_col).limit(n_queries).collect()]
    qd = _pq_adc_table(cdf, subs, qids, id_col)
    ad = (
        codes.join(F.broadcast(qd), ["sub", "cid"])
        .groupBy("qid", id_col)
        .agg(F.sum("qd2").cast("long").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col(id_col))
    return (
        ad.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("qid", id_col, "adist", "rnk")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    n_cells: int = 4,
    coarse_iters: int = 1,
    m: int = 4,
    k: int = 8,
    pq_iters: int = 1,
    nprobe: int = 2,
    n_queries: int = 4,
    topk: int = 5,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN (Jegou et al. 2011 §V, the FAISS ``IVFx,PQy`` layout):
    a coarse quantizer partitions the corpus into ``n_cells`` inverted
    lists and queries scan only their ``nprobe`` nearest cells, with the
    scanned vectors represented by ``m``-byte PQ codes instead of raw
    floats — the composition that makes billion-vector search both
    memory-bound-safe (PQ, q172) and sublinear in corpus size (IVF,
    q39b). Codebooks are trained on the raw corpus (the non-residual
    IVF-PQ variant, "IVFADC w/o residual encoding" in the paper's
    terms), so the coarse and fine stages stay independently
    oracle-checkable.

    Protocol (integer-exact; every stage is a proven device): the coarse
    quantizer is :func:`_lloyd_centroids` (q118), cell assignment the
    (d2, cid) argmin; PQ codebooks/codes are :func:`_pq_codebooks` /
    :func:`_pq_codes` (q172); queries are the ``n_queries`` lowest-id
    vectors, probing their ``nprobe`` nearest cells (ties -> lowest cell
    id); the ADC distance sums the per-subspace lookups over probed
    cells only. Returns (qid, vec_id, cell, adist, rnk), rnk <= topk,
    ties -> lowest id — a query's own vector is its cell's rank 1.

    Scale shape for 100 TB: training round-trips are metadata-scale
    (k*dim integers per round); the corpus-sized stages are ONE id-keyed
    join (codes x cell assignment — both derived from the same quantized
    scan) filtered by the BROADCAST probe list (n_queries*nprobe rows),
    then the ADC lookup against the BROADCAST table and a (query,
    vector)-keyed sum. No shuffle carries a raw vector; unprobed cells'
    vectors are dropped before the ADC join, so search cost scales with
    nprobe/n_cells of the corpus, not the corpus.
    """
    if n_cells <= 0 or nprobe <= 0 or nprobe > n_cells:
        raise ValueError("need 0 < nprobe <= n_cells")
    if m <= 0 or k <= 0 or coarse_iters < 0 or pq_iters < 0:
        raise ValueError("need m > 0, k > 0, non-negative iteration counts")
    spark = embeddings.sparkSession
    quant = _quantized(embeddings, id_col, vec_col, scale)
    d = _subdim(quant, m)

    # coarse quantizer: Lloyd cells + final argmin cell assignment
    coarse = local_frame(spark,
        _lloyd_centroids(spark, quant, n_cells, coarse_iters, id_col),
        "cid int, cvec array<long>",
    )
    cells = (
        _lloyd_scored(quant, coarse, id_col)
        .groupBy(id_col, "vm")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(id_col, F.col("m.cid").alias("cell"))
    )

    # fine quantizer: per-subspace PQ codebooks + codes
    subs = _pq_subspaces(quant, m, d, id_col)
    cdf = _pq_codebooks(spark, quant, subs, m, k, pq_iters, d, id_col)
    codes = _pq_codes(cdf, subs, id_col)

    # queries probe their nprobe nearest coarse cells
    qids = [r[id_col] for r in quant.orderBy(id_col).limit(n_queries).collect()]
    qcells = _lloyd_scored(
        quant.filter(F.col(id_col).isin(qids)), coarse, id_col
    ).select(F.col(id_col).alias("qid"), F.col("cid").alias("cell"), "d2")
    wp = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cell"))
    probed = (
        qcells.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", "cell")
    )

    qd = _pq_adc_table(cdf, subs, qids, id_col)
    ad = (
        codes.join(cells, id_col)  # id-keyed: the only corpus-sized join
        .join(F.broadcast(probed), "cell")  # drops unprobed cells' vectors
        .join(F.broadcast(qd), ["qid", "sub", "cid"])
        .groupBy("qid", id_col, "cell")
        .agg(F.sum("qd2").cast("long").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col(id_col))
    return (
        ad.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("qid", id_col, "cell", "adist", "rnk")
    )


def ivfpq_residual_topk(
    embeddings: DataFrame,
    n_cells: int = 4,
    coarse_iters: int = 1,
    m: int = 4,
    k: int = 8,
    pq_iters: int = 1,
    nprobe: int = 2,
    n_queries: int = 4,
    topk: int = 5,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC proper (Jegou et al. 2011 §V.A): :func:`ivfpq_topk` with
    RESIDUAL encoding — PQ codebooks are trained on, and codes encode,
    ``vector − its cell's coarse centroid`` instead of the raw vector.
    Residuals concentrate around zero regardless of which cell a vector
    lives in, so one shared codebook quantizes every inverted list well
    — the reason FAISS's IVFADC beats the non-residual variant at equal
    code budget. The price is query-side: the ADC table must be built
    PER PROBED CELL (the query's residual differs per cell), so it has
    ``n_queries x nprobe x m x k`` entries — still metadata-scale,
    still broadcast.

    Protocol: coarse quantizer, cell assignment, probe ranking exactly
    as :func:`ivfpq_topk` (all on raw vectors); residuals are one
    broadcast join against the n_cells-row centroid table + a zip_with
    subtraction (map-side, no extra exchange); PQ training/encoding
    reuse :func:`_pq_codebooks`/:func:`_pq_codes` over the residual
    frame (init = the k lowest-id vectors' residuals). Search joins
    codes x cells against the broadcast probe list, then the broadcast
    per-(query, cell) ADC table on (qid, cell, sub, cid). Returns
    (qid, vec_id, cell, adist, rnk) — integer-exact end to end.

    Scale shape: identical to :func:`ivfpq_topk` — the only
    corpus-sized exchanges are the id-keyed codes x cells join and the
    (query, vector)-keyed ADC sum; no shuffle carries a raw vector.
    """
    if n_cells <= 0 or nprobe <= 0 or nprobe > n_cells:
        raise ValueError("need 0 < nprobe <= n_cells")
    if m <= 0 or k <= 0 or coarse_iters < 0 or pq_iters < 0:
        raise ValueError("need m > 0, k > 0, non-negative iteration counts")
    spark = embeddings.sparkSession
    quant = _quantized(embeddings, id_col, vec_col, scale)
    d = _subdim(quant, m)

    coarse = local_frame(spark,
        _lloyd_centroids(spark, quant, n_cells, coarse_iters, id_col),
        "cid int, cvec array<long>",
    )
    cells = (
        _lloyd_scored(quant, coarse, id_col)
        .groupBy(id_col, "vm")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(id_col, F.col("m.cid").alias("cell"))
    )

    # residual frame: vm - centroid(cell), map-side after one broadcast
    ccells = coarse.select(F.col("cid").alias("cell"), F.col("cvec"))
    res = (
        quant.join(cells, id_col)
        .join(F.broadcast(ccells), "cell")
        .select(
            id_col,
            F.zip_with("vm", "cvec", lambda a, b: a - b).alias("vm"),
        )
        .localCheckpoint()  # training + encoding + init reuse this scan
    )
    rsubs = _pq_subspaces(res, m, d, id_col)
    rcdf = _pq_codebooks(spark, res, rsubs, m, k, pq_iters, d, id_col)
    codes = _pq_codes(rcdf, rsubs, id_col)

    # probe ranking on RAW query vectors (as ivfpq_topk)
    qids = [r[id_col] for r in quant.orderBy(id_col).limit(n_queries).collect()]
    qcells = _lloyd_scored(
        quant.filter(F.col(id_col).isin(qids)), coarse, id_col
    ).select(F.col(id_col).alias("qid"), F.col("cid").alias("cell"), "d2")
    wp = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cell"))
    probed = (
        qcells.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select("qid", "cell")
    )

    # per-(query, cell) residuals -> per-(query, cell) ADC table
    qres = (
        quant.filter(F.col(id_col).isin(qids))
        .select(F.col(id_col).alias("qid"), "vm")
        .join(F.broadcast(probed), "qid")
        .join(F.broadcast(ccells), "cell")
        .select(
            "qid",
            "cell",
            F.zip_with("vm", "cvec", lambda a, b: a - b).alias("rvm"),
        )
    )
    qrsubs = qres.select(
        "qid",
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("sub"),
                        F.slice("rvm", s * d + 1, d).alias("svec"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("__e"),
    ).select("qid", "cell", "__e.sub", "__e.svec")
    qd = qrsubs.join(F.broadcast(rcdf), "sub").select(
        "qid",
        "cell",
        "sub",
        "cid",
        F.aggregate(
            F.zip_with("svec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qd2"),
    )

    ad = (
        codes.join(cells, id_col)  # id-keyed: the only corpus-sized join
        .join(F.broadcast(probed), "cell")
        .join(F.broadcast(qd), ["qid", "cell", "sub", "cid"])
        .groupBy("qid", id_col, "cell")
        .agg(F.sum("qd2").cast("long").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col(id_col))
    return (
        ad.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("qid", id_col, "cell", "adist", "rnk")
    )


def hard_negative_pairs(
    embeddings: DataFrame,
    threshold_micros: int,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: pairs of
    vectors that are highly similar (cosine >= threshold) but carry
    DIFFERENT labels — exactly the pairs a contrastive loss needs to see
    (easy negatives are everywhere; the hard ones hide among near
    neighbors) and, symmetrically, the label-noise audit of a corpus
    ("near-identical items labeled differently" is usually an annotation
    error).

    Scale path: the candidate space is :func:`cosine_neardup_pairs`'s
    IVF-cell blocking (equi-join on cell, never O(n²)); labels ride two
    thin id-keyed joins onto the surviving pairs (pair count << corpus
    at any sane threshold), and the label inequality filters last so
    the SAME blocked candidate set serves dedup (q42) and mining
    (q185). Output: (vec_a, vec_b, label_a, label_b, cos_micros).
    """
    pairs = cosine_neardup_pairs(
        embeddings, threshold_micros, centroids, id_col, vec_col
    )
    labels = embeddings.select(F.col(id_col), F.col(label_col))
    return (
        pairs.join(
            labels.select(
                F.col(id_col).alias("vec_a"),
                F.col(label_col).alias("label_a"),
            ),
            "vec_a",
        )
        .join(
            labels.select(
                F.col(id_col).alias("vec_b"),
                F.col(label_col).alias("label_b"),
            ),
            "vec_b",
        )
        .filter(F.col("label_a") != F.col("label_b"))
        .select("vec_a", "vec_b", "label_a", "label_b", "cos_micros")
    )


def bitext_margin_pairs(
    embeddings: DataFrame,
    centroids: DataFrame,
    k: int = 4,
    side_mod: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    Parallel Corpus Mining with Multilingual Sentence Embeddings"): mine
    translation-pair candidates between two sides of an embedding space
    as the MUTUAL nearest neighbors among blocked candidates, scored by
    the ratio margin — cosine of the pair over the mean of each side's
    top-``k`` candidate cosines.  The deterministic side split
    (``id % side_mod``: evens are the "source language", odds the
    "target") stands in for the per-language corpora; plug in real
    language ids at deployment, the plumbing is identical.

    Integer protocol: all similarities are floor-micros cosines; the
    margin is the exact integer ``(cos * 2k * 1e6) div (sum_a + sum_b)``
    (sum over each side's top-k candidate cosines; NULL when the sums
    cancel to zero) — a monotone twin of the paper's
    ``cos / ((avgA + avgB)/2)`` ratio, so ranking by it is ranking by
    the real margin.

    Scale shape for 100 TB: candidates come from the IVF-cell block
    (equi-join on cell — never the O(|A|x|B|) cross product; the
    standard ANN-kNN stand-in the paper itself uses at scale), with the
    in-cell cosine verify spread by a ``pinned_width`` numbered
    repartition (the q36/q42 AQE trap).  The top-k sums and both best
    ranks are per-vector windows OVER THE CANDIDATE SET (pair-scale,
    already blocked), and the mutual-best filter drops everything but
    ~|A| rows before the thin margin arithmetic.  No raw vector crosses
    a second shuffle after the cell join.
    """
    side_a = embeddings.filter(F.col(id_col) % side_mod == 0)
    side_b = embeddings.filter(F.col(id_col) % side_mod != 0)
    assign = ivf_assign(embeddings, centroids).select(id_col, "cell")
    w = pinned_width(embeddings.sparkSession)
    a = (
        side_a.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
        .join(assign.withColumnRenamed(id_col, "vec_a"), "vec_a")
        .repartition(w, "cell")
    )
    b = (
        side_b.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
        .join(assign.withColumnRenamed(id_col, "vec_b"), "vec_b")
        .repartition(w, "cell")
    )
    cand = a.join(b, "cell").select(
        "vec_a",
        "vec_b",
        cosine_micros(F.col("va"), F.col("vb")).alias("cos_micros"),
    )
    wa = Window.partitionBy("vec_a").orderBy(
        F.col("cos_micros").desc(), F.col("vec_b")
    )
    wb = Window.partitionBy("vec_b").orderBy(
        F.col("cos_micros").desc(), F.col("vec_a")
    )
    ranked = cand.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rb", F.row_number().over(wb)
    )
    sum_a = ranked.groupBy("vec_a").agg(
        F.sum(F.when(F.col("ra") <= k, F.col("cos_micros")).otherwise(0))
        .alias("sum_a")
    )
    sum_b = ranked.groupBy("vec_b").agg(
        F.sum(F.when(F.col("rb") <= k, F.col("cos_micros")).otherwise(0))
        .alias("sum_b")
    )
    mutual = ranked.filter((F.col("ra") == 1) & (F.col("rb") == 1))
    return (
        mutual.join(sum_a, "vec_a")
        .join(sum_b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            "cos_micros",
            "sum_a",
            "sum_b",
            F.expr(
                f"(cos_micros * {2 * k} * 1000000)"
                " div nullif(sum_a + sum_b, 0)"
            ).alias("margin_ppm"),
        )
    )


def embedding_health(
    embeddings: DataFrame,
    low_norm_micros: int = 500_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-table health audit — the data-quality gate an ANN/
    retrieval index build runs before trusting a vendor's or a training
    run's vectors: per label cohort, how many vectors are degenerate
    (zero norm — cosine undefined, they poison every similarity op),
    suspiciously low-norm (under ``low_norm_micros``), or CONSTANT
    across dimensions (a collapsed encoder emits these), plus the norm
    spread (min/max/mean micros) that catches an un-normalized mixture
    before it skews dot-product scores.

    Integer protocol: per-vector norms are floor-micros
    (``floor(sqrt(dot(v, v)) * 1e6)`` — the shared fold), the mean is
    a truncating div, and the degeneracy checks are exact counts, so
    the report hashes bit-for-bit cross-engine.

    Scale shape: one scan, all per-vector math map-side (JVM fold, no
    Python), one label-keyed map-side-combined agg; |labels| output
    rows. No joins, no windows, nothing O(n^2).
    """
    v = F.col(vec_col)
    norm_micros = F.floor(norm(v) * 1_000_000).cast("long")
    is_const = (F.array_max(v) == F.array_min(v)).cast("long")
    return (
        embeddings.select(
            F.col(label_col),
            norm_micros.alias("__nm"),
            is_const.alias("__const"),
        )
        .groupBy(label_col)
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum((F.col("__nm") == 0).cast("long")).alias("zero_norm"),
            F.sum(
                ((F.col("__nm") > 0) & (F.col("__nm") < low_norm_micros))
                .cast("long")
            ).alias("low_norm"),
            F.sum("__const").alias("const_dims"),
            F.min("__nm").alias("min_norm_micros"),
            F.max("__nm").alias("max_norm_micros"),
            F.sum("__nm").alias("__sum_nm"),
        )
        .withColumn("mean_norm_micros", F.expr("__sum_nm div n_vecs"))
        .drop("__sum_nm")
    )


def matryoshka_recall(
    embeddings: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    k: int = 5,
    n_queries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka dimension-budget recall curve (Kusupati et al. 2022,
    "Matryoshka Representation Learning"): for each prefix-dimension
    budget, the top-k neighbor overlap against the FULL-dimension
    ground truth, per query — the analysis that decides how many
    dimensions a production index actually needs (MRL embeddings are
    trained so prefixes work; this measures whether yours do).

    Protocol: queries are the first ``n_queries`` ids (deterministic);
    every (query, candidate, budget) cosine is a floor-micros prefix
    fold; per-(budget, query) top-k by (cos desc, id) — the largest
    budget IS the ground truth, so its recall row is the built-in
    1.0 control; ``recall_ppm = overlap * 1e6 div k``.

    Scale shape: ONE corpus pass scores all budgets at once (the query
    set broadcasts; per-row work is |dims| prefix folds — the
    brute-force baseline, same posture as q38: at deployment scale the
    corpus side stays partitioned and only queries broadcast); the
    rank windows run per (budget, query) over the scored stream, and
    the overlap join is k-bounded metadata.
    """
    if not dims or k < 1 or n_queries < 1:
        raise ValueError("dims, k, n_queries must be positive")
    full_d = max(dims)
    q = F.broadcast(
        embeddings.orderBy(id_col)
        .limit(n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    )
    scored = (
        embeddings.crossJoin(q)
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("dim_budget"),
                            cosine_micros(
                                F.slice(F.col("qv"), 1, d),
                                F.slice(F.col(vec_col), 1, d),
                            ).alias("cos_micros"),
                        )
                        for d in sorted(dims)
                    ]
                )
            ).alias("s"),
        )
        .select("qid", id_col, "s.dim_budget", "s.cos_micros")
    )
    w = Window.partitionBy("dim_budget", "qid").orderBy(
        F.col("cos_micros").desc(), F.col(id_col)
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("dim_budget", "qid", id_col)
    )
    gt = topk.filter(F.col("dim_budget") == full_d).select(
        F.col("qid").alias("__gqid"), F.col(id_col).alias("__gt")
    )
    overlap = (
        topk.join(
            F.broadcast(gt),
            (F.col("qid") == F.col("__gqid"))
            & (F.col(id_col) == F.col("__gt")),
        )
        .groupBy("dim_budget", "qid")
        .agg(F.count("*").alias("overlap"))
    )
    # queries with zero overlap at a budget must still appear
    grid = (
        topk.select("dim_budget", "qid")
        .distinct()
        .join(overlap, ["dim_budget", "qid"], "left")
        .select(
            "dim_budget",
            "qid",
            F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap"),
        )
    )
    return grid.withColumn(
        "recall_ppm", F.expr(f"overlap * 1000000 div {k}")
    )


def nprobe_recall(
    embeddings: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    k: int = 5,
    n_queries: int = 4,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF nprobe-vs-recall curve: for each probe budget, the top-k
    overlap against exact ground truth PLUS the candidate count the
    budget actually paid — the tuning readout that sizes a production
    IVF index (q205 sweeps the dimension budget; this sweeps the
    search budget). The largest nprobe ≥ n_cells row is the built-in
    exhaustive control (recall 1.0 at full candidate cost).

    Protocol (all integer, oracle-replayable): coarse centroids are the
    shared q118 integer-Lloyd device (init = k lowest ids, truncating
    centroid division); every vector's cell and every distance is the
    exact integer d2 of floor-micros vectors; ranks break ties on id.
    Queries are the first ``n_queries`` ids; self never counts.

    Scale shape: ONE exact-distance pass (queries broadcast against the
    partitioned corpus — the q38 posture) feeds ground truth AND, after
    attaching each vector's cell and joining the tiny
    (nprobe, query, cell) allow-list, every budget's candidate ranking;
    per-(nprobe, query) windows run over the candidate stream. At
    deployment scale the alld pass restricts to probed cells first —
    here it is shared with the ground-truth control by construction.
    """
    if not nprobes or k < 1 or n_queries < 1 or n_cells < 1:
        raise ValueError("need nprobes, k, n_queries, n_cells positive")
    spark = embeddings.sparkSession
    vm = _quantized(embeddings, id_col, vec_col, scale)
    cents = _lloyd_centroids(spark, vm, n_cells, iters, id_col)
    cdf = local_frame(spark, cents, "cid int, cvec array<long>")
    asn = (
        _lloyd_scored(vm, cdf, id_col)
        .groupBy(id_col, "vm")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(id_col, F.col("m.cid").alias("cid"))
    )
    qs = F.broadcast(
        vm.orderBy(id_col)
        .limit(n_queries)
        .select(F.col(id_col).alias("qid"), F.col("vm").alias("qv"))
    )

    def d2(a: str, b: str) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    alld = (
        vm.crossJoin(qs)
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", id_col, d2("vm", "qv").alias("d2"))
    )
    wq = Window.partitionBy("qid").orderBy("d2", id_col)
    gt = (
        alld.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= k)
        .select(F.col("qid").alias("__gqid"), F.col(id_col).alias("__gt"))
    )
    qcell = (
        qs.crossJoin(F.broadcast(cdf))
        .select("qid", "cid", d2("qv", "cvec").alias("d2"))
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cid")
            ),
        )
    )
    allowed = (
        qcell.select(
            "qid",
            "cid",
            "cell_rank",
            F.explode(
                F.array(*[F.lit(int(p)) for p in sorted(set(nprobes))])
            ).alias("nprobe"),
        )
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .select("nprobe", "qid", "cid")
    )
    cand = alld.join(asn.select(id_col, "cid"), id_col).join(
        F.broadcast(allowed), ["qid", "cid"]
    )
    wnq = Window.partitionBy("nprobe", "qid").orderBy("d2", id_col)
    topk = (
        cand.withColumn("rn", F.row_number().over(wnq))
        .filter(F.col("rn") <= k)
        .select("nprobe", "qid", id_col)
    )
    ncand = cand.groupBy("nprobe", "qid").agg(
        F.count("*").alias("n_candidates")
    )
    overlap = (
        topk.join(
            F.broadcast(gt),
            (F.col("qid") == F.col("__gqid"))
            & (F.col(id_col) == F.col("__gt")),
        )
        .groupBy("nprobe", "qid")
        .agg(F.count("*").alias("overlap"))
    )
    grid = allowed.select("nprobe", "qid").distinct()
    # ncand/overlap are (|nprobes| × n_queries)-bounded — broadcast them
    return (
        grid.join(F.broadcast(ncand), ["nprobe", "qid"], "left")
        .join(F.broadcast(overlap), ["nprobe", "qid"], "left")
        .select(
            "nprobe",
            "qid",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce("overlap", F.lit(0).cast("long")).alias("overlap"),
        )
        .withColumn("recall_ppm", F.expr(f"overlap * 1000000 div {k}"))
    )


def top_dims(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-vector top-k dimensions by absolute magnitude — the sparse
    'which features fire' readout (feature attribution / sparse
    projection) over a dense embedding column.

    Entirely map-side: the vector is decorated in place with
    ``transform(v, (x, i) -> struct(-abs(micro), i, micro))`` (struct
    order = |value| DESC, dim ASC — deterministic tie-break),
    ``array_sort``'d with the default struct comparator, sliced to k and
    pos-exploded. ZERO shuffle, no per-element explode-then-window (the
    relational formulation would shuffle every element of every vector —
    dims × rows — to rank inside each vector; this does it inside the
    row). Values are truncated micros off the double-promoted float so
    both engines rank identical integers.
    """
    # FLOOR before the BIGINT cast on BOTH engines: Spark's double->long
    # cast truncates but DuckDB's ROUNDS — FLOOR is the shared semantics
    # (same rule as registry.cents()).
    micro = "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
    arr = F.expr(
        f"slice(array_sort(transform({vec_col}, (x, i) -> "
        f"struct(-abs({micro}) AS neg, i AS idx, {micro} AS micro))), "
        f"1, {int(k)})"
    )
    return df.select(F.col(id_col), F.posexplode(arr).alias("pos", "s")).select(
        id_col,
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.col("s.idx").cast("long").alias("dim_idx"),
        F.col("s.micro").alias("micro"),
    )
