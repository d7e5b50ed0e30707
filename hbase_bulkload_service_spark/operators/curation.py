"""Corpus curation pipeline (north-star surface) — the composed
training-data funnel: language filter → quality gate → exact dedup →
near-dup cluster resolution, emitting a per-document verdict ledger.

This is the end-to-end shape a 100 TB pretraining pipeline actually runs;
the individual operators (textops, dedup) are its tested building blocks.

Design notes for 100 TB:
- lang-ID, token counting, and the content hash are FUSED into one scan
  (single select over `documents`) — no self-joins of per-doc derivations;
- the exact-dedup keeper is a window min over content_md5 (one shuffle);
- the MinHash/LSH near-dup stage runs only on exact-stage SURVIVORS (the
  funnel shrinks the expensive stage's input);
- the final verdict is a broadcast-sized left join of near-dup drops back
  onto the ledger (drop set ≪ corpus by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from hbase_bulkload_service_spark.session import local_frame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hbase_bulkload_service_spark import cachereg
from hbase_bulkload_service_spark.operators.dedup import (
    minhash_lsh_neardups,
    neardup_clusters,
)
from hbase_bulkload_service_spark.operators.textops import (
    lang_cols,
    norm_text,
    words_of,
)

# funnel verdicts, in decision order: a doc gets the FIRST stage it fails
VERDICTS = ("lang", "quality", "exact_dup", "near_dup", "kept")

# Caching contract: curate_corpus persists its enriched ledger (read twice —
# eagerly by the near-dup phase inside the call, lazily by the returned
# verdict join). Registration/eviction/release live in the shared
# cachereg module (bounded keep; see its module docstring for the
# correctness argument). release_caches is kept as the public alias.
release_caches = cachereg.release_all


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    keep_lang: str = "en",
    min_tokens: int = 25,
    max_tokens: int = 2000,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Per-document curation ledger: (doc_id, pred_lang, n_tokens, verdict).

    Stages (each applies only to survivors of the previous):
    1. ``lang``      — predicted language != ``keep_lang``;
    2. ``quality``   — token count outside [min_tokens, max_tokens];
    3. ``exact_dup`` — not the min-doc_id holder of its normalized-content
                       md5 among stage-2 survivors;
    4. ``near_dup``  — a non-canonical member of a verified MinHash-LSH
                       near-dup cluster among stage-3 survivors;
    5. ``kept``.
    """
    text = F.col(text_col)
    pred_lang, _hits = lang_cols(text)
    enriched = docs.select(
        "doc_id",
        text.alias(text_col),
        pred_lang.alias("pred_lang"),
        F.size(words_of(text)).cast("long").alias("n_tokens"),
        F.md5(norm_text(text)).alias("content_md5"),
    ).withColumn(
        "lang_ok", F.col("pred_lang") == keep_lang
    ).withColumn(
        "tok_ok", F.col("n_tokens").between(min_tokens, max_tokens)
    )
    # exact-dedup keeper among lang+quality survivors (one keyed shuffle)
    keeper = F.min(
        F.when(F.col("lang_ok") & F.col("tok_ok"), F.col("doc_id"))
    ).over(Window.partitionBy("content_md5"))
    enriched = enriched.withColumn(
        "exact_ok", F.col("lang_ok") & F.col("tok_ok") & (F.col("doc_id") == keeper)
    ).persist()  # ledger read twice: near-dup input + final verdict join
    cachereg.register(enriched, family="curation_ledger")

    survivors = enriched.filter(F.col("exact_ok")).select("doc_id", text_col)
    pairs = minhash_lsh_neardups(
        survivors, text_col=text_col, threshold=jaccard_threshold
    ).select("doc_a", "doc_b")
    near_drops = (
        neardup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id", F.lit(True).alias("near_dup"))
    )
    verdict = (
        F.when(~F.col("lang_ok"), "lang")
        .when(~F.col("tok_ok"), "quality")
        .when(~F.col("exact_ok"), "exact_dup")
        .when(F.col("near_dup").isNotNull(), "near_dup")
        .otherwise("kept")
    )
    # NOTE eager-execution contract: the near-dup stage has already run jobs
    # by this point (neardup_clusters checkpoints eagerly); the returned
    # frame is lazy and reuses the cached ledger (see cachereg above
    # for the cache-release contract).
    return (
        enriched.join(F.broadcast(near_drops), "doc_id", "left")
        .select("doc_id", "pred_lang", "n_tokens", verdict.alias("verdict"))
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling (corpus subsampling / class balancing)
# ---------------------------------------------------------------------------

SAMPLE_MOD = 1000


def hash_bucket(col: Column, mod: int = SAMPLE_MOD) -> Column:
    """Deterministic engine-portable sampling bucket: first 8 hex chars of
    ``md5(string(v))`` as an integer, mod ``mod``. Uniform over keys,
    stable across runs/engines/partitionings — the property `rand()`-based
    sampling lacks (re-runs resample, retried tasks double-sample)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % mod
    )


def stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket falls under the stratum's keep-rate (permille). The classic
    corpus-balancing move (downsample the dominant language, keep the
    rare ones whole).

    Scale shape: a pure map-side filter — ZERO shuffle, no window, no
    per-stratum pass. The rate table rides along as a literal map
    expression (no broadcast, no join); at 100 TB the sample is decided
    row-local in the scan stage and the filter arrives before any
    downstream exchange, so everything after it shuffles only the kept
    fraction. Contrast with cap-per-stratum sampling (window row_number
    over the stratum), which shuffles the full corpus on a low-cardinality
    skewed key — the rate-based form is the one that survives scale-up."""
    pairs = [x for kv in rates_permille.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(default_permille),
    )
    return docs.where(hash_bucket(F.col(key_col)) < rate)


def mix_corpora(
    parts: list[tuple[DataFrame, float]],
    key_col: str = "doc_id",
    tag_col: str = "corpus",
) -> DataFrame:
    """Deterministic weighted corpus mixing — the pretraining data-mix op:
    combine N corpora so their row counts in the output are proportional
    to the given weights, downsampling only (never duplicating).

    The bottleneck corpus (smallest ``n_i / w_i``) is kept WHOLE and
    fixes the achievable mixture size; every other corpus is hash-mod
    downsampled (``hash_bucket`` — stable across runs/engines/retries,
    unlike ``rand()``) to its proportional share. Corpus sizes come from
    one count per part — bounded metadata aggregates, the same class as
    q53's catalog. Output rows carry ``tag_col`` = the part's index.
    Proportions are exact in expectation (hash sampling, ±O(1/sqrt(n))
    realized); weights must be positive.

    Scale shape: per-corpus map-side filter + unionByName — ZERO
    shuffles; the mix decision is row-local in each scan stage.
    """
    if not parts:
        raise ValueError("mix_corpora needs at least one (df, weight) part")
    if any(w <= 0 for _, w in parts):
        raise ValueError("weights must be positive")
    sizes = [df.count() for df, _ in parts]
    if any(n == 0 for n in sizes):
        raise ValueError("every corpus must be non-empty")
    # bottleneck: the part with the least rows per unit weight
    c = min(n / w for n, (_, w) in zip(sizes, parts))
    out = None
    for idx, ((df, w), n) in enumerate(zip(parts, sizes)):
        keep_permille = int(round(c * w / n * 1000))
        piece = df.withColumn(tag_col, F.lit(idx))
        if keep_permille < 1000:
            piece = piece.where(
                hash_bucket(F.col(key_col)) < F.lit(keep_permille)
            )
        out = piece if out is None else out.unionByName(piece)
    return out


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic pseudo-random global ordering — the training-order
    shuffle: every epoch's example order must be (a) uniformly random with
    respect to any corpus ordering (source, crawl date, length), (b) bitwise
    reproducible across reruns/retried tasks, and (c) producible without a
    global sort through one coordinator. rand()-based orderings fail (b):
    a retried task re-rolls and the epoch silently changes.

    Adds (shard, pos): shard = md5-bucket of (seed, key) in [0, n_shards);
    pos = rank of the md5 ordering key within the shard. The total order
    (shard, pos) — or any fixed interleave of shards, e.g. round-robin by
    pos for n_shards parallel readers — is a uniform permutation because
    the md5 keys are i.i.d. uniform in both coordinates. A new seed is a
    fresh, unrelated permutation (per-epoch reshuffle).

    Scale shape: ONE hash exchange on shard + a per-shard sort (each shard
    sorts independently — n_shards-way parallel, no global coordination,
    no single-partition window). Shard sizes are near-equal (multinomial),
    so the sorts are balanced; pick n_shards ~ executors x a small factor.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ord_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    out = df.withColumn("__ord", ord_key).withColumn(
        "shard",
        F.conv(F.substring("__ord", 1, 8), 16, 10).cast("long") % n_shards,
    )
    w = Window.partitionBy("shard").orderBy(F.col("__ord"), F.col(key_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("__ord")


def weighted_sample(
    df: DataFrame,
    weight_ppm: Column,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic importance resampling: keep each row with probability
    ``weight_ppm / 1e6`` (clamped to [0, 1e6]), decided by a portable md5
    bucket of (seed, key) — the per-row generalization of
    :func:`stratified_sample`'s per-stratum rates. This is the primitive
    behind quality-weighted corpus resampling (upweight high-quality /
    underrepresented documents, DSIR-style importance sampling given any
    per-row weight expression).

    Determinism inherits stratified_sample's properties: reruns, retried
    tasks, and repartitioning keep the identical subset (rand() keeps
    none of these); a different seed draws an independent subset.
    Monotone in the weight: raising a row's weight can only add it, so
    nested keep-rates produce nested samples (useful for staged
    ablations: the 10% corpus is a subset of the 20% corpus).

    Scale shape: a pure map-side filter — ZERO shuffle, composes with any
    downstream pipeline without breaking its partitioning.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    # NULL weights drop the row (greatest/least SKIP nulls in Spark, so an
    # unguarded clamp would silently resolve NULL -> 1e6 -> keep-always,
    # the opposite of the SQL `bucket < NULL` convention)
    clamped = F.greatest(F.lit(0), F.least(F.lit(1_000_000), weight_ppm))
    return df.filter(weight_ppm.isNotNull() & (bucket < clamped))


def canonical_selection(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-aware canonical selection over exact-duplicate groups —
    the curation step after dedup DETECTION: inside each group of
    normalized-text duplicates keep the best copy (longest normalized
    text, ties to the lowest doc_id; swap any integer quality column in
    for length without changing the shape), mark the rest as drops.
    Singletons are their own canonical, so the output is a full-corpus
    verdict table: (doc_id, canonical_id, group_n, keep).

    ONE keyed shuffle: the md5 group hash partitions a single window
    (first_value over (quality DESC, id) + count), no join-back — the
    canonical travels to every group member inside the window frame.
    At 100 TB this is strictly cheaper than the agg+join shape (one
    exchange, no second pass over the corpus).
    """
    from hbase_bulkload_service_spark.operators.textops import norm_text

    nt = norm_text(F.col(text_col))
    x = docs.select(
        "doc_id", F.md5(nt).alias("h"), F.length(nt).alias("ln")
    )
    w = Window.partitionBy("h").orderBy(F.col("ln").desc(), "doc_id")
    wall = Window.partitionBy("h")
    return x.select(
        "doc_id",
        F.first("doc_id").over(w).alias("canonical_id"),
        F.count("*").over(wall).alias("group_n"),
    ).withColumn("keep", F.col("doc_id") == F.col("canonical_id"))


def token_budget_mix(
    docs: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    source_col: str = "source",
    order_cols=("doc_id",),
    weights: dict[str, int] | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Exact token-budget data-mix selection — the "build me a 1T-token
    training set from these corpora" op: split an integer token budget
    across sources proportionally to integer ``weights`` (default: equal
    shares — flattening the source distribution, the standard counter to
    crawl-dominant mixes), rounded by the largest-remainder method so
    the per-source allocations are integers that sum to exactly
    ``budget_tokens``; then keep each source's documents greedily in the
    caller's preference order until the allocation is exhausted (a kept
    doc must fit ENTIRELY: cumulative tokens <= allocation — no partial
    documents).

    Exactness: allocations are pure integer arithmetic (div/mod +
    remainder ranking, ties by source name); the greedy cut uses
    :func:`analytics.prefix_sum`, so the whole decision is
    window-semantics-identical to the SQL twin and hash-verifiable.

    Scale shape: the allocation runs on the per-source aggregate — a
    metadata-scale frame (|sources| rows; its windows are single-task by
    design, same class as q53's catalog walk). The doc-level work is
    prefix_sum's ONE range exchange plus a broadcast allocation join —
    no doc-level skew: a dominant source spreads over many range shards.

    Returns docs + (cum_tokens, alloc_tokens, keep).
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if weights is not None and any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    from hbase_bulkload_service_spark.operators.analytics import prefix_sum

    src = docs.groupBy(source_col).agg(F.count("*").alias("_n"))
    if weights is None:
        w = F.lit(1)
    else:
        w = F.coalesce(
            *[
                F.when(F.col(source_col) == s, F.lit(int(v)))
                for s, v in sorted(weights.items())
            ],
            F.lit(0),
        )
    wall = Window.partitionBy()
    worder = Window.partitionBy().orderBy(
        F.col("_rem").desc(), F.col(source_col)
    )
    alloc = (
        src.withColumn("_w", w.cast("long"))
        .filter(F.col("_w") > 0)  # unweighted sources get nothing
        .withColumn("_tw", F.sum("_w").over(wall))
        .withColumn("_base", F.expr(f"(cast({budget_tokens} as bigint) * _w) div _tw"))
        .withColumn("_rem", F.expr(f"(cast({budget_tokens} as bigint) * _w) % _tw"))
        .withColumn("_extra", F.lit(budget_tokens) - F.sum("_base").over(wall))
        .withColumn("_rank", F.row_number().over(worder))
        .select(
            source_col,
            (F.col("_base") + (F.col("_rank") <= F.col("_extra")).cast("long"))
            .alias("alloc_tokens"),
        )
    )
    if weights is not None:
        # drop unweighted sources BEFORE the range exchange: a dominant
        # excluded crawl source must not pay the full-data shuffle just
        # to be discarded by the allocation join afterwards
        docs = docs.filter(F.col(source_col).isin(list(weights)))
    cum = prefix_sum(
        docs, token_col, list(order_cols), part_cols=[source_col],
        n_shards=n_shards, out_col="cum_tokens",
    )
    return cum.join(F.broadcast(alloc), source_col).withColumn(
        "keep", F.col("cum_tokens") <= F.col("alloc_tokens")
    )


def capped_stratum_sample(
    docs: DataFrame,
    cap: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    prefilter_ppm: int | None = None,
) -> DataFrame:
    """Exact deterministic k-per-stratum sample: each stratum keeps its
    ``cap`` rows with the smallest ``md5(seed:key)`` (ties by key) — a
    uniform without-replacement draw that is reproducible across runs,
    task retries, and repartitionings, and whose seeds give independent
    draws. The EXACT-BUDGET counterpart to :func:`stratified_sample`'s
    rate-based form (rates give a binomial count; evaluation sets and
    per-stratum quotas need exactly k). ``key_col`` must be a unique
    non-null id: NULL keys raise loudly in-plan (a NULL md5 draw key is
    nondeterministic and engine-divergent), duplicate keys make the
    tie-break arbitrary among their copies.

    Scale path — ``prefilter_ppm``: the naive plan windows the FULL
    corpus on a low-cardinality skewed key (every row of a 100 TB
    stratum shuffles to sort out its top k). With a prefilter, rows
    whose 32-bit md5-prefix value is >= ``prefilter_ppm/1e6 · 2^32``
    are dropped MAP-SIDE before the window, so only the expected
    ``prefilter_ppm/1e6`` fraction ever shuffles. LOSSLESS BY
    CONSTRUCTION OR LOUD: the window order is the md5 string order,
    whose leading 8 hex chars are exactly the prefix value — if a
    stratum retains >= min(cap, total) survivors, every true top-k row
    is among them (any dropped row's prefix exceeds >= cap surviving
    prefixes, hence its full order does too); the operator VERIFIES
    that bound per stratum inside the plan (assert_true on the
    stratum-count join) and fails loudly instead of silently
    under-sampling, telling the caller to raise prefilter_ppm. Size
    the ppm at ~(cap / min_stratum_rows) · 1e6 · safety; the
    verification costs one tiny per-stratum count agg on each side.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    if prefilter_ppm is not None and not (0 < prefilter_ppm <= 1_000_000):
        raise ValueError("prefilter_ppm must be in (0, 1e6]")
    clash = {"__ord", "__rk", "__s"} & set(docs.columns)
    if clash:
        raise ValueError(f"reserved column name(s) in input: {sorted(clash)}")
    # NULL draw keys are rejected LOUDLY, per row and map-side (free: the
    # assert returns NULL on success so the filter keeps every row). A
    # NULL key would get a NULL md5 — ranked first by Spark's NULLS FIRST,
    # dropped by the prefilter (NULL < threshold is NULL), nondeterministic
    # among multiple NULLs, and ordered last by other engines: every path
    # silently breaks the determinism contract, so none may be reached.
    docs = docs.filter(
        F.assert_true(
            F.col(key_col).isNotNull(),
            F.lit(
                f"capped_stratum_sample: NULL {key_col} — the draw key "
                "must be a unique non-null id"
            ),
        ).isNull()
    )
    ord_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    x = docs.withColumn("__ord", ord_key)
    guard_branch = None
    if prefilter_ppm is not None:
        prefix_val = F.conv(F.substring("__ord", 1, 8), 16, 10).cast("long")
        threshold = (prefilter_ppm * (1 << 32)) // 1_000_000
        totals = docs.groupBy(strata_col).agg(F.count("*").alias("__total"))
        x = x.filter(prefix_val < F.lit(threshold))
        survivors = x.groupBy(F.col(strata_col).alias("__s")).agg(
            F.count("*").alias("__surv")
        )
        # loud losslessness guard: assert_true raises per offending
        # stratum while the WHERE below evaluates it; on success it is
        # NULL, so the branch contributes zero rows. Structured as a
        # UNION branch (typed-NULL projection of the output schema), NOT
        # a join onto the sampled rows — a join guard never evaluates
        # when the prefilter leaves a stratum EMPTY (the worst
        # under-sample), and AQE's empty-relation propagation can skip
        # a broadcast side entirely.
        # null-safe join: a NULL stratum is a legal group and must not
        # trip (or dodge) the guard through NULL != NULL semantics
        guard = totals.join(
            survivors, F.col(strata_col).eqNullSafe(F.col("__s")), "left"
        ).select(
            F.assert_true(
                F.coalesce(F.col("__surv"), F.lit(0))
                >= F.least(F.lit(cap), F.col("__total")),
                F.concat(
                    F.lit(
                        "capped_stratum_sample: prefilter dropped below "
                        f"min(cap={cap}, stratum size) for stratum "
                    ),
                    F.col(strata_col).cast("string"),
                    F.lit(f" — raise prefilter_ppm (={prefilter_ppm})"),
                ),
            ).alias("__guard"),
        )
        guard_branch = guard.where(F.col("__guard").isNotNull()).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in docs.schema.fields
            ]
        )
    w = Window.partitionBy(strata_col).orderBy(F.col("__ord"), F.col(key_col))
    out = (
        x.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__ord", "__rk")
    )
    return out if guard_branch is None else out.unionByName(guard_branch)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-version diff — the corpus release manager's primitive:
    classify every document across two snapshots as ``added`` (key only
    in new), ``removed`` (key only in old), ``changed`` (key in both,
    normalized-content md5 differs), or ``unchanged``. The step between
    "we rebuilt the corpus" and "we know exactly what moved" — feeds
    incremental re-training decisions, changelog manifests, and blast-
    radius checks before swapping a release.

    Output: one row per key — (key, change, old_md5, new_md5); md5 NULL
    on the side where the key is absent. NULL text hashes as the empty
    string so presence and content are independent axes.

    Scale shape: ONE keyed full-outer hash join on the snapshot key —
    the only corpus-sized structure either side ships is (key, md5), 48
    bytes a row, so two 100 TB snapshots diff by exchanging ~KB-per-
    million-docs digests; raw text never shuffles.
    """
    from hbase_bulkload_service_spark.operators.textops import norm_text

    def digests(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("key"),
            F.md5(
                F.coalesce(norm_text(F.col(text_col)), F.lit(""))
            ).alias(f"{side}_md5"),
        )

    o, n = digests(old, "old"), digests(new, "new")
    j = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("key", change.alias("change"), "old_md5", "new_md5")


def balanced_oversample(
    docs: DataFrame,
    class_col: str,
    key_col: str = "doc_id",
    target: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Deterministic resample-with-replacement to EXACTLY ``target`` rows
    per class — the upsampling half of class balancing (the downsampling
    half is capped_stratum_sample): minority classes replicate, majority
    classes subsample, one formula covers both. Each row's replica count
    is ``target div n`` plus one more for the ``target mod n`` rows with
    the smallest ``md5(seed:key)`` draw (for ``n > target`` that is
    0 + 1 for the top-``target`` — exactly the without-replacement cap).
    Reproducible across runs / retries / partitionings; seeds give
    independent remainder draws.

    Output: one row per REPLICA — (key, class, rep) with rep in
    [1, replicas-of-key] — Σ rep-rows per class == target exactly.

    ``key_col`` must be unique non-null per row (same contract and
    reason as capped_stratum_sample).

    Plan: ONE keyed exchange — the md5-order rank window and the class
    count share the class partitioning; replication is a map-side
    sequence-explode AFTER the window (the exchange carries each source
    row once, never the replicas). Skew caveat: a 100 TB single class
    windows through one task chain — pair with the prefilter trick if a
    class is corpus-sized and target is small.
    """
    if target < 1:
        raise ValueError("target must be >= 1")
    key, cls = F.col(key_col), F.col(class_col)
    # NULL draw keys rejected LOUDLY, map-side and per row — the same
    # in-plan assert as capped_stratum_sample (concat_ws SKIPS the NULL,
    # so every NULL-key row would share one draw value with a NULL
    # tie-break: nondeterministic remainder assignment, and divergent
    # from the oracle's NULL-propagating '||' concatenation)
    docs = docs.filter(
        F.assert_true(
            key.isNotNull(),
            F.lit(
                f"balanced_oversample: NULL {key_col} — the draw key "
                "must be a unique non-null id"
            ),
        ).isNull()
    )
    draw = F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    w = Window.partitionBy(class_col).orderBy(draw.asc(), key.asc())
    wall = Window.partitionBy(class_col)
    ranked = docs.select(
        key_col,
        class_col,
        F.row_number().over(w).alias("__rk"),
        F.count("*").over(wall).alias("__n"),
    )
    reps = F.expr(f"{target} div __n") + F.when(
        F.col("__rk") <= F.expr(f"{target} % __n"), 1
    ).otherwise(0)
    return (
        ranked.select(key_col, class_col, reps.alias("__reps"))
        .filter(F.col("__reps") >= 1)
        .select(
            key_col,
            class_col,
            F.explode(F.sequence(F.lit(1), F.col("__reps"))).alias("rep"),
        )
    )


def dataset_split(
    docs: DataFrame,
    weights_ppm: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment with EXACT per-stratum
    quotas — the dataset-release split: within each stratum, rows are
    ordered by ``md5(seed:key)`` (ties by key — the same reproducible
    draw as capped_stratum_sample) and the first ``quota(split_1)`` rows
    go to split 1, the next to split 2, and so on. Quotas are the
    LARGEST-REMAINDER apportionment of the stratum size over
    ``weights_ppm`` (values must sum to exactly 1_000_000), so every
    row is assigned, split sizes are exact to the row (not binomial —
    a 1%-val split of a 300-row stratum is exactly 3 rows), and the
    assignment is stable across runs, retries, and repartitionings.

    Output: the input columns plus ``split``. NULL draw keys are
    rejected loudly in-plan (nondeterministic order, the
    capped_stratum_sample contract).

    Scale shape: ONE stratum-keyed exchange for the rank window; the
    quota table is (n_strata x n_splits) rows — computed from the
    stratum counts and BROADCAST into a range join against the rank, so
    no second corpus-sized shuffle. The apportionment windows run on
    that tiny relation only.
    """
    if not weights_ppm:
        raise ValueError("weights_ppm must be non-empty")
    if any(w < 0 for w in weights_ppm.values()):
        raise ValueError("weights must be non-negative")
    if sum(weights_ppm.values()) != 1_000_000:
        raise ValueError("weights_ppm must sum to exactly 1_000_000")
    # __lo/__hi ride the quota join and are dropped by name at the end —
    # a same-named user column would be silently dropped with them
    clash = {"__ord", "__rk", "__s", "__lo", "__hi", "split"} & set(docs.columns)
    if clash:
        raise ValueError(f"reserved column name(s) in input: {sorted(clash)}")
    docs = docs.filter(
        F.assert_true(
            F.col(key_col).isNotNull(),
            F.lit(
                f"dataset_split: NULL {key_col} — the draw key must be "
                "a unique non-null id"
            ),
        ).isNull()
    )
    spark = docs.sparkSession
    splits = local_frame(spark,
        [(i, name, w) for i, (name, w) in enumerate(weights_ppm.items())],
        "__idx int, split string, __w long",
    )
    counts = docs.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count("*").alias("__n")
    )
    # largest-remainder apportionment per stratum: floor quotas, then
    # +1 to the splits with the largest remainders until the leftover
    # (n - sum of floors) is spent; ties by declaration order.
    alloc = counts.crossJoin(splits).select(
        "__s",
        "__n",
        "__idx",
        "split",
        F.expr("(__n * __w) div 1000000").alias("__floor"),
        ((F.col("__n") * F.col("__w")) % 1_000_000).alias("__rem"),
    )
    w_strat = Window.partitionBy("__s")
    w_rem = Window.partitionBy("__s").orderBy(
        F.col("__rem").desc(), F.col("__idx").asc()
    )
    w_cum = (
        Window.partitionBy("__s")
        .orderBy(F.col("__idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    quotas = (
        alloc.withColumn(
            "__leftover", F.col("__n") - F.sum("__floor").over(w_strat)
        )
        .withColumn("__rr", F.row_number().over(w_rem))
        .withColumn(
            "__quota",
            F.col("__floor")
            + F.when(F.col("__rr") <= F.col("__leftover"), 1).otherwise(0),
        )
        .withColumn("__hi", F.sum("__quota").over(w_cum))
        .withColumn("__lo", F.col("__hi") - F.col("__quota"))
        .select("__s", "split", "__lo", "__hi")
    )
    ord_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    w_rank = Window.partitionBy(strata_col).orderBy(ord_key, F.col(key_col))
    ranked = docs.withColumn("__rk", F.row_number().over(w_rank))
    out = ranked.join(
        F.broadcast(quotas),
        F.col(strata_col).eqNullSafe(F.col("__s"))
        & (F.col("__rk") > F.col("__lo"))
        & (F.col("__rk") <= F.col("__hi")),
    )
    return out.drop("__rk", "__s", "__lo", "__hi")


def source_reputation(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    dup_threshold_ppm: int = 200_000,
) -> DataFrame:
    """Per-source corpus reputation — the domain-level trust signal the
    RefinedWeb/C4-style pipelines apply BEFORE document-level filters
    (a source whose content is mostly duplicated elsewhere is boiler-
    plate or a mirror; dropping it wholesale is cheaper and safer than
    judging its documents one by one): for each source, document count,
    total characters, the number of documents whose (normalized) text
    occurs in MORE THAN ONE document corpus-wide, that duplication rate
    in integer ppm, and a ``flagged`` verdict against
    ``dup_threshold_ppm``.

    Scale shape: raw text NEVER shuffles — each doc collapses to a
    16-byte md5 digest map-side; the first hash aggregate reduces the
    corpus to (source, digest) cardinality with map-side combine, the
    global digest counts derive from THAT relation (digest-sized, not
    corpus-sized), and the digest-keyed equi-join runs between two
    digest-cardinality relations. Output is one row per source.
    NULL text hashes as empty text (every doc counts, the
    strip_boilerplate convention).
    """
    from hbase_bulkload_service_spark import cachereg

    digest = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    # per_sd feeds the global digest counts AND the join with different
    # prunings — the q214/q216 exchange-reuse class (r07 sweep: the
    # corpus was scanned 4x before the persist). (source, digest)
    # cardinality, storage-bounded via cachereg.
    per_sd = (
        docs.select(
            F.col(source_col).alias("source"),
            digest.alias("__digest"),
            F.coalesce(F.col(chars_col), F.lit(0)).alias("__chars"),
        )
        .groupBy("source", "__digest")
        .agg(F.count("*").alias("__cnt"), F.sum("__chars").alias("__chr"))
        .persist()
    )
    cachereg.register(per_sd, family="sourcerep")
    global_counts = per_sd.groupBy("__digest").agg(
        F.sum("__cnt").alias("__gcnt")
    )
    joined = per_sd.join(global_counts, "__digest")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("__cnt").alias("n_docs"),
            F.sum(F.when(F.col("__gcnt") > 1, F.col("__cnt")).otherwise(0)).alias(
                "n_dup_docs"
            ),
            F.sum("__chr").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "total_chars",
            F.expr("(n_dup_docs * 1000000) div n_docs").alias("dup_ppm"),
        )
        .withColumn("flagged", F.col("dup_ppm") > dup_threshold_ppm)
    )


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source content-overlap matrix — the train/test-leakage and
    mirror-detection sweep across corpora (which pairs of sources share
    content, and how much?): for every unordered source pair, the number
    of distinct (normalized-digest) contents present in BOTH, plus each
    side's doc count over those shared contents. The pairwise
    generalization of :func:`source_reputation`'s corpus-wide dup rate.

    Scale shape: raw text never shuffles (map-side md5); the corpus
    collapses to (source, digest) cardinality at the first combined
    hash aggregate, and the pair join is a DIGEST-KEYED self-join whose
    per-key fan-out is bounded by the SOURCE count (≤ n_sources rows
    per digest side), not by document count — so a 100 TB corpus with
    20 sources pairs at most 20x20 rows per distinct content. NULL text
    hashes as empty (every doc counts).
    """
    from hbase_bulkload_service_spark import cachereg

    digest = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    # the digest self-join consumes sd twice; Catalyst does not reuse
    # the aliased branches (r07 sweep: 2 corpus scans, 1 reuse before
    # the persist). (source, digest) cardinality, cachereg-bounded.
    sd = (
        docs.select(
            F.col(source_col).alias("__src"), digest.alias("__digest")
        )
        .groupBy("__src", "__digest")
        .agg(F.count("*").alias("__cnt"))
        .persist()
    )
    cachereg.register(sd, family="sourcerep")
    a = sd.select(
        F.col("__src").alias("source_a"),
        F.col("__digest").alias("__d"),
        F.col("__cnt").alias("__ca"),
    )
    b = sd.select(
        F.col("__src").alias("source_b"),
        F.col("__digest").alias("__d"),
        F.col("__cnt").alias("__cb"),
    )
    pairs = a.join(b, "__d").filter(F.col("source_a") < F.col("source_b"))
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").alias("shared_digests"),
        F.sum("__ca").alias("docs_a"),
        F.sum("__cb").alias("docs_b"),
    )


def dsir_importance(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "zh",
    n_buckets: int = 4096,
    keep_n: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    pick the raw-pool documents whose hashed-bigram feature distribution
    looks most like a TARGET slice of the corpus — the domain-matching
    selection stage of a pretraining pipeline (select web docs that look
    like wiki/books, here: docs that look like the ``target_value``
    stratum).

    Protocol (integer-exact; no float crosses the verdict — the same
    device as q48's tf-idf twin and q119's LM score): features are
    word bigrams hashed into ``n_buckets`` md5 buckets; the target and
    raw bucket distributions are counted in ONE pass; each bucket gets
    an add-one-smoothed integer likelihood-ratio score
    ``((cnt_target + 1) * 1e6) div (cnt_raw + 1)`` — a monotone twin of
    the smoothed ratio p_target/p_raw (the shared normalizers are
    constant across buckets, so per-bucket ranking is preserved; the
    document score is the occurrence-weighted ratio-sum rather than the
    paper's log-ratio sum, trading the log for exact integer
    arithmetic). The ``keep_n`` raw documents with the highest weight
    (ties -> lowest id) are returned.

    Scale shape for 100 TB: one scan explodes bigrams and immediately
    collapses to the bucket axis (n_buckets rows — metadata-scale) and
    to (doc, bucket) occurrence counts (map-side combine on both); the
    bucket score table broadcasts back onto the per-doc counts; the
    final top-N is orderBy+limit => TakeOrderedAndProject (O(keep_n)
    per partition, no global sort). Raw text crosses no shuffle.
    """
    is_target = F.col(target_col) == F.lit(target_value)
    bigrams = F.when(
        F.size(F.col("__ws")) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            "transform(sequence(0, size(__ws) - 2),"
            " i -> concat(__ws[i], ' ', __ws[i+1]))"
        )
    )
    feats = (
        docs.select(
            F.col(id_col),
            is_target.alias("__t"),
            words_of(F.col(text_col)).alias("__ws"),
        )
        .select(
            id_col, "__t", F.explode(bigrams).alias("__bg")
        )
        .select(
            id_col,
            "__t",
            hash_bucket(F.col("__bg"), n_buckets).alias("bucket"),
        )
    )
    from hbase_bulkload_service_spark import cachereg

    # ONE corpus explode: collapse to (doc, side, bucket) counts first,
    # then derive both the bucket score table and the per-doc features
    # from that — before this restructure the explode subtree evaluated
    # once per consumer (the q214/q216 exchange-reuse class; r07 sweep:
    # 2 corpus scans). The collapsed table is (doc x distinct-bucket)
    # incidence, cachereg-bounded like the gram index.
    base = (
        feats.groupBy(id_col, "__t", "bucket")
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    cachereg.register(base, family="dsir")
    stats = base.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("__ct"),
        F.sum(F.when(F.col("__t"), F.lit(0)).otherwise(F.col("__c"))).alias(
            "__cr"
        ),
    )
    scores = stats.select(
        "bucket",
        F.expr("((__ct + 1) * 1000000) div (__cr + 1)").alias("__ratio_ppm"),
    )
    doc_feats = base.filter(~F.col("__t")).select(id_col, "bucket", "__c")
    weights = (
        doc_feats.join(F.broadcast(scores), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_feats"),
            F.sum(F.col("__c") * F.col("__ratio_ppm")).alias("weight_ppm"),
        )
    )
    return (
        weights.orderBy(F.col("weight_ppm").desc(), F.col(id_col))
        .limit(keep_n)
        .select(id_col, "n_feats", "weight_ppm")
    )


def temperature_sample(
    docs: DataFrame,
    budget: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based multilingual resampling (the XLM-R / mT5
    alpha-sampling move, Conneau et al. 2020 with alpha = 0.5): split a
    document budget across languages proportionally to ``sqrt(n_lang)``
    instead of ``n_lang``, flattening the head (a 100x bigger language
    gets only 10x the slots) so low-resource languages survive the cut
    — the standard counter to crawl-dominant multilingual mixes, sitting
    between q127's explicit-weight budget and q47's fixed-rate
    downsample: here the weights are DERIVED from the corpus itself.

    Exactness: the weight is ``floor(sqrt(n))`` — exact in both engines
    because sqrt over doubles is correctly rounded and n < 2^52, so the
    floor cannot straddle an integer boundary; quotas are the
    largest-remainder apportionment of ``budget`` over the weights
    (integer div/mod + remainder rank, ties by language name — sums to
    exactly ``budget``); within a language the kept rows are the first
    ``quota`` by the reproducible ``md5(seed:key)`` draw (the
    dataset_split device). A quota can exceed a tiny language's size —
    real temperature sampling upsamples with replacement there — so the
    output reports ``quota`` next to ``rnk`` and the shortfall is
    visible as ``max(rnk) < quota``.

    Output: the selected rows only — ``(doc_id, lang, rnk, n_docs,
    weight, quota)``.

    Scale shape for 100 TB: the language histogram is a map-side
    combined keyed agg collapsing to |langs| rows; ALL apportionment
    windows run on that metadata-scale table, which then BROADCASTS
    onto the corpus; the only corpus-scale exchange is the per-language
    rank window (same single exchange as dataset_split; a dominant
    language is one partition — acceptable because the window computes
    row_number only, and the md5 draw order means the cut is a filter,
    not a sort-limit).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql.window import Window as W

    counts = docs.groupBy(F.col(strata_col)).agg(F.count("*").alias("n_docs"))
    wall = W.partitionBy()
    w_rem = W.partitionBy().orderBy(F.col("__rem").desc(), F.col(strata_col))
    quotas = (
        counts.withColumn(
            "weight", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
        )
        .withColumn("__tw", F.sum("weight").over(wall))
        .withColumn(
            "__base", F.expr(f"(cast({budget} as bigint) * weight) div __tw")
        )
        .withColumn(
            "__rem", F.expr(f"(cast({budget} as bigint) * weight) % __tw")
        )
        .withColumn("__extra", F.lit(budget) - F.sum("__base").over(wall))
        .withColumn("__rr", F.row_number().over(w_rem))
        .select(
            strata_col,
            "n_docs",
            "weight",
            (
                F.col("__base")
                + (F.col("__rr") <= F.col("__extra")).cast("long")
            ).alias("quota"),
        )
    )
    draw = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    w_rank = W.partitionBy(strata_col).orderBy(draw, F.col(key_col))
    return (
        docs.select(key_col, strata_col)
        .withColumn("rnk", F.row_number().over(w_rank))
        .join(F.broadcast(quotas), strata_col)
        .filter(F.col("rnk") <= F.col("quota"))
        .select(key_col, strata_col, "rnk", "n_docs", "weight", "quota")
    )


def doremi_weights(
    docs: DataFrame,
    rounds: int = 3,
    vocab_size: int = 500,
    scale: int = 1000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """DoReMi-lite domain reweighting (after Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    ``rounds`` synchronous multiplicative-weights updates over the
    domain axis, upweighting domains whose proxy loss EXCEEDS the
    current mixture's weighted average — the paper's excess-loss signal
    with a corpus statistic standing in for the proxy-model loss (here:
    the domain's mean OOV-ppm against the corpus top-``vocab_size``
    vocabulary, the q177 device — rare-vocabulary domains read as
    "harder").

    Integer protocol: weights live as ppm integers renormalized each
    round by largest-remainder apportionment (sums to exactly 1e6 every
    round); the update is ``w * (scale + excess) div scale`` with
    ``excess = max(0, loss - avg)`` and ``avg`` the weighted mean loss
    under the CURRENT weights — so each round genuinely depends on the
    last (the mixture average moves as weights move; a fixed-loss
    "update" would collapse to a closed-form power and test nothing).

    Output: one row per domain — ``(source, loss, w0_ppm..wR_ppm)``.

    Scale shape for 100 TB: ONE corpus pass builds the loss table
    (token-keyed agg + broadcast vocabulary + domain rollup, exactly
    q177's exchanges); every round after that is window arithmetic over
    the |domains|-row table — metadata-scale, the q53/q127 class. The
    loop is plan-side (fixed unroll), never a driver collect.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    from pyspark.sql.window import Window as W

    from hbase_bulkload_service_spark.operators.textops import words_of

    toks = docs.select(
        F.col(source_col), F.explode(words_of(F.col(text_col))).alias("__w")
    )
    # ONE corpus explode: collapse to the (source, word) count table —
    # the token_tvd device — and derive both the top-V vocabulary and
    # the per-source OOV loss from it (before: the explode evaluated
    # once per consumer; r07 sweep: 2 corpus scans). (sources x vocab)
    # cardinality, cachereg-bounded.
    from hbase_bulkload_service_spark import cachereg

    sw = (
        toks.groupBy(source_col, "__w")
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    cachereg.register(sw, family="doremi")
    vocab = (
        sw.groupBy("__w")
        .agg(F.sum("__c").alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("__w"))
        .limit(vocab_size)
        .select("__w", F.lit(1).alias("__in"))
    )
    loss = (
        sw.join(F.broadcast(vocab), "__w", "left")
        .groupBy(source_col)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(
                F.when(F.col("__in").isNull(), F.col("__c")).otherwise(0)
            ).alias("__oov"),
        )
        .select(
            source_col, F.expr("__oov * 1000000 div __n").alias("loss")
        )
    )
    wall = W.partitionBy()

    def renorm(df: DataFrame, raw: str, out: str) -> DataFrame:
        w_rem = W.partitionBy().orderBy(F.col("__rem").desc(), F.col(source_col))
        return (
            df.withColumn("__tot", F.sum(raw).over(wall))
            .withColumn(
                "__base", F.expr(f"(1000000 * {raw}) div __tot")
            )
            .withColumn("__rem", F.expr(f"(1000000 * {raw}) % __tot"))
            .withColumn(
                "__extra", F.lit(1_000_000) - F.sum("__base").over(wall)
            )
            .withColumn("__rr", F.row_number().over(w_rem))
            .withColumn(
                out,
                F.col("__base")
                + (F.col("__rr") <= F.col("__extra")).cast("long"),
            )
            .drop("__tot", "__base", "__rem", "__extra", "__rr", raw)
        )

    cur = renorm(loss.withColumn("__raw", F.lit(1).cast("long")), "__raw", "w0_ppm")
    for t in range(1, rounds + 1):
        prev = f"w{t - 1}_ppm"
        cur = (
            cur.withColumn(
                "__avg", F.expr(f"sum({prev} * loss) over () div 1000000")
            )
            .withColumn(
                "__exc", F.greatest(F.col("loss") - F.col("__avg"), F.lit(0))
            )
            .withColumn(
                "__raw", F.expr(f"({prev} * ({scale} + __exc)) div {scale}")
            )
            .drop("__avg", "__exc")
        )
        cur = renorm(cur, "__raw", f"w{t}_ppm")
    return cur.select(
        source_col, "loss", *[f"w{t}_ppm" for t in range(rounds + 1)]
    )


def dedup_savings(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Dedup savings report — the governance rollup AFTER canonical
    selection: per source, how many documents and characters the
    exact-dedup pass would drop (non-canonical duplicate-group members)
    and the drop rate in ppm — the number a curation review reads to
    decide whether a source pays its storage ("adds tokens, not
    information" quantified; q199's matrix shows WHO copies whom, this
    prices what deleting the copies saves).

    Rides :func:`canonical_selection`'s single md5-keyed window (the
    keep verdicts), then one thin id-keyed join back to (source, size)
    and one source-keyed map-side-combined rollup. |sources| output
    rows.
    """
    verdicts = canonical_selection(docs)
    sized = docs.select(
        "doc_id",
        F.col(source_col),
        F.length(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("__nchars"),
    )
    return (
        verdicts.join(sized, "doc_id")
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((~F.col("keep")).cast("long")).alias("docs_dropped"),
            F.sum(
                F.when(~F.col("keep"), F.col("__nchars")).otherwise(0)
            ).alias("chars_dropped"),
            F.sum("__nchars").alias("chars_total"),
        )
        .withColumn(
            "drop_ppm", F.expr("docs_dropped * 1000000 div n_docs")
        )
    )


def stratified_batches(
    docs: DataFrame,
    n_batches: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Stratified minibatch assembly — the training-batch construction
    move that keeps every batch's stratum mix representative: within
    each stratum, rows are ordered by the reproducible ``md5(seed:key)``
    draw and dealt ROUND-ROBIN over ``n_batches``, so per (batch,
    stratum) counts differ by at most one from the stratum's ideal
    share (homogeneous batches bias gradients; round-robin dealing is
    the exact counter). Output is the audit view: one row per (batch,
    stratum) with the count and its deviation from ``floor(n/B)`` —
    ``dev`` is 0/1 BY CONSTRUCTION, so the column doubles as a
    self-check the oracle pins.

    Scale shape: one stratum-keyed rank exchange (the dataset_split
    class) + a (batch, stratum)-keyed map-side-combined rollup;
    B x |strata| output rows.
    """
    if n_batches < 1:
        raise ValueError("n_batches must be >= 1")
    from pyspark.sql.window import Window as W

    draw = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    w_rank = W.partitionBy(strata_col).orderBy(draw, F.col(key_col))
    assigned = docs.select(key_col, strata_col).withColumn(
        "batch", (F.row_number().over(w_rank) - 1) % n_batches
    )
    return (
        assigned.groupBy("batch", strata_col)
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "dev",
            F.col("n_docs")
            - F.expr(
                f"sum(n_docs) over (partition by {strata_col})"
                f" div {n_batches}"
            ),
        )
    )


def soft_quality_sample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-WEIGHTED soft sampling (the CCNet/FineWeb device: instead
    of a hard quality cutoff, keep each document with probability equal
    to its quality score): doc i survives iff
    ``md5_bucket('q:' ‖ doc_id) < quality_ppm_i`` — deterministic,
    engine-portable, re-run/retry-stable, and exactly
    inclusion-probability-proportional-to-quality since the md5 bucket
    is uniform on [0, 1e6). Quality here is the q212 Gini
    character-diversity score; any per-doc ppm metric slots in.

    Output per source: docs, kept, kept_ppm, and the mean quality ppm —
    kept_ppm tracks mean quality in expectation, so a large gap is a
    sampler-health signal (the audit column, not an assertion).

    Scale shape: the gate is one map-side comparison over the scored
    docs (scoring is q212's two keyed aggs); the rollup is one
    source-keyed agg.
    """
    from hbase_bulkload_service_spark.operators.textops import char_diversity

    scored = docs.select("doc_id", F.col("source")).join(
        char_diversity(docs, text_col).select("doc_id", "gini_ppm"),
        "doc_id",
    )
    kept = F.when(
        hash_bucket(
            F.concat(F.lit("q:"), F.col("doc_id").cast("string")), 1_000_000
        )
        < F.col("gini_ppm"),
        1,
    ).otherwise(0)
    return (
        scored.select("source", "gini_ppm", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("gini_ppm").alias("sum_quality_ppm"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.expr("n_kept * 1000000 div n_docs").alias("kept_ppm"),
            F.expr("sum_quality_ppm div n_docs").alias("mean_quality_ppm"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
) -> DataFrame:
    """Sequence packing — the concat-then-chunk layout every LM training
    pipeline needs: documents are concatenated in ``key_col`` order into
    one global token stream, then chunked into fixed ``context_len``
    windows; each document's global token span ``[start_tok, end_tok)``
    tells which training bins it lands in (documents freely straddle bin
    boundaries, GPT-style). Output per doc: ``(key, n_tokens, start_tok,
    end_tok, first_bin, last_bin, n_bins)``; zero-token docs occupy no
    space (NULL bins, n_bins 0).

    The global offset is a distributed PREFIX SUM, not a global window
    (a single ``Window.orderBy`` serializes the corpus through one
    task):

    1. part id = ``floor((key - min_key) / chunk)`` — derived from the
       KEY VALUE against collected min/max (2-row metadata agg), so both
       passes agree deterministically no matter how the data is
       physically partitioned (``spark_partition_id`` after a range
       exchange is NOT stable across re-executions — the range sampler
       reseeds per action);
    2. per-part local cumulative sums run in parallel
       (``Window.partitionBy(part)``, ~corpus/n_parts rows each for
       dense keys);
    3. per-part totals (≤ n_parts rows) collect to the driver, turn
       into exclusive prefix offsets, and broadcast-join back.

    One keyed exchange over the token counts (not the text), one
    metadata collect, one broadcast join. Dense/near-uniform keys give
    balanced parts; a heavily skewed key space should pre-rank (e.g.
    :func:`deterministic_shuffle`'s (shard, pos)) before packing.
    """
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    toks = docs.select(
        F.col(key_col),
        F.size(
            F.filter(words_of(F.col(text_col)), lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    lo_hi = toks.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:
        return toks.select(
            key_col, "n_tokens",
            F.lit(None).cast("long").alias("start_tok"),
            F.lit(None).cast("long").alias("end_tok"),
            F.lit(None).cast("long").alias("first_bin"),
            F.lit(None).cast("long").alias("last_bin"),
            F.lit(0).cast("long").alias("n_bins"),
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    chunk = max(1, (hi - lo) // n_parts + 1)
    part = ((F.col(key_col) - F.lit(lo)) / F.lit(chunk)).cast("long")
    local = toks.withColumn("__part", part).withColumn(
        "__lsum",
        F.sum("n_tokens").over(
            Window.partitionBy("__part")
            .orderBy(key_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = sorted(
        (int(r["__part"]), int(r["__t"]))
        for r in toks.withColumn("__part", part)
        .groupBy("__part")
        .agg(F.sum("n_tokens").alias("__t"))
        .collect()
    )
    offsets, acc = [], 0
    for p, t in totals:
        offsets.append((p, acc))
        acc += t
    spark = docs.sparkSession
    off_df = local_frame(spark, offsets, "__part long, __off long")
    out = local.join(F.broadcast(off_df), "__part").select(
        F.col(key_col),
        "n_tokens",
        (F.col("__off") + F.col("__lsum") - F.col("n_tokens")).alias("start_tok"),
        (F.col("__off") + F.col("__lsum")).alias("end_tok"),
    )
    nz = F.col("n_tokens") > 0
    first_bin = F.when(nz, F.expr(f"start_tok div {context_len}")).cast("long")
    last_bin = F.when(nz, F.expr(f"(end_tok - 1) div {context_len}")).cast("long")
    return out.select(
        key_col,
        "n_tokens",
        "start_tok",
        "end_tok",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        F.when(nz, last_bin - first_bin + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_bins"),
    )


def golden_record_merge(
    key_col: str,
    feeds: list[tuple[DataFrame, list[str]]],
) -> DataFrame:
    """Golden-record (survivorship) merge: one row per key assembled
    from N source feeds by TRUST ORDER — for every field, the value from
    the highest-priority feed that has it (non-null), the classic MDM
    merge a corpus pipeline runs when the same entity arrives from
    multiple ingest systems. ``feeds`` is priority-ordered
    ``(frame, [field, ...])``; a field may appear in several feeds.

    Plan: a chain of FULL OUTER joins on the key (no feed may drop keys
    the others know) + ``coalesce`` per field in priority order. Every
    join keys on ``key_col``, so the first shuffle's partitioning is
    reused by each subsequent join and there is no broadcast assumption
    — feeds are fact-sized, not dims. Field conflict resolution is pure
    projection (codegen), zero extra passes.
    """
    field_sources: dict[str, list[Column]] = {}
    merged: DataFrame | None = None
    for i, (frame, fields) in enumerate(feeds):
        renamed = frame.select(
            F.col(key_col),
            *[F.col(f).alias(f"_{i}_{f}") for f in fields],
        )
        merged = (
            renamed
            if merged is None
            else merged.join(renamed, key_col, "full_outer")
        )
        for f in fields:
            field_sources.setdefault(f, []).append(F.col(f"_{i}_{f}"))
    assert merged is not None, "golden_record_merge needs at least one feed"
    return merged.select(
        key_col,
        *[
            F.coalesce(*cols).alias(f) if len(cols) > 1 else cols[0].alias(f)
            for f, cols in field_sources.items()
        ],
    )
