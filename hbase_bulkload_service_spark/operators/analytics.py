"""Analytical operators beyond the reference's aggregation surface:
grouping-set rollups, exact distributed quantiles, and per-key running
window analytics.

The reference's only aggregations are latest-version dedup and the 5-min
rollup (SURVEY.md §2.E); everything here is new capability layered on the
same Catalyst hash-aggregate / window machinery, designed so every output
is integer-exact (cross-engine oracle-able, no float-summation drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.session import local_frame


def rollup_cube(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[Column],
    cube: bool = False,
) -> DataFrame:
    """Grouping-sets aggregation (ROLLUP by default, CUBE on request).

    Spark plans grouping sets as ONE Expand + hash aggregate — each input
    row is replicated once per grouping set map-side, then a single keyed
    shuffle aggregates all sets together (not one job per set). At 100 TB
    the Expand multiplies shuffle input by len(sets); partial aggregation
    collapses it before the exchange, so the shuffle stays ~output-sized.
    """
    grouped = df.cube(*dims) if cube else df.rollup(*dims)
    return grouped.agg(*aggs)


def group_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group discrete quantiles: for each p, the value at rank
    ``ceil(p * n)`` in ascending order (the classic PERCENTILE_DISC
    definition — always an actual element, integer-exact, no
    interpolation convention to disagree on across engines).

    Plan: ONE shuffle on ``key_col`` (window rank + window count share the
    partitioning), then a map-side explode of the probe ranks and an
    equality filter. No second aggregate pass. At 100 TB per-group state
    is a partition-local sort — the same cost profile as any windowed
    analytic; for extreme cardinality-1 skew use approx_percentile
    instead (sketch-mergeable, but no longer oracle-exact).

    ``ps`` must lie in (0, 1]: rank ``ceil(p*n)`` is 1-based, so p<=0
    would silently emit no row for that probe — rejected loudly instead.
    """
    bad = [p for p in ps if not 0.0 < float(p) <= 1.0]
    if bad:
        raise ValueError(
            f"quantile probes must be in (0, 1], got {bad} — p=0 has no "
            "1-based rank (PERCENTILE_DISC of p→0 is the minimum: use a "
            "tiny positive p or MIN directly)"
        )
    w = Window.partitionBy(key_col).orderBy(value_col)
    wall = Window.partitionBy(key_col)
    ranked = df.select(
        key_col,
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    probes = F.array(*[F.lit(float(p)) for p in ps])
    return (
        ranked.withColumn("p", F.explode(probes))
        .filter(F.col("rn") == F.ceil(F.col("p") * F.col("n")).cast("int"))
        .select(
            key_col,
            "p",
            F.col("v").alias("quantile_value"),
            F.col("n").alias("group_n"),
        )
    )


def running_user_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    cents_col: str = "cents",
) -> DataFrame:
    """Per-key ordered analytics: running total, previous-event gap, and
    ordinal — lag/lead + running sum sharing ONE keyed shuffle (all three
    windows have identical partitioning+ordering, so Catalyst plans a
    single Exchange + partition-local sort, one Window operator).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        key_col,
        "event_id",
        ts_col,
        F.col(cents_col),
        F.sum(cents_col).over(run).alias("running_cents"),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("gap_ms"),
        F.row_number().over(w).alias("seq"),
    )


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """Per-key forward fill (gap fill): each null in ``value_col`` takes
    the most recent non-null value earlier in the key's ordered series;
    leading nulls stay null.

    ``last(ignorenulls)`` over a running frame — ONE keyed shuffle plus a
    partition-local sort, exactly the D2 cost profile. No state beyond
    the frame's single carried value, so the fill streams through 100 TB
    of series data without per-key materialization. ``order_cols`` must
    be a per-key unique ordering (pass a tiebreaker column) or the fill
    is nondeterministic.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def scd2_history(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 interval build: an append-only
    update log (key, ts, attrs) becomes one validity interval per update
    with ``valid_from = ts`` and ``valid_to = next update's ts`` (open
    interval, NULL = still current).

    The training-data-lineage primitive: "what did this record look like
    when the snapshot was taken" becomes a range join against these
    intervals. ONE keyed shuffle (lead window); the interval build never
    compares rows across keys, so key-hash partitioning scales linearly.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(w)
    return updates.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group z-score anomaly flagging: rows where
    ``|x - mean(group)| > threshold * stddev_samp(group)``.

    Two-pass shape: a tiny per-group stats aggregate (one keyed shuffle,
    output = #groups rows) broadcast-joined back onto the stream — the
    scan side is touched exactly twice and never shuffled on the join.
    The comparison is kept in the multiplied form (no division) so
    zero-variance groups flag nothing instead of dividing by zero.
    """
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sigma"),
    )
    joined = df.join(F.broadcast(stats), key_col)
    return (
        joined.filter(
            F.abs(F.col(value_col) - F.col("_mu"))
            > F.lit(float(threshold)) * F.col("_sigma")
        )
        .select(key_col, *id_cols, value_col)
    )


def sketch_profile(
    df: DataFrame,
    key_col: str,
    distinct_col: str,
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Sketch-based per-group profile: HyperLogLog++ distinct count
    (``approx_count_distinct``, relative sd ``rsd``) and a GK quantile
    sketch median (``percentile_approx``) beside the exact row count.

    The 100 TB path for cardinality/quantile profiling: both sketches are
    bounded-size and merge associatively, so the plan is a partial
    aggregate per partition + one tiny keyed shuffle of sketch states —
    no sort, no second pass, unlike exact distinct-count (full shuffle of
    the distinct column) or exact quantiles (per-group sort). Sketch
    outputs are deterministic for a given input but NOT portable across
    engines — correctness is bounded by tests against the exact
    aggregates (±rsd), not by the cross-engine hash oracle.
    """
    return df.groupBy(key_col).agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
        F.percentile_approx(value_col, 0.5, 10000).alias("approx_median"),
    )


def sketch_accuracy(
    df: DataFrame,
    key_col: str,
    distinct_col: str,
    value_col: str,
    distinct_err_ppm: int = 150_000,
    rank_err_ppm: int = 10_000,
) -> DataFrame:
    """Oracle-able derivative of :func:`sketch_profile`: per-key EXACT
    distinct count and row count beside two BOOLEAN accuracy verdicts —
    the HLL++ estimate within ``distinct_err_ppm`` of exact, and the GK
    median's true rank within ``rank_err_ppm`` of the 50th percentile.

    Sketch STATES are engine-specific (never cross-engine comparable),
    but these verdicts are: a DuckDB oracle computes the exact side and
    asserts the booleans as literal TRUE, so the row hash-matches iff the
    sketches actually meet their error contracts on this data. Bounds
    are deliberately loose vs the configured guarantees (HLL rsd 0.05 →
    3σ = 150k ppm; GK accuracy 10000 → 100 ppm rank, checked at 10k ppm)
    so the gate pins "sketch works", not "sketch got lucky".

    All comparisons are integer (ppm algebra, no float crosses the
    verdict); safe to 2^63 past any per-key row count a 100 TB table
    produces (n * 1.02e6 overflows only beyond ~9e12 rows per key).
    Shape: the sketch pass (tiny keyed shuffle of sketch states), then
    one exact pass joined against the broadcast per-key estimates —
    2 linear scans; the exact countDistinct is the verification
    harness's cost, not the production profiling path (that's
    sketch_profile alone).
    """
    prof = sketch_profile(df, key_col, distinct_col, value_col).withColumnRenamed(
        key_col, "_sk_key"
    )
    v = F.col(value_col)
    # null-safe equi-join (<=>): a NULL key group still gets its sketch
    # row verified instead of silently dropping out of the output
    agg = (
        df.join(F.broadcast(prof), F.col(key_col).eqNullSafe(F.col("_sk_key")))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(F.col(distinct_col)).alias("exact_distinct"),
            F.max("approx_distinct").alias("_approx"),  # constant per key
            F.sum((v < F.col("approx_median")).cast("long")).alias("_below"),
            F.sum((v <= F.col("approx_median")).cast("long")).alias("_at_or_below"),
        )
    )
    million = F.lit(1_000_000)
    hll_ok = (
        F.abs(F.col("_approx") - F.col("exact_distinct")) * million
        <= F.lit(distinct_err_ppm) * F.col("exact_distinct")
    )
    # the estimated median's rank interval [_below+1, _at_or_below] must
    # intersect [n/2 - eps*n, n/2 + eps*n]  (integer form, x2 both sides)
    lo_ok = F.col("_at_or_below") * 2 * million >= (million - 2 * F.lit(rank_err_ppm)) * F.col("n_rows")
    hi_ok = F.col("_below") * 2 * million <= (million + 2 * F.lit(rank_err_ppm)) * F.col("n_rows")
    return agg.select(
        key_col,
        "n_rows",
        "exact_distinct",
        hll_ok.alias("hll_within_bound"),
        (lo_ok & hi_ok).alias("gk_rank_within_bound"),
    )


def pit_join(
    probes: DataFrame,
    history: DataFrame,
    key_col: str,
    probe_ts_col: str,
) -> DataFrame:
    """Point-in-time join: each probe row picks up the SCD-2 interval
    (from ``scd2_history``) covering its timestamp —
    ``probe_ts ∈ [valid_from, valid_to)`` with NULL valid_to = open.

    The lineage probe: "the record as of snapshot time", with no risk of
    the future leaking into training features. Plans as an equi-join on
    ``key_col`` with the range bounds as a post-join filter — both sides
    hash-partition on the key, no broadcast of the (large) history
    needed, and each key's intervals are disjoint by construction so the
    match is at most one per probe (inner: probes before the first
    interval drop out).
    """
    h = history.select(
        F.col(key_col).alias("__k"),
        *[c for c in history.columns if c not in (key_col,)],
    )
    cond = (
        (probes[key_col] == h["__k"])
        & (probes[probe_ts_col] >= h["valid_from"])
        & (h["valid_to"].isNull() | (probes[probe_ts_col] < h["valid_to"]))
    )
    return probes.join(h, cond, "inner").drop("__k")


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group (row_number ≤ k over a deterministic total
    order — pass a unique tiebreaker in ``order_cols`` or ranks are
    nondeterministic).

    One keyed shuffle; Spark's WindowGroupLimit pushes the k-limit into
    the partition-local sort (each task keeps a k-heap per group rather
    than fully sorting), so per-group state is O(k) even on skewed
    groups — the grouped analog of G4's global top-k.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def ntile_split(
    df: DataFrame,
    strat_col: str,
    order_col: str,
    n: int = 10,
    holdout_folds: tuple[int, int] = (9, 10),
) -> DataFrame:
    """Deterministic stratified train/val/test assignment via NTILE:
    within each stratum (ordered by a unique key so the assignment is
    reproducible), fold ≤ holdout_folds[0]-1 → train, holdout_folds[0]
    → val, holdout_folds[1] → test. Equal-sized folds per stratum —
    unlike hash-mod sampling (curation.stratified_sample) the split
    fractions are exact, at the cost of one keyed shuffle + sort.
    """
    val_fold, test_fold = holdout_folds
    w = Window.partitionBy(strat_col).orderBy(order_col)
    fold = F.ntile(n).over(w)
    return df.withColumn("fold", fold).withColumn(
        "split",
        F.when(F.col("fold") == test_fold, F.lit("test"))
        .when(F.col("fold") == val_fold, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def funnel_conversion(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_step: str,
    second_step: str,
    within_ms: int,
) -> DataFrame:
    """Two-step funnel: for each key that performed ``first_step``, find
    the earliest ``second_step`` strictly AFTER the first step's earliest
    occurrence and flag conversion within ``within_ms``.

    Plan shape: one keyed aggregate for the first step (output =
    converting-key count, small), re-joined onto the second-step stream
    on the key — both sides hash-partition on the key, the post-join
    ordering filter (`ts > t_first`) runs map-side, and a second keyed
    aggregate takes the min. Strictly-after semantics prevent the
    same-timestamp ambiguity from counting a purchase that raced the
    click. ``firsts`` feeds two consumers that prune it differently
    (the q214/q216 exchange-reuse class — r07 sweep: events scanned 3x
    before the persist), so it is persisted; it is first-step-key
    cardinality, storage-bounded via cachereg.
    """
    from hbase_bulkload_service_spark import cachereg

    firsts = (
        events.filter(F.col(type_col) == first_step)
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("t_first"))
        .persist()
    )
    cachereg.register(firsts, family="funnel")
    seconds = (
        events.filter(F.col(type_col) == second_step)
        .join(firsts, key_col)
        .filter(F.col(ts_col) > F.col("t_first"))
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("t_second"))
    )
    return firsts.join(seconds, key_col, "left").select(
        key_col,
        "t_first",
        "t_second",
        F.when(
            F.col("t_second").isNotNull()
            & (F.col("t_second") - F.col("t_first") <= within_ms),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted"),
    )


def retention_cohorts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_ms: int = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Cohort retention matrix: each key's cohort is its first-activity
    time bucket; output counts distinct keys per (cohort, offset) where
    offset = activity bucket - cohort bucket.

    Three keyed shuffles, all on ``key_col`` or the (small) output key:
    first-activity aggregate, distinct (key, bucket) activity pairs, and
    the final (cohort, offset) count — the cohort table joins back on
    the SAME key partitioning, so Catalyst reuses the exchange rather
    than re-shuffling. No broadcast hint: at 100 TB the key dimension is
    itself large; AQE may still choose broadcast when it measures small.
    """
    bucket = (F.col(ts_col) / F.lit(bucket_ms)).cast("long")
    firsts = events.groupBy(key_col).agg(F.min(bucket).alias("cohort"))
    activity = events.select(key_col, bucket.alias("bucket")).distinct()
    return (
        activity.join(firsts, key_col)
        .groupBy(
            "cohort", (F.col("bucket") - F.col("cohort")).alias("offset")
        )
        .agg(F.count_distinct(F.col(key_col)).alias("n_keys"))
    )


def fixed_width_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: int,
    hi: int,
    n_buckets: int,
) -> DataFrame:
    """Per-key fixed-width histogram over an integer value column:
    bucket i covers ``[lo + i*w, lo + (i+1)*w)`` with
    ``w = ceil((hi - lo) / n_buckets)``; values outside [lo, hi) clamp
    into the edge buckets (so counts always total the row count — the
    profiling convention, no silent drops).

    Pure integer arithmetic → ONE keyed hash aggregate with map-side
    combine; output is n_buckets rows per key regardless of input size,
    which is the 100 TB histogram shape (no sort, no sampling). For
    unknown value ranges run a min/max pass first or use the GK sketch
    (sketch_profile) instead.
    """
    if n_buckets <= 0 or hi <= lo:
        raise ValueError("need n_buckets > 0 and hi > lo")
    w = -((hi - lo) // -n_buckets)  # ceil division
    # integer floor division (`div`), not double division: doubles lose
    # exactness past 2^53 and can round a value across a bucket boundary,
    # diverging from the integer `//` the DuckDB oracle uses
    raw = F.expr(f"(({value_col} - {lo}) div {w})")
    bucket = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw))
    return (
        df.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("bucket_lo", F.lit(lo) + F.col("bucket") * F.lit(w))
        .withColumn("bucket_hi", F.lit(lo) + (F.col("bucket") + 1) * F.lit(w))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event sequences — the
    user-journey / Markov-chain profile: for every ordered pair of
    consecutive events of the same user, count (from_type -> to_type)
    and its per-from-state share in integer ppm.

    Ordering is (ts, tiebreak) so simultaneous events resolve
    deterministically — the same discipline as scd2_history.

    Scale shape: ONE user-keyed exchange feeds the lead() window
    (per-user partition-local sort, state O(1) per row); the transition
    count is a hash agg whose output is |event types|^2 rows —
    independent of input size — so the share window over from_type runs
    on a handful of rows. Nothing after the first exchange is
    data-sized."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    nxt = events.select(user_col, type_col, ts_col, tiebreak_col).withColumn(
        "to_type", F.lead(type_col).over(w)
    )
    return (
        nxt.filter(F.col("to_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "to_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "share_ppm",
            F.expr(
                "(cnt * 1000000) div (sum(cnt) OVER (PARTITION BY from_type))"
            ),
        )
    )


def heavy_hitters(df: DataFrame, item_col: str, phi_ppm: int = 10_000) -> DataFrame:
    """EXACT frequent items: every item occurring in at least ``phi_ppm``
    parts-per-million of the rows, with its exact count — the corpus
    heavy-hitter op (dominant tokens, hot keys, over-represented URLs)
    in the two-pass Misra-Gries shape that survives 100 TB.

    Pass 1 streams each partition through a Misra-Gries summary with
    k = 2·ceil(1e6/phi_ppm) counters (Arrow-batched mapInPandas, state
    O(k) per task) and emits only the surviving (item, lower_bound)
    counters plus the partition's row count — so NOTHING item-keyed
    shuffles at data scale; the summary is ≤ k rows per partition. Each
    Arrow batch is pre-counted vectorized (value_counts) and merged as a
    WEIGHTED MG update (mergeable-summaries form): when the summary
    exceeds k counters, subtract the (k+1)-th largest count from all and
    drop the non-positive. Every reduction removes ≥ (k+1)·sub mass, so
    Σ subs ≤ n_p/(k+1): per-partition undercount ≤ n_p/(k+1), total
    ≤ n/(k+1) < n·phi/2 — strictly less than the φ·n threshold, so every
    true heavy hitter appears in some summary: the merged candidate set
    is a guaranteed superset (and at most partitions·k rows). The
    reduction runs at most once per batch (not per row — the dict is
    rebuilt O(n·k/batch) worst case, amortized O(1)/row at Arrow batch
    sizes), and candidate EXACTNESS never depends on it: pass 2 recounts.

    Pass 2 recounts ONLY the candidates exactly (broadcast semi join on
    the scan, then a hash agg over candidate rows) and applies the
    integer threshold ``cnt·1e6 ≥ phi_ppm·n`` — no float crosses the
    verdict. Output: (item, cnt), exact, oracle-able as a plain GROUP BY
    ... HAVING. NULL items are ignored (SQL count semantics).
    """
    if not (0 < phi_ppm <= 1_000_000):
        raise ValueError("phi_ppm must be in (0, 1e6]")
    import pandas as pd

    k = 2 * -(-1_000_000 // phi_ppm)  # 2*ceil(1/phi) counters

    def mg_summaries(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            vc = pdf[item_col].value_counts(dropna=True)  # vectorized count
            n_rows += int(vc.sum())
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # weighted-MG reduction, once per batch: subtract the
                # (k+1)-th largest count everywhere, drop non-positives
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - sub for i, c in counters.items() if c > sub}
        out = pd.DataFrame(
            {"item": list(counters), "lb": list(counters.values())}
        )
        yield pd.concat(
            [out, pd.DataFrame({"item": [None], "lb": [n_rows]})],
            ignore_index=True,
        )

    item_type = df.schema[item_col].dataType.simpleString()
    summaries = df.select(item_col).mapInPandas(
        mg_summaries, f"item {item_type}, lb long"
    )
    # bounded: partitions*k + partitions rows — collect is metadata-scale
    rows = summaries.groupBy("item").agg(F.sum("lb").alias("lb")).collect()
    total = next(r["lb"] for r in rows if r["item"] is None)
    candidates = [r["item"] for r in rows if r["item"] is not None]
    if not candidates or total == 0:
        return local_frame(df.sparkSession, [], f"item {item_type}, cnt long")
    spark = df.sparkSession
    cand_df = local_frame(spark, [(c,) for c in candidates], f"item {item_type}")
    return (
        df.select(F.col(item_col).alias("item"))
        .join(F.broadcast(cand_df), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(
            # long arithmetic on both sides: phi_ppm*total exceeds int32
            # as soon as the corpus passes ~2^31/phi tokens (ANSI would
            # raise, non-ANSI would silently wrap)
            F.col("cnt") * F.lit(1_000_000).cast("long")
            >= F.lit(int(phi_ppm)).cast("long") * F.lit(int(total)).cast("long")
        )
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the count-of-counts profile every
    100 TB shuffle plan should be checked against before picking a join
    strategy (salting threshold, AQE skew-join expectations, broadcast
    viability all read directly off it).

    Two map-side-combined hash aggregates: per-key counts, then a
    histogram of those counts in log2 buckets — bucket = floor(log2(cnt))
    computed EXACTLY as ``length(base2(cnt)) - 1`` (integer-string, no
    libm log2 whose last-bit rounding could differ across engines).
    Output: one row per occupied bucket — (log2_bucket, n_keys, n_rows,
    min_cnt, max_cnt); a healthy key has its mass in low buckets, a
    skewed key shows a lonely high bucket holding a large n_rows share.
    NULL keys are profiled too (they hash-collide like any value).
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    bucket = (F.length(F.conv(F.col("cnt"), 10, 2)) - 1).cast("int")
    return (
        counts.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.min("cnt").alias("min_cnt"),
            F.max("cnt").alias("max_cnt"),
        )
    )


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence,
    part_cols: Sequence[str] = (),
    n_shards: int = 32,
    out_col: str = "cum",
    checkpoint: bool = True,
) -> DataFrame:
    """Scalable exact prefix (cumulative) sum in a global order — the
    primitive behind output-file sharding, greedy budgeted selection and
    quota cutoffs, which a naive ``SUM() OVER (ORDER BY ...)`` cannot
    provide at scale: an un-partitioned window collapses the whole
    dataset onto ONE task (Spark plans it as ``Exchange SinglePartition``
    — the canonical 100 TB scale-killer).

    Two-job shape with exactly ONE full-data exchange:

    1. ``repartitionByRange(n_shards, part+order)`` + an in-partition
       sort — contiguous, globally ordered shards (Spark's scalable sort
       machinery: sampled split points, no coordinator).
    2. Per-(shard, group) totals — a bounded metadata aggregate
       (``n_shards x |groups|`` rows) collected and turned into running
       offsets per group in shard order.
    3. One Arrow-batched ``mapInPandas`` pass over the already-sorted
       shards: streaming local cumsum with a carry across batches
       (resets at group boundaries — groups are contiguous within a
       sorted shard) plus the broadcast-joined shard offset. No second
       full-data exchange: the offsets join broadcasts and the cumsum is
       an order-preserving map over the range-partitioned shards.

    Contract: ``order_cols`` (names or Columns, ``.desc()`` allowed) must
    form a UNIQUE total order within each group (tie-break with a key
    column) so ROWS and RANGE window semantics coincide — the result is
    then bit-identical to ``SUM(value) OVER (PARTITION BY part ORDER BY
    order)``. ``value_col`` must be integer and non-null (nulls
    accumulate as 0, which diverges from SQL's leading-NULL window
    convention). ``part_cols`` must be low-cardinality (the offset table
    is driver-materialized, like q53's catalog aggregates); NULL group
    keys are legal (null-safe offset join + None-normalized pandas
    grouping). For high-cardinality small groups use a plain partitioned
    window instead — no skew exists there by definition.

    Consistency: the sharded frame is ``localCheckpoint(eager=True)``'d
    before the offsets are collected. Range split points come from
    sampling, so a RE-materialization could legally draw different shard
    boundaries than the ones the collected offsets describe — silent
    wrong sums. The eager checkpoint freezes the materialization the
    offsets were computed from; losing its blocks (executor death) fails
    the job LOUDLY instead (at cluster scale, use a reliable checkpoint
    dir). ``checkpoint=False`` keeps the lazy lineage for plan
    inspection/tests only.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    clash = {"_shard", "_off", out_col} & set(df.columns)
    if clash:
        raise ValueError(f"prefix_sum: column name collision {sorted(clash)}")
    from pyspark.sql import types as T

    part_cols = list(part_cols)
    keys = [*[F.col(c) for c in part_cols],
            *[F.col(c) if isinstance(c, str) else c for c in order_cols]]
    sharded = (
        df.repartitionByRange(n_shards, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_shard", F.spark_partition_id())
    )
    if checkpoint:
        sharded = sharded.localCheckpoint(eager=True)
    totals = sharded.groupBy("_shard", *part_cols).agg(
        F.sum(F.col(value_col)).alias("_tot")
    ).collect()

    run: dict[tuple, int] = {}
    off_rows = []
    for r in sorted(totals, key=lambda r: r["_shard"]):
        g = tuple(r[c] for c in part_cols)
        off_rows.append((r["_shard"], *g, run.get(g, 0)))
        run[g] = run.get(g, 0) + int(r["_tot"] or 0)
    off_schema = T.StructType(
        [T.StructField("_shard", T.IntegerType())]
        + [df.schema[c] for c in part_cols]
        + [T.StructField("_off", T.LongType())]
    )
    off = local_frame(df.sparkSession, off_rows, off_schema)
    # null-safe on the group keys: a NULL group must still find its offset
    cond = sharded["_shard"] == off["_shard"]
    for c in part_cols:
        cond = cond & sharded[c].eqNullSafe(off[c])
    joined = sharded.join(F.broadcast(off), cond, "left").select(
        *[sharded[c] for c in (*df.columns, "_shard")], off["_off"]
    )

    orig_cols = df.columns
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def cum(batches):
        carry_key, carry = None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf[value_col].fillna(0)
            if part_cols:
                # normalize missing keys to the None singleton: NaN != NaN
                # would split a NULL group into per-row groups
                norm = pdf[part_cols].astype(object)
                norm = norm.where(norm.notna(), None)
                gkeys = norm.apply(tuple, axis=1)
                local = vals.groupby(gkeys, sort=False).cumsum()
                if carry_key is not None:
                    local = local + (gkeys == carry_key) * carry
                carry_key = gkeys.iloc[-1]
            else:
                local = vals.cumsum() + carry
                carry_key = ()
            carry = int(local.iloc[-1])
            out = pdf[orig_cols].copy()
            out[out_col] = (local + pdf["_off"]).astype("int64")
            yield out

    return joined.mapInPandas(cum, out_schema)


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Per-group winsorized (clipped-tail) statistics — the standard
    robust-mean move before aggregating noisy metrics: values below the
    group's lo_p quantile clamp up to it, values above hi_p clamp down,
    and the clipped sum/count feed a mean that outliers cannot drag.
    Quantiles use the PERCENTILE_DISC rank-``ceil(p·n)`` definition
    (an actual element, integer-exact — same convention as
    group_quantiles, so both engines pick the identical cut points).

    Output per group: ``n``, ``lo`` / ``hi`` (the cut values),
    ``win_sum`` (sum after clamping), ``n_clip_lo`` / ``n_clip_hi``
    (rows that clamped). All integers when the input is integer.

    Plan: ONE keyed exchange — the rank window, the count window, and
    the two cut-point windows (max over the rank prefix ==
    value-at-rank, since the order is ascending) all share the
    partitioning, and the final groupBy re-uses it (no second
    shuffle). Same 100 TB profile as any windowed analytic; the
    cardinality-1-skew caveat from group_quantiles applies.
    """
    if not (0.0 < lo_p < hi_p <= 1.0):
        raise ValueError("need 0 < lo_p < hi_p <= 1")
    w = Window.partitionBy(key_col).orderBy("v")
    wall = Window.partitionBy(key_col)
    v = F.col("v")
    # NULL values are EXCLUDED (documented): Spark sorts NULLS FIRST
    # ascending, DuckDB NULLS LAST — an in-band NULL would silently skew
    # the rank-based cut points differently per engine
    ranked = df.select(
        key_col, F.col(value_col).alias("v")
    ).filter(v.isNotNull()).select(
        key_col,
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    lo_rank = F.ceil(F.lit(lo_p) * F.col("n")).cast("int")
    hi_rank = F.ceil(F.lit(hi_p) * F.col("n")).cast("int")
    cut = ranked.select(
        key_col,
        "v",
        "n",
        F.max(F.when(F.col("rn") <= lo_rank, v)).over(wall).alias("lo"),
        F.max(F.when(F.col("rn") <= hi_rank, v)).over(wall).alias("hi"),
    )
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return cut.groupBy(key_col).agg(
        F.max("n").alias("n"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum(clamped).alias("win_sum"),
        F.sum(F.when(v < F.col("lo"), 1).otherwise(0)).alias("n_clip_lo"),
        F.sum(F.when(v > F.col("hi"), 1).otherwise(0)).alias("n_clip_hi"),
    )


def group_mode(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Exact per-group mode (most frequent value; ties resolve to the
    SMALLEST value so the result is deterministic and engine-portable).
    Output: (key, mode_value, mode_count, n_distinct).

    Plan: hash agg on (key, value) — map-side combined, so the shuffle
    carries distinct pairs, not rows — then a (cnt DESC, value ASC)
    row_number window on the key. The window input is the distinct-pair
    table (bounded by value cardinality per key), NOT the raw corpus:
    at 100 TB the heavy lifting happens in the combiner.

    NULL values are excluded (mode of the non-null values): Spark's ASC
    sort puts NULL first, DuckDB's puts it last, so an in-band NULL
    tie-breaks differently per engine.
    """
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col, value_col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("cnt").desc(), F.col(value_col).asc()
    )
    wall = Window.partitionBy(key_col)
    return (
        counted.select(
            key_col,
            F.col(value_col).alias("mode_value"),
            "cnt",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wall).alias("n_distinct"),
        )
        .filter(F.col("rn") == 1)
        .select(
            key_col,
            "mode_value",
            F.col("cnt").alias("mode_count"),
            "n_distinct",
        )
    )


def mad_outliers(
    df: DataFrame, key_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation —
    the outlier detector that survives what breaks zscore_outliers: a
    single extreme value inflates the stddev enough to mask itself,
    while the median and MAD barely move. Output per group:
    ``(key, n, med, mad, n_outliers)`` where an outlier is
    ``|v - med| > k * mad`` (strict, integer-exact).

    Both medians are exact rank selections (value at rank
    ``(n+1) div 2`` of the ascending sort — PERCENTILE_DISC semantics,
    no interpolation, so integers stay integers cross-engine).

    Plan: ONE keyed exchange — the value-rank window, the deviation-rank
    window, and the final agg all partition on the group key (two
    partition-local sort passes, no re-shuffle). NULL values are
    excluded (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST — an
    in-band NULL would skew the rank cut differently per engine).
    Same cardinality-skew caveat as group_quantiles: a single giant
    group serializes into one task.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    v = F.col("v")
    wv = Window.partitionBy(key_col).orderBy("v")
    wall = Window.partitionBy(key_col)
    ranked = (
        df.select(key_col, F.col(value_col).alias("v"))
        .filter(v.isNotNull())
        .select(
            key_col,
            "v",
            F.row_number().over(wv).alias("rn"),
            F.count("*").over(wall).alias("n"),
        )
    )
    med_rank = F.expr("(n + 1) div 2")
    with_med = ranked.select(
        key_col,
        "v",
        "n",
        F.max(F.when(F.col("rn") <= med_rank, v)).over(wall).alias("med"),
    )
    dev = F.abs(v - F.col("med"))
    wd = Window.partitionBy(key_col).orderBy("dev")
    deviated = with_med.select(
        key_col, "n", "med", dev.alias("dev")
    ).select(
        key_col,
        "n",
        "med",
        "dev",
        F.row_number().over(wd).alias("rn2"),
    )
    with_mad = deviated.select(
        key_col,
        "n",
        "med",
        "dev",
        F.max(F.when(F.col("rn2") <= med_rank, F.col("dev")))
        .over(wall)
        .alias("mad"),
    )
    return with_mad.groupBy(key_col).agg(
        F.max("n").alias("n"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum(
            F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
        ).alias("n_outliers"),
    )


def group_trend(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Exact per-group least-squares trend — the drift detector: is this
    metric / quality score / token count rising or falling over time?
    Emits the slope as an exact integer RATIONAL ``(num, den)`` —
    ``slope = num/den = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)`` — plus a
    truncating ``slope_ppm = num div (den div 1e6)`` convenience
    (NULL when den < 1e6 or the group is degenerate: n < 2 or all x
    equal). No float ever crosses the verdict.

    x is CENTERED at the per-group minimum before the moments are
    summed, which is what makes int64 arithmetic possible at all:
    epoch-millis x values square to ~3.6e24, centered-and-scaled ones
    don't. Caller contract: scale x so that
    ``n^2 * max(xc*y, xc^2) < 2^63`` per group — and note the n^2: a
    10x row-count growth costs 100x headroom (the 10x linearity probe
    OVERFLOWED a minutes-unit configuration that was fine at sf0.1;
    the q143 gate uses hours for two decades of margin). At corpus
    scale, bucket x coarsely or regress per-slot aggregates; an
    overflow raises loudly under ANSI mode rather than corrupting the
    slope.

    Plan: ONE keyed exchange — the min-x window and the moment agg share
    the group-key partitioning; the moment sums are map-side combined.
    """
    x, y = F.col(x_col), F.col(y_col)
    wall = Window.partitionBy(key_col)
    centered = df.filter(x.isNotNull() & y.isNotNull()).select(
        key_col,
        (x - F.min(x).over(wall)).alias("xc"),
        y.alias("yv"),
    )
    agg = centered.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xc") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
    )
    return agg.select(
        key_col,
        "n",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
    ).withColumn(
        "slope_ppm", F.expr("num div nullif(den div 1000000, 0)")
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
    slot_ms: int = 3_600_000,
) -> DataFrame:
    """Periodic (seasonal) baseline per series — the hour-of-day /
    day-of-week profile anomaly detectors diff against: slot =
    ``(ts div slot_ms) % period``, and per (key, slot) the count, sum,
    and a seasonality index ``idx_ppm`` = slot mean / series mean in
    truncating integer ppm (``(sum*1e6 div n) div (tsum div tn)``,
    NULL for a zero series mean). idx_ppm > 1e6 ⇒ the slot runs hot.

    Epoch arithmetic only — hour-of-day means UTC hour, timezone-proof
    by construction (shifting the phase is the caller's one-liner).

    Plan: hash agg on (key, slot) — map-side combined, the exchange
    carries at most key_cardinality x period rows — then series totals
    via a window on the already-tiny profile table. int64 bound:
    sum*1e6 < 2^63 ⇒ per-slot value sums below ~9.2e12, document-scale
    cents clear it by orders of magnitude.
    """
    if period < 1 or slot_ms < 1:
        raise ValueError("period and slot_ms must be >= 1")
    ts, v = F.col(ts_col), F.col(value_col)
    slot = F.expr(f"({ts_col} div {slot_ms}) % {period}")
    prof = (
        df.filter(ts.isNotNull() & v.isNotNull())
        .groupBy(key_col, slot.alias("slot"))
        .agg(F.count("*").alias("n"), F.sum(v).alias("sum_v"))
    )
    wall = Window.partitionBy(key_col)
    return prof.select(
        key_col,
        "slot",
        "n",
        "sum_v",
        F.expr(
            "(sum_v * 1000000 div n) div "
            "nullif(sum(sum_v) over (partition by {k}) div "
            "sum(n) over (partition by {k}), 0)".format(k=key_col)
        ).alias("idx_ppm"),
    )


def histogram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: int,
    width: int,
    n_buckets: int,
    flag_ppm: int = 2000,
) -> DataFrame:
    """Distribution drift between two dataset snapshots as a fixed-bin
    histogram delta — the population-stability check run before
    swapping a training corpus or promoting a model: per bin, each
    side's row share in truncating integer ppm and the share delta,
    flagged when ``|delta_ppm| > flag_ppm``. Out-of-range values clamp
    into the edge bins (a drifting tail lands in bin 0 / n-1 and flags
    there, instead of silently widening the domain).

    Output per non-empty bin: (bucket, n_a, n_b, ppm_a, ppm_b,
    delta_ppm, flagged); a side absent from a bin contributes 0.

    Plan: two tagged scans union → ONE hash agg on the bucket id
    (map-side combined — the exchange carries at most n_buckets rows
    per mapper) → side totals as a global agg broadcast back with a
    1-row cross join. Nothing after the combiner exceeds n_buckets
    rows; the comparison never joins the corpora row-wise.
    """
    if width < 1 or n_buckets < 1:
        raise ValueError("width and n_buckets must be >= 1")
    v = F.col(value_col)
    bucket = F.least(
        F.greatest(F.expr(f"({value_col} - {lo}) div {width}"), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("long")
    tagged = df_a.filter(v.isNotNull()).select(
        bucket.alias("bucket"), F.lit(1).alias("ia"), F.lit(0).alias("ib")
    ).unionByName(
        df_b.filter(v.isNotNull()).select(
            bucket.alias("bucket"), F.lit(0).alias("ia"), F.lit(1).alias("ib")
        )
    )
    per_bin = tagged.groupBy("bucket").agg(
        F.sum("ia").cast("long").alias("n_a"),
        F.sum("ib").cast("long").alias("n_b"),
    )
    totals = per_bin.groupBy().agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    ppm_a = F.expr("n_a * 1000000 div nullif(tot_a, 0)")
    ppm_b = F.expr("n_b * 1000000 div nullif(tot_b, 0)")
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            ppm_a.alias("ppm_a"),
            ppm_b.alias("ppm_b"),
            (ppm_a - ppm_b).alias("delta_ppm"),
            (F.abs(ppm_a - ppm_b) > flag_ppm).alias("flagged"),
        )
    )


def cogroup_merge_stats(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key alignment of two event streams via COGROUPED
    applyInPandas — the two-sided grouped-map surface (each side's rows
    for one key arrive together as pandas frames): merge both streams
    in ``(ts, id)`` order and report how they interleave — counts, the
    number of side SWITCHES in the merged order, and an md5 of the
    merged side-sequence string (e.g. 'aabab...') that pins the exact
    interleaving, not a summary of it. The alternation profile is the
    cheap behavioral signal (browse-then-buy vs buy-in-bursts) and the
    merged-sequence hash is the building block for order-sensitive
    session features that pure SQL windows CAN also express — which is
    exactly why this operator exists: it gates the cogroup plumbing
    against a first-principles SQL oracle, so the genuinely
    imperative per-key mergers that follow it (sequence alignment,
    legacy parsers) inherit verified scaffolding.

    Output per key present on either side: (key, n_a, n_b, n_switches,
    seq_md5).

    Scale shape: ONE exchange keyed on ``key_col`` (Spark co-partitions
    both sides), Arrow-batched; state per task is one key's rows.
    Same skew caveat as any grouped-map: a single 100 TB key serializes
    — bound per-key cardinality upstream.

    The keying exchange is issued EXPLICITLY (user-numbered
    ``repartition(n, key)`` on both sides, which elides cogroup's own
    exchange) rather than left to the planner: per-GROUP Python-call
    overhead dominates this operator at small byte sizes, and AQE's
    byte-based coalesce folds the tiny shuffle into ONE task — the q36
    single-task-verify trap (measured on the q150 gate at sf0.1: 8.8 →
    2.3 s; user partition counts are AQE-exempt). At cluster scale the
    bytes are large and the explicit width is what AQE would pick
    anyway. ``num_partitions`` defaults to 2x the session parallelism.
    """
    import hashlib

    import pandas as pd

    def merge(pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
        key = pa[key_col].iloc[0] if len(pa) else pb[key_col].iloc[0]
        fa = pa[[ts_col, id_col]].assign(side="a")
        fb = pb[[ts_col, id_col]].assign(side="b")
        m = pd.concat([fa, fb], ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        seq = "".join(m["side"])
        switches = sum(
            1 for x, y in zip(seq, seq[1:]) if x != y
        )
        return pd.DataFrame(
            {
                key_col: [key],
                "n_a": [len(fa)],
                "n_b": [len(fb)],
                "n_switches": [switches],
                "seq_md5": [hashlib.md5(seq.encode()).hexdigest()],
            }
        )

    key_type = df_a.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_a long, n_b long,"
        " n_switches long, seq_md5 string"
    )
    if num_partitions is None:
        num_partitions = (
            df_a.sparkSession.sparkContext.defaultParallelism * 2
        )

    # NULL group keys rejected LOUDLY, map-side (the capped_stratum
    # pattern): Spark groups NULLs together, but Arrow->pandas turns a
    # null int64 key into float64 NaN, which fails the cast back to the
    # declared long key column — a deep worker-side crash (or, for
    # string keys, a silent oracle divergence) instead of a contract
    # error at the source.
    def _require_key(df: DataFrame) -> DataFrame:
        return df.filter(
            F.assert_true(
                F.col(key_col).isNotNull(),
                F.lit(
                    f"cogroup_merge_stats: NULL {key_col} — group keys "
                    "must be non-null"
                ),
            ).isNull()
        )

    ga = (
        _require_key(df_a.select(key_col, ts_col, id_col))
        .repartition(num_partitions, key_col)
        .groupBy(key_col)
    )
    gb = (
        _require_key(df_b.select(key_col, ts_col, id_col))
        .repartition(num_partitions, key_col)
        .groupBy(key_col)
    )
    return ga.cogroup(gb).applyInPandas(merge, out_schema)


def topn_other(
    df: DataFrame,
    group_col: str,
    item_col: str,
    value_col: str,
    n: int,
) -> DataFrame:
    """Top-N contributors per group with the long tail folded into one
    ``__other__`` row — the dashboard cardinality cap (every "top 10
    series + other" panel): per group keep the ``n`` items with the
    largest value sums (ties by item ascending, deterministic), and
    collapse everything else into a single row so the output is at most
    ``n + 1`` rows per group no matter how many distinct items exist.

    Output per group: ``item`` (or the literal ``__other__``), ``total``
    (sum of value), ``n_rows`` (contributing input rows), ``rank``
    (1..n; the other-row carries n+1) and ``is_other``.

    Scale shape: the input collapses to (group, item) cardinality at
    the FIRST hash aggregate (map-side combine does the 100 TB work);
    the rank window and the tail re-aggregate run on that reduced
    relation, re-using its group keying. ``__other__`` must not collide
    with a real item — rejected loudly in-plan (assert_true), since a
    silent merge would corrupt the fold.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    item = F.col(item_col)
    base = df.filter(
        F.assert_true(
            item.isNull() | (item.cast("string") != "__other__"),
            F.lit(
                f"topn_other: input {item_col} contains the reserved "
                "label '__other__'"
            ),
        ).isNull()
    )
    agg = base.groupBy(group_col, item_col).agg(
        F.sum(value_col).alias("total"), F.count("*").alias("n_rows")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("total").desc(), item.asc()
    )
    r = agg.withColumn("rank", F.row_number().over(w))
    top = r.filter(F.col("rank") <= n).select(
        group_col,
        item.cast("string").alias("item"),
        "total",
        "n_rows",
        "rank",
        F.lit(False).alias("is_other"),
    )
    other = (
        r.filter(F.col("rank") > n)
        .groupBy(group_col)
        .agg(F.sum("total").alias("total"), F.sum("n_rows").alias("n_rows"))
        .select(
            group_col,
            F.lit("__other__").alias("item"),
            "total",
            "n_rows",
            F.lit(n + 1).alias("rank"),
            F.lit(True).alias("is_other"),
        )
    )
    return top.unionByName(other)


def user_journeys(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    tiebreak_col: str = "event_id",
    max_steps: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top user journeys — frequent-path mining over per-user event
    sequences (the product-analytics "what do users actually do first"
    query; the FULL-path complement of :func:`event_transitions`'
    first-order matrix): each user's first ``max_steps`` events in
    ``(ts, tiebreak)`` order form a path string ``a>b>c``; paths are
    counted across users and the ``top_k`` most common are returned
    with a deterministic rank (ties: count desc, path asc).

    Scale shape: the rank window and the per-user path aggregate share
    ONE user-keyed exchange; truncation to ``max_steps`` happens BEFORE
    the path aggregate, so no user contributes more than ``max_steps``
    rows to it. The path-count aggregate is path-cardinality (bounded
    by |event types|^max_steps and in practice by user count) with
    map-side combine, and the final top-k is a TakeOrdered — never a
    full sort of the path table.
    """
    if max_steps < 1 or top_k < 1:
        raise ValueError("max_steps and top_k must be >= 1")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    first_n = (
        events.select(
            user_col,
            F.col(type_col).alias("__t"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") <= max_steps)
    )
    paths = first_n.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__t"))),
                lambda s: s["__t"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_users"))
    top = counts.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(
        top_k
    )
    w_rank = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(w_rank))


def ewma_control(
    events: DataFrame,
    spike_factor: int = 2,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Integer EWMA control chart per series: the exponentially-weighted
    moving average with the truncating half-life recurrence
    ``E_1 = x_1;  E_t = (E_{t-1} + x_t) div 2`` over cents-quantized
    values, plus a spike flag where ``x_t > spike_factor * E_{t-1}`` —
    the classic smoothed-baseline alert of a metrics pipeline (EWMA
    control charts, Roberts 1959), in the alpha=1/2 integer form so no
    float ever crosses a verdict.

    This recurrence is genuinely SEQUENTIAL (the truncation in every
    step breaks any closed-form/window rewrite — unlike q138's
    time-weighted average, there is no prefix-sum twin), so it is the
    canonical applyInPandas stateful operator: one keyed exchange
    groups each series, an Arrow-batched per-series loop carries the
    single-register state, and the DuckDB oracle replays it as a
    recursive CTE stepping rn -> rn+1. Per-series state is O(1); group
    sizes are per-key series lengths (bounded by key cardinality
    design, same contract as every window op in the TSDB family).

    Output: one row per event — (key, event_id, rn, x_cents,
    ewma_cents, spike) with rn the 1-based position in (ts, event_id)
    order and spike an 0/1 long (rn=1 is never a spike: no baseline).
    """
    if spike_factor < 1:
        raise ValueError("spike_factor must be >= 1")
    import pandas as pd

    base = events.select(
        F.col(key_col),
        F.col(id_col),
        F.col(ts_col),
        F.floor(F.col(value_col) * 100).cast("long").alias("x_cents"),
    )
    out_schema = (
        f"{key_col} long, {id_col} long, rn long, x_cents long, "
        "ewma_cents long, spike long"
    )

    def chart(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        xs = pdf["x_cents"].astype("int64").tolist()
        e = 0
        ew, sp = [], []
        for t, x in enumerate(xs):
            if t == 0:
                e = x
                sp.append(0)
            else:
                sp.append(1 if x > spike_factor * e else 0)
                e = (e + x) // 2  # nonneg ints: // == truncating div
            ew.append(e)
        out = pdf[[key_col, id_col, "x_cents"]].copy()
        out.insert(2, "rn", range(1, len(xs) + 1))
        out["ewma_cents"] = ew
        out["spike"] = sp
        return out

    # numbered repartition pin: the grouped-map stage is per-series
    # Python loops over tiny bytes (r06 stage audit: 2 AQE-coalesced
    # tasks x ~4.3 s on 2.6 MB at sf0.1) — the q36/q102/q130
    # CPU-per-byte trap. The pin satisfies the grouped-map's clustering
    # requirement, so no second exchange appears, and (unlike q176's
    # rejected pin) there is no partial aggregation to forfeit.
    from hbase_bulkload_service_spark.session import pinned_width

    return base.repartition(
        pinned_width(events.sparkSession), key_col
    ).groupBy(key_col).applyInPandas(chart, out_schema)


def stl_decompose(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type", "user_id"),
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 2,
    period: int = 24,
    slot_ms: int = 3_600_000,
) -> DataFrame:
    """STL-lite seasonal decomposition per series: every sample splits
    into ``x = trend + seasonal + resid`` with (a) trend = the centered
    (2k+1)-sample moving average (NULL at series edges — full windows
    only, so the trend is never biased by truncation), (b) seasonal =
    the per-(series, phase) mean of the detrended samples (phase =
    ``(ts div slot_ms) % period`` — hour-of-day by default), (c) resid
    = the rest — the classical decomposition (the one-pass inner loop of
    Cleveland et al. 1990's STL) that turns "value is 500" into "value
    is 30 above its hour-of-day norm for this series", the input anomaly
    detectors and capacity forecasts actually want. q144's seasonal
    index is the profile-only summary; this returns per-sample
    components.

    All arithmetic is integer cents with truncating division — Spark
    ``div`` and DuckDB ``//`` both truncate toward zero, including on
    the (negative-capable) detrended sums, so the oracle matches
    bit-for-bit with no offset tricks.

    Scale shape: ONE series-keyed exchange total — the (series, phase)
    seasonal window's clustering is satisfied by the series partitioning
    (superset keys), so Catalyst re-sorts the same partitions instead of
    re-exchanging (pinned in test_plan_contracts); the residual
    subtraction is map-side. No joins, no agg-then-join-back.
    """
    if k < 1 or period < 1 or slot_ms < 1:
        raise ValueError("need k >= 1, period >= 1, slot_ms >= 1")
    span = 2 * k + 1
    wt = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-k, k)
    )
    base = df.select(
        *key_cols,
        id_col,
        ts_col,
        F.floor(F.col(value_col) * 100).cast("long").alias("x_cents"),
    )
    trended = base.select(
        *key_cols,
        id_col,
        ts_col,
        "x_cents",
        F.sum("x_cents").over(wt).alias("__tsum"),
        F.count("*").over(wt).alias("__tcnt"),
    ).select(
        *key_cols,
        id_col,
        ts_col,
        "x_cents",
        F.when(
            F.col("__tcnt") == span, F.expr(f"__tsum div {span}")
        ).alias("trend_cents"),
    )
    detrended = trended.select(
        "*",
        (F.col("x_cents") - F.col("trend_cents")).alias("__detr"),
        F.expr(f"({ts_col} div {slot_ms}) % {period}").alias("phase"),
    )
    wp = Window.partitionBy(*key_cols, "phase")
    seasoned = detrended.select(
        "*",
        F.sum("__detr").over(wp).alias("__ssum"),
        F.count("__detr").over(wp).alias("__scnt"),
    ).select(
        *key_cols,
        id_col,
        ts_col,
        "x_cents",
        "phase",
        "trend_cents",
        F.when(
            F.col("__scnt") > 0, F.expr("__ssum div __scnt")
        ).alias("seasonal_cents"),
        F.col("__detr").alias("__detr"),
    )
    return seasoned.select(
        *key_cols,
        id_col,
        ts_col,
        "phase",
        "x_cents",
        "trend_cents",
        "seasonal_cents",
        (F.col("__detr") - F.col("seasonal_cents")).alias("resid_cents"),
    )


def stl_mad_anomalies(
    df: DataFrame,
    key_cols: Sequence[str] = ("event_type", "user_id"),
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 2,
    period: int = 24,
    slot_ms: int = 3_600_000,
    c: int = 3,
) -> DataFrame:
    """Robust seasonal anomaly detection: :func:`stl_decompose`'s
    residuals scored against their series' MAD —
    ``|resid - median(resid)| > c * MAD`` — the classical
    decompose-then-robust-threshold detector (residuals carry no trend
    or seasonality, the median/MAD pair shrugs off the anomalies
    themselves, and the multiplied-out comparison needs no division or
    float). Returns ONLY the flagged samples with their full context.

    Medians are exact PERCENTILE_DISC (rank ``ceil(n/2)``), computed as
    windows over the series partition — rank + count + a max(case)
    broadcast-within-partition — so the median and MAD passes add NO
    join and NO new exchange beyond re-sorting the same series
    partition (Catalyst plans one Exchange, three Sort+Window runs).
    Total: the two stl exchanges + one series re-exchange. At 100 TB
    per-series state is a partition-local sort, the window-op cost
    profile everywhere else in the TSDB family.
    """
    if c < 1:
        raise ValueError("c must be >= 1")
    stl = stl_decompose(
        df, key_cols, ts_col, id_col, value_col, k, period, slot_ms
    ).filter(F.col("resid_cents").isNotNull())
    keys = [F.col(c_) for c_ in key_cols]
    wp = Window.partitionBy(*keys)
    wr = wp.orderBy(F.col("resid_cents"), F.col(id_col))
    ranked = stl.select(
        "*",
        F.row_number().over(wr).alias("__rn"),
        F.count("*").over(wp).alias("__n"),
    )
    med = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("__rn") == F.ceil(F.col("__n") / 2).cast("int"),
                F.col("resid_cents"),
            )
        )
        .over(wp)
        .alias("med_cents"),
    ).select(
        "*",
        F.abs(F.col("resid_cents") - F.col("med_cents")).alias("__dev"),
    )
    wd = wp.orderBy(F.col("__dev"), F.col(id_col))
    deved = med.select(
        "*",
        F.row_number().over(wd).alias("__drn"),
    )
    mad = deved.select(
        "*",
        F.max(
            F.when(
                F.col("__drn") == F.ceil(F.col("__n") / 2).cast("int"),
                F.col("__dev"),
            )
        )
        .over(wp)
        .alias("mad_cents"),
    )
    return mad.filter(F.col("__dev") > c * F.col("mad_cents")).select(
        *key_cols,
        id_col,
        ts_col,
        "x_cents",
        "resid_cents",
        "med_cents",
        "mad_cents",
    )


def holt_forecast(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Integer Holt linear-trend chart per series (double exponential
    smoothing, Holt 1957) — the forecasting member of the control-chart
    family: :func:`ewma_control` smooths a level; this carries a level
    AND a trend register and emits the one-step-ahead forecast each
    sample was tested against, in the alpha=beta=1/2 integer form::

        l_1 = x_1,  b_1 = 0
        f_t = l_{t-1} + b_{t-1}                      (forecast, t >= 2)
        l_t = (x_t + l_{t-1} + b_{t-1}) div 2
        b_t = (l_t - l_{t-1} + b_{t-1}) div 2

    All truncating integer division — Spark ``div`` and DuckDB ``//``
    both truncate toward zero, including on the (negative-capable)
    trend register, so the recursive-CTE oracle matches bit-for-bit.
    Like the EWMA recurrence, the truncation in every step breaks any
    closed-form/window rewrite: the engine side is the applyInPandas
    per-series loop (ONE keyed exchange, O(1) two-register state, the
    pinned-width spread of the CPU-per-byte grouped map), the oracle a
    recursive CTE stepping rn -> rn+1.

    Output: one row per event — (key, event_id, rn, x_cents,
    level_cents, trend_cents, forecast_cents, err_cents), forecast/err
    NULL at rn=1 (no history to forecast from).
    """
    import pandas as pd

    base = events.select(
        F.col(key_col),
        F.col(id_col),
        F.col(ts_col),
        F.floor(F.col(value_col) * 100).cast("long").alias("x_cents"),
    )
    out_schema = (
        f"{key_col} long, {id_col} long, rn long, x_cents long, "
        "level_cents long, trend_cents long, forecast_cents long, "
        "err_cents long"
    )

    def chart(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        xs = pdf["x_cents"].astype("int64").tolist()
        lv = tr = 0
        levels, trends, fcs, errs = [], [], [], []
        for t, x in enumerate(xs):
            if t == 0:
                lv, tr = x, 0
                fcs.append(None)
                errs.append(None)
            else:
                f = lv + tr
                fcs.append(f)
                errs.append(x - f)
                prev = lv
                lv = _tdiv(x + lv + tr, 2)
                tr = _tdiv(lv - prev + tr, 2)
            levels.append(lv)
            trends.append(tr)
        out = pdf[[key_col, id_col, "x_cents"]].copy()
        out.insert(2, "rn", range(1, len(xs) + 1))
        out["level_cents"] = levels
        out["trend_cents"] = trends
        out["forecast_cents"] = pd.array(fcs, dtype="Int64")
        out["err_cents"] = pd.array(errs, dtype="Int64")
        return out

    from hbase_bulkload_service_spark.session import pinned_width

    return base.repartition(
        pinned_width(events.sparkSession), key_col
    ).groupBy(key_col).applyInPandas(chart, out_schema)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Python's // floors,
    but Spark ``div`` and DuckDB ``//`` truncate; on negative operands
    they differ, so the Python loop must truncate too."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def salt_plan(
    df: DataFrame,
    key_col: str,
    target_rows: int = 32,
) -> DataFrame:
    """Executable skew remediation: per-key row counts distilled into a
    salting plan — every key whose count exceeds ``target_rows`` gets
    ``salt_factor = ceil(cnt / target_rows)`` (the number of sub-keys a
    salted join should spread it over). Closes the skew loop the engine
    already has both ends of: :func:`key_skew_profile` (q120) DIAGNOSES
    the distribution, this PLANS the fix, and the salted join (q28)
    EXECUTES it — broadcast this table and salt exactly the keys listed
    instead of salting everything (uniform salting multiplies the
    build side for the 99% of keys that never needed it).

    Scale shape: one map-side-combined keyed agg (output = key
    cardinality), a filter, and integer arithmetic; the plan is
    skewed-keys-sized — metadata-scale by definition, broadcastable
    into the join that consumes it.
    """
    if target_rows < 1:
        raise ValueError("target_rows must be >= 1")
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > target_rows)
        .select(
            key_col,
            "cnt",
            F.expr(f"(cnt + {target_rows} - 1) div {target_rows}").alias(
                "salt_factor"
            ),
        )
    )


def join_size_estimate(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Pre-join cardinality estimate: the EXACT output size of a
    self-equi-join on ``key_col`` is ``sum(cnt_k^2)`` over per-key
    counts — computed from the collapsed count table (key-cardinality
    rows) WITHOUT running the join. The compute-governance planner that
    decides, before burning a cluster-hour, whether a blocking key is
    safe or a pair-explosion: together with :func:`key_skew_profile`
    (q120 diagnoses the distribution) and :func:`salt_plan` (q186
    prescribes the fix), this prices the join itself.

    Output: the ``top_n`` keys by predicted contribution — (key, cnt,
    pairs, share_ppm) with ``share_ppm = pairs * 1e6 div total_pairs``
    — the keys a reviewer inspects first when the estimate is scary.

    Scale shape: one map-side-combined keyed agg; the grand total is a
    1-row aggregate broadcast back by crossJoin; the top-N is
    orderBy+limit => TakeOrderedAndProject. Nothing row-level survives
    the first agg.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .select(key_col, "cnt", (F.col("cnt") * F.col("cnt")).alias("pairs"))
    )
    total = counts.agg(F.sum("pairs").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            "pairs",
            F.expr("pairs * 1000000 div __total").alias("share_ppm"),
        )
        .orderBy(F.col("pairs").desc(), F.col(key_col))
        .limit(top_n)
    )


def holt_winters_forecast(
    events: DataFrame,
    period: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Integer Holt-Winters additive-seasonal chart per series (triple
    exponential smoothing, Winters 1960) — the seasonal member closing
    the control-chart family: :func:`ewma_control` carries a level,
    :func:`holt_forecast` level+trend, this adds a ``period``-slot
    seasonal register, all in the alpha=beta=gamma=1/2 integer form::

        t = 1:  l = x, b = 0, s[*] = 0
        t >= 2, p = (t-1) mod period:
            f_t = l + b + s[p]              (one-step-ahead forecast)
            l'  = (x - s[p] + l + b) div 2
            b'  = (l' - l + b) div 2
            s[p]= (x - l' + s[p]) div 2

    Truncating (toward-zero) division throughout — level, trend AND
    seasonal registers all go negative on real series, exactly where
    Python's flooring ``//`` diverges from Spark ``div`` / DuckDB
    ``//`` by one, so the loop uses the explicit truncate helper. The
    per-step truncation breaks any window rewrite: the engine side is
    the canonical applyInPandas per-series loop (ONE keyed exchange,
    O(period) state), and the oracle is a recursive CTE that carries
    the seasonal register as a LIST column, rebuilt functionally each
    step — a one-ulp divergence in any register at any step breaks
    every later row's hash.

    Output per event: (key, event_id, rn, phase, x_cents, level_cents,
    trend_cents, seasonal_cents [the row's phase slot, post-update],
    forecast_cents, err_cents) — forecast/err NULL at rn=1.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    import pandas as pd

    base = events.select(
        F.col(key_col),
        F.col(id_col),
        F.col(ts_col),
        F.floor(F.col(value_col) * 100).cast("long").alias("x_cents"),
    )
    out_schema = (
        f"{key_col} long, {id_col} long, rn long, phase int, "
        "x_cents long, level_cents long, trend_cents long, "
        "seasonal_cents long, forecast_cents long, err_cents long"
    )

    def chart(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        xs = pdf["x_cents"].astype("int64").tolist()
        lv = tr = 0
        seas = [0] * period
        phases, levels, trends, seasonals, fcs, errs = [], [], [], [], [], []
        for t, x in enumerate(xs):
            p = t % period
            if t == 0:
                lv, tr = x, 0
                fcs.append(None)
                errs.append(None)
            else:
                f = lv + tr + seas[p]
                fcs.append(f)
                errs.append(x - f)
                prev = lv
                lv = _tdiv(x - seas[p] + lv + tr, 2)
                tr = _tdiv(lv - prev + tr, 2)
                seas[p] = _tdiv(x - lv + seas[p], 2)
            phases.append(p)
            levels.append(lv)
            trends.append(tr)
            seasonals.append(seas[p])
        out = pdf[[key_col, id_col, "x_cents"]].copy()
        out.insert(2, "rn", range(1, len(xs) + 1))
        out.insert(3, "phase", pd.array(phases, dtype="int32"))
        out["level_cents"] = levels
        out["trend_cents"] = trends
        out["seasonal_cents"] = seasonals
        out["forecast_cents"] = pd.array(fcs, dtype="Int64")
        out["err_cents"] = pd.array(errs, dtype="Int64")
        return out[
            [key_col, id_col, "rn", "phase", "x_cents", "level_cents",
             "trend_cents", "seasonal_cents", "forecast_cents", "err_cents"]
        ]

    from hbase_bulkload_service_spark.session import pinned_width

    return base.repartition(
        pinned_width(events.sparkSession), key_col
    ).groupBy(key_col).applyInPandas(chart, out_schema)


def ab_guardrail(
    events: DataFrame,
    hit_predicate,
    group_col: str = "event_type",
    unit_col: str = "user_id",
    ab_mod: int = 2,
) -> DataFrame:
    """A/B guardrail comparison — the experimentation readout a rollout
    gate runs: units are split into arms A/B by the deterministic md5
    bucket of the unit id (reproducible, engine-portable — the
    dataset_split draw), and per segment the arms' hit rates on a
    guardrail predicate are compared EXACTLY by cross-multiplication
    (``hits_a * n_b  vs  hits_b * n_a`` — integer arithmetic, no rate
    division, no float): ``b_worse`` flags segments where arm B's rate
    strictly exceeds arm A's, and ``lift_ppm`` reports the exact
    truncating rate ratio in ppm (NULL when A has no hits).

    Scale shape: arm assignment is a map-side expression; ONE
    segment-keyed map-side-combined agg; |segments| output rows.
    """
    from hbase_bulkload_service_spark.operators.curation import hash_bucket

    arm_b = hash_bucket(F.col(unit_col), ab_mod) == 0
    hit = hit_predicate.cast("long")
    out = events.groupBy(group_col).agg(
        F.sum((~arm_b).cast("long")).alias("n_a"),
        F.sum(F.when(~arm_b, hit).otherwise(0)).alias("hits_a"),
        F.sum(arm_b.cast("long")).alias("n_b"),
        F.sum(F.when(arm_b, hit).otherwise(0)).alias("hits_b"),
    )
    return out.select(
        group_col,
        "n_a",
        "hits_a",
        "n_b",
        "hits_b",
        (F.col("hits_b") * F.col("n_a") > F.col("hits_a") * F.col("n_b"))
        .alias("b_worse"),
        F.expr(
            "(hits_b * n_a * 1000000) div nullif(hits_a * n_b, 0)"
        ).alias("lift_ppm"),
    )


def countmin_estimates(
    df,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    top_n: int = 20,
):
    """Count-min sketch frequency estimation with its exact-recount
    accuracy gate: build the d×w sketch, then compare the sketched
    estimate against the true count for the ``top_n`` heaviest keys —
    the streaming-frequency companion to q117's exact Misra-Gries
    (CMS answers point queries over keys chosen LATER; MG must fix k
    up front). Hash rows use the engine-portable md5 device
    (``md5(j ‖ ':' ‖ key)``), so the sketch — not just its verdict —
    is reproducible bit-for-bit across engines and runs.

    The two CMS guarantees surface as columns: ``lower_bound_ok``
    (est ≥ true — structural, always TRUE) and ``over_ppm`` (the
    collision overestimate, ≤ ε·N w.h.p. for w = ⌈e/ε⌉).

    Scale shape: the sketch is built from the COLLAPSED per-key count
    table (one keyed agg), not the raw stream — depth·|keys| hash rows
    fold into d·w cells by partial agg; estimation is a broadcast join
    against the d·w-row cell table. Nothing here scales with rows
    except the first agg.
    """
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.operators.curation import hash_bucket

    if depth < 1 or width < 2 or top_n < 1:
        raise ValueError("need depth >= 1, width >= 2, top_n >= 1")
    from hbase_bulkload_service_spark import cachereg

    # truth fans into three consumers (cells, est, top) with different
    # prunings — the q214/q216 exchange-reuse class (r07 sweep: the
    # stream scanned twice before the persist). Key-cardinality-bounded.
    truth = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("true_cnt"))
        .persist()
    )
    cachereg.register(truth, family="countmin")
    hashed = truth.select(
        "key",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_id"),
                        hash_bucket(
                            F.concat(F.lit(f"{j}:"), F.col("key")), width
                        ).alias("col_id"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("h"),
    ).select("key", "true_cnt", "h.row_id", "h.col_id")
    cells = hashed.groupBy("row_id", "col_id").agg(
        F.sum("true_cnt").alias("cell_sum")
    )
    top = truth.orderBy(F.desc("true_cnt"), "key").limit(top_n)
    est = (
        hashed.join(F.broadcast(top.select("key")), "key")
        .join(F.broadcast(cells), ["row_id", "col_id"])
        .groupBy("key")
        .agg(F.min("cell_sum").alias("est_cnt"))
    )
    return (
        top.join(est, "key")
        .select(
            "key",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias("lower_bound_ok"),
            F.expr(
                "(est_cnt - true_cnt) * 1000000 div true_cnt"
            ).alias("over_ppm"),
        )
    )


def trailing_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    horizons_ms: Sequence[int],
) -> DataFrame:
    """Multi-horizon trailing-window feature matrix: per key, event
    counts and value sums inside each trailing horizon ending at the
    corpus reference time (``max(ts_col)`` over the whole frame) — the
    churn/activity feature block a training pipeline derives per user
    ("events in the last 1/7/30 days") right before model assembly.

    One pass, one keyed shuffle: the reference time is a 1-row aggregate
    cross-broadcast onto the scan (never a driver collect round-trip in
    the plan), and every horizon is a conditional aggregate inside the
    SAME hash aggregate — k horizons cost k expressions, not k scans and
    not k window sorts. Contrast with a window-function formulation,
    which would sort every partition; at 100 TB this shape is a plain
    map + one shuffle of #keys rows.

    Output: key, n_total, sum_total, then per horizon ``n_{ms}`` /
    ``sum_{ms}`` counting rows with ``ts > ref - horizon``.
    """
    ref = df.agg(F.max(ts_col).alias("_ref"))
    aggs = [
        F.count("*").alias("n_total"),
        F.sum(value_col).alias("sum_total"),
    ]
    for ms in horizons_ms:
        inside = F.col(ts_col) > F.col("_ref") - F.lit(int(ms))
        aggs.append(
            F.sum(F.when(inside, 1).otherwise(0)).alias(f"n_{ms}")
        )
        aggs.append(
            F.sum(F.when(inside, F.col(value_col)).otherwise(0)).alias(f"sum_{ms}")
        )
    return df.crossJoin(F.broadcast(ref)).groupBy(key_col).agg(*aggs)


def loo_target_encoding(
    df: DataFrame,
    category_col: str,
    target_col: str,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Leakage-safe leave-one-out target encoding: each row's category is
    encoded as the mean of the TARGET over every *other* row of the same
    category — ``(sum(t) - t_i) / (n - 1)`` — so a row never sees its own
    label (the defining property of LOO encoding; plain target encoding
    leaks the label into the feature and inflates eval).

    Exact integer contract: ``target_col`` must be integral (0/1 labels
    or counts); the encoding is emitted as a truncating ppm
    (``* 1_000_000 div (n-1)``) so both engines agree bit-for-bit.
    Singleton categories (n == 1) encode as NULL — there is no "other
    row" to borrow a mean from.

    Scale shape: a #categories-row aggregate broadcast back onto the
    stream — the fact side is never shuffled (same two-pass pattern as
    zscore_outliers); the per-row arithmetic is codegen'd.
    """
    from hbase_bulkload_service_spark.operators.textops import int64_bound_guard

    stats = df.groupBy(category_col).agg(
        F.count("*").alias("_n"),
        F.sum(target_col).alias("_sum_t"),
    )
    # (Σt − t)·1e6 must fit int64; guard the #categories-row frame
    stats = int64_bound_guard(
        stats,
        F.col("_sum_t") <= F.lit(LOO_INT64_BOUND),
        F.format_string(
            "loo_target_encoding int64 bound exceeded: category %s has "
            "sum_t=%s",
            F.col(category_col).cast("string"),
            F.col("_sum_t").cast("string"),
        ),
    )
    out = df.join(F.broadcast(stats), category_col)
    # `div` (not `/`): exact BIGINT division — float division then floor
    # would drift from the integer truth once the numerator passes 2^53.
    loo = F.expr(
        f"CASE WHEN _n > 1 THEN CAST((_sum_t - {target_col}) * 1000000 "
        f"AS BIGINT) div (_n - 1) END"
    )
    return out.select(
        *id_cols,
        category_col,
        F.col(target_col).cast("long").alias(target_col),
        loo.cast("long").alias("loo_ppm"),
    )


def moment_profile(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact bivariate moment profile per key: ``(n, Σx, Σy, Σx², Σy²,
    Σxy)`` over integral columns — the sufficient statistics from which
    Pearson correlation, OLS slope/intercept, and variance all derive.

    The engine ships the MOMENTS, not the float statistic: the six sums
    are exact integers (inputs must be integral; sums stay in BIGINT for
    any realistic group size), so the result is engine-portable
    bit-for-bit, while float corr computed in two engines differs in the
    last ulp and can't be hash-compared. Downstream derives corr =
    (nΣxy-ΣxΣy)/√((nΣx²-Σx²)(nΣy²-Σy²)) at display time.

    int64 bound (documented, not guarded — a pre-guard would cost a
    second aggregate pass): with |x|,|y| ≤ B per row, a group of n rows
    needs n·B² < 2^63; at B = 10^6 (cents/micros) that is n < 9.2e6
    rows per group — rescale the inputs or shard the key past that.

    One partial-aggregate-then-shuffle hash aggregate (#keys output
    rows); the same associative-moments trick is what lets a 1000-node
    cluster compute exact correlation in one pass with no sort.
    """
    x, y = F.col(x_col), F.col(y_col)
    return df.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sum_x"),
        F.sum(y).alias("sum_y"),
        F.sum(x * x).alias("sum_xx"),
        F.sum(y * y).alias("sum_yy"),
        F.sum(x * y).alias("sum_xy"),
    )


# ks_drift ppm arithmetic: |gap|·1e6 ≤ n_a·n_b·1e6 must fit int64
KS_INT64_BOUND = (1 << 63) // 1_000_000 - 1  # ≈ 9.2e12

# loo_target_encoding: (Σt − t)·1e6 must fit int64
LOO_INT64_BOUND = (1 << 63) // 1_000_000 - 1


def ks_drift(
    df: DataFrame,
    key_col: str,
    cohort_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per key: the max
    absolute gap between cohort A's and cohort B's empirical CDFs of an
    integral metric — the standard distribution-drift test between a
    baseline and a candidate window (``cohort_col`` must be 'a'/'b').

    All arithmetic is integer-exact: at each distinct value the CDF gap
    is compared in cross-multiplied form ``|cum_a·n_b − cum_b·n_a|`` (no
    float CDFs), and only the final readout divides to a truncating ppm
    — so both engines agree bit-for-bit.

    Plan: one (key, value)-grained pre-aggregate, then a cumulative
    window PARTITIONED BY the same key (the exchange is reused — value
    order is resolved inside each key partition), then a #keys-row max
    aggregate. No global sort; per-key work is the distinct-value count.
    """
    from hbase_bulkload_service_spark import cachereg
    from hbase_bulkload_service_spark.operators.textops import int64_bound_guard

    # per_v feeds BOTH the totals and the cumulative window; persist it
    # (distinct-value-domain-sized, far smaller than the scan) so the
    # base data is read once, not once per consumer.
    per_v = (
        df.groupBy(key_col, value_col)
        .agg(
            F.sum(F.when(F.col(cohort_col) == "a", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col(cohort_col) == "b", 1).otherwise(0)).alias("cb"),
        )
        .persist()
    )
    cachereg.register(per_v, family="ksdrift")
    tot = per_v.groupBy(key_col).agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    # |cum·n| ≤ n_a·n_b and the ppm readout multiplies by 1e6: past
    # n_a·n_b > KS_INT64_BOUND the arithmetic would wrap silently under
    # non-ANSI Spark — fail loudly on the #keys-row totals frame instead
    # (bin the CDF first at that scale; SCALE.md round-8 notes).
    tot = int64_bound_guard(
        tot,
        F.col("n_a") * F.col("n_b") <= F.lit(KS_INT64_BOUND),
        F.format_string(
            "ks_drift int64 bound exceeded: key %s has n_a*n_b=%s",
            F.col(key_col).cast("string"),
            (F.col("n_a") * F.col("n_b")).cast("string"),
        ),
    )
    w = Window.partitionBy(key_col).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        key_col,
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    gaps = cum.join(F.broadcast(tot), key_col)
    return (
        gaps.groupBy(key_col)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            ).alias("d_num"),
        )
        .withColumn(
            "d_ppm",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.expr("CAST(d_num * 1000000 AS BIGINT) div (n_a * n_b)"),
            ).cast("long"),
        )
    )


def behavior_bitmask(
    df: DataFrame,
    key_col: str,
    type_col: str,
    type_bits: dict[str, int],
) -> DataFrame:
    """Set-of-behaviors encoding as a bitmask: per key, OR together one
    bit per observed type (``type_bits`` maps type -> bit value), then
    census the masks — how many keys share each exact behavior
    combination, and how many distinct behaviors that is (popcount).

    The bitmask is the scale play: a user's behavior SET becomes one
    BIGINT held in a single aggregation buffer (vs collect_set's
    variable-length array state), ``bit_or`` is associative for partial
    aggregation, and downstream set algebra (did X and Y but not Z) is a
    codegen'd bitwise expression instead of array_contains chains.
    Two keyed hash aggregates; output is #distinct-masks rows.
    """
    bit = F.lit(0)
    for t, b in type_bits.items():
        bit = F.when(F.col(type_col) == t, F.lit(int(b))).otherwise(bit)
    masks = df.select(F.col(key_col), bit.alias("_bit")).groupBy(key_col).agg(
        F.bit_or("_bit").alias("mask")
    )
    return (
        masks.groupBy("mask")
        .agg(F.count("*").alias("n_keys"))
        .select(
            F.col("mask").cast("long").alias("mask"),
            "n_keys",
            F.bit_count("mask").cast("long").alias("n_types"),
        )
    )


def funnel_path(
    df: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    within_ms: int | None = None,
) -> DataFrame:
    """Strict-ordered N-step funnel: per key, the earliest occurrence of
    ``steps[0]``, then the earliest ``steps[1]`` STRICTLY after it, and
    so on — each step's timestamp NULL (and all later steps NULL) once
    the chain breaks. ``within_ms`` adds a conversion flag: the last
    step landed within that span of the first (the q92 two-step funnel
    generalized to arbitrary paths).

    Plan: one aggregate per step, every one keyed on ``key_col`` — the
    partitioning is established once and carried through each join+agg
    round (no re-exchange; AQE sees identical distributions). Step i's
    input is pre-filtered to that step's type before the join, so each
    round joins the #keys-row frontier against only that type's slice.
    NULL chains propagate for free: ``ts > NULL`` is NULL, the
    conditional min stays NULL.
    """
    first = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("ts_0"))
    )
    cur = first
    for i, step in enumerate(steps[1:], start=1):
        nxt = df.filter(F.col(type_col) == step).select(
            key_col, F.col(ts_col).alias("_ts")
        )
        carried = [f"ts_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, key_col, "left")
            .groupBy(key_col, *carried)
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(f"ts_{i-1}"), F.col("_ts"))
                ).alias(f"ts_{i}")
            )
        )
    if within_ms is not None:
        last = f"ts_{len(steps) - 1}"
        cur = cur.withColumn(
            "converted",
            F.when(
                F.col(last).isNotNull(),
                (F.col(last) - F.col("ts_0")) <= F.lit(int(within_ms)),
            ).otherwise(F.lit(False)),
        )
    return cur
