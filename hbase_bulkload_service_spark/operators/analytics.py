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
