"""Wave-8 operators: sketch accuracy verdicts, exact heavy hitters.
(The HFL2 container is covered in test_bulkload_hfile.py.)"""

from __future__ import annotations

import collections
import random

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics


def test_heavy_hitters_exact_on_skew(spark):
    """Skewed stream with far more distinct items than MG counters —
    decrement steps must fire and the result must still be EXACT."""
    rng = random.Random(11)
    items = (
        ["hot"] * 4000
        + ["warm"] * 1500
        + ["mild"] * 700
        + [f"rare-{rng.randrange(5000)}" for _ in range(4000)]
    )
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(7)
    phi_ppm = 60_000  # 6% of 10200 rows = 612; k = 2*ceil(1/phi) = 34 counters
    got = {
        r["item"]: r["cnt"]
        for r in analytics.heavy_hitters(df, "item", phi_ppm=phi_ppm).collect()
    }
    exact = collections.Counter(items)
    want = {
        i: c for i, c in exact.items() if c * 1_000_000 >= phi_ppm * len(items)
    }
    assert got == want
    assert "hot" in got and "mild" in got  # non-degenerate split


def test_heavy_hitters_ignores_nulls_and_handles_empty(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "item string"
    )
    got = {
        r["item"]: r["cnt"]
        for r in analytics.heavy_hitters(df, "item", phi_ppm=500_000).collect()
    }
    assert got == {"a": 2}  # threshold base = 3 non-null rows; b (1/3) misses
    empty = spark.createDataFrame([], "item string")
    assert analytics.heavy_hitters(empty, "item", phi_ppm=10_000).count() == 0


def test_heavy_hitters_rejects_bad_phi(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        analytics.heavy_hitters(df, "item", phi_ppm=0)
    with pytest.raises(ValueError):
        analytics.heavy_hitters(df, "item", phi_ppm=2_000_000)


def test_sketch_accuracy_bounds_hold_and_are_exactly_typed(spark, sf_dir):
    from hbase_bulkload_service_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir).withColumn(
        "cents", F.floor(F.col("value") * 100).cast("long")
    )
    out = analytics.sketch_accuracy(ev, "event_type", "user_id", "cents")
    rows = out.collect()
    assert rows and all(r["hll_within_bound"] for r in rows)
    assert all(r["gk_rank_within_bound"] for r in rows)
    # exact side really is exact
    exact = {
        (r["event_type"]): (r["n"], r["d"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for r in rows:
        assert exact[r["event_type"]] == (r["n_rows"], r["exact_distinct"])


def test_sketch_accuracy_flags_a_violated_bound(spark):
    """With an absurdly tight distinct bound (0 ppm) the HLL verdict must
    go False whenever the estimate differs at all — proving the boolean
    actually tests something (not hardwired TRUE)."""
    rows = [(i % 3, i * 37 % 1009, i % 101) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, u int, v int")
    out = analytics.sketch_accuracy(
        df, "k", "u", "v", distinct_err_ppm=0, rank_err_ppm=0
    ).collect()
    est = {
        r["k"]: r["approx_distinct"]
        for r in analytics.sketch_profile(df, "k", "u", "v").collect()
    }
    for r in out:
        should = est[r["k"]] == r["exact_distinct"]
        assert r["hll_within_bound"] == should
