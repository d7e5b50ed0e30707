"""Wave-15 operators: linear-interpolation grid fill, stale-series
detection, exact percentile downsample."""

from __future__ import annotations

import pytest

from hbase_bulkload_service_spark.operators import tsdb


# ---------------------------------------------------------------------------
# grid_fill_linear
# ---------------------------------------------------------------------------


def test_grid_fill_linear_interpolates(spark):
    rows = [
        ("m", 1, 100, 10),     # bucket 0
        ("m", 2, 3_100, 40),   # bucket 3: gap buckets 1,2 interpolate
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )
    out = {
        r.bucket: r
        for r in tsdb.grid_fill_linear(df, step_ms=1000).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0].filled == 10 and out[0].is_observed
    # 10 + (40-10)*k div 3
    assert out[1].filled == 20 and not out[1].is_observed
    assert out[2].filled == 30 and not out[2].is_observed
    assert out[3].filled == 40 and out[3].is_observed


def test_grid_fill_linear_decreasing_truncates_toward_zero(spark):
    # decreasing series: (-30 * 1) div 4 truncates to -7 in BOTH engines
    rows = [("m", 1, 100, 10), ("m", 2, 4_100, -20)]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )
    out = {
        r.bucket: r.filled
        for r in tsdb.grid_fill_linear(df, step_ms=1000).collect()
    }
    assert out[1] == 10 + (-30 * 1) // -4 * -1  # == 3: trunc(-7.5) = -7 -> 10-7
    assert out[1] == 3 and out[2] == -5 and out[3] == -12


def test_grid_fill_linear_observed_bucket_uses_last_sample(spark):
    rows = [
        ("m", 1, 100, 10),
        ("m", 2, 900, 99),    # same bucket 0, later ts wins
        ("m", 3, 2_100, 30),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )
    out = {
        r.bucket: r.filled
        for r in tsdb.grid_fill_linear(df, step_ms=1000).collect()
    }
    assert out[0] == 99
    # gap bucket 1 interpolates between 99 (b0) and 30 (b2) with
    # TRUNCATING division (toward zero, not floor): -69 div 2 = -34
    assert out[1] == 99 + int((30 - 99) * 1 / 2.0) == 65


def test_grid_fill_linear_validates_step(spark):
    df = spark.createDataFrame(
        [("m", 1, 100, 10)],
        "event_type string, event_id long, ts_ms long, cents long",
    )
    with pytest.raises(ValueError, match="step_ms"):
        tsdb.grid_fill_linear(df, step_ms=0)


# ---------------------------------------------------------------------------
# stale_series
# ---------------------------------------------------------------------------


def test_stale_series_default_now(spark):
    rows = [
        ("live", 100, 1), ("live", 10_000, 2),
        ("dead", 100, 3), ("dead", 4_000, 4),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, event_id long")
    out = {
        r.event_type: r
        for r in tsdb.stale_series(df, stale_after_ms=5_000).collect()
    }
    # now defaults to the corpus max (10_000)
    assert out["live"].age_ms == 0 and not out["live"].is_stale
    assert out["dead"].age_ms == 6_000 and out["dead"].is_stale


def test_stale_series_explicit_now(spark):
    df = spark.createDataFrame(
        [("a", 1_000, 1)], "event_type string, ts_ms long, event_id long"
    )
    r = tsdb.stale_series(df, stale_after_ms=500, now_ms=2_000).collect()[0]
    assert r.age_ms == 1_000 and r.is_stale


def test_stale_series_null_ts_ignored(spark):
    df = spark.createDataFrame(
        [("a", None, 1), ("a", 5_000, 2)],
        "event_type string, ts_ms long, event_id long",
    )
    r = tsdb.stale_series(df, stale_after_ms=1).collect()[0]
    assert r.last_ts_ms == 5_000 and r.age_ms == 0


# ---------------------------------------------------------------------------
# percentile_downsample
# ---------------------------------------------------------------------------


def test_percentile_downsample_exact_ranks(spark):
    # bucket 0 of series m: values 1..10 -> p50 = rank ceil(.5*10)=5 -> 5
    rows = [("m", i * 10, v, i) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 8, 7])]
    df = spark.createDataFrame(
        [(k, ts, v) for (k, ts, v, _) in rows],
        "event_type string, ts_ms long, cents long",
    )
    out = {
        round(r.p, 2): r.quantile_value
        for r in tsdb.percentile_downsample(
            df, bucket_ms=1000, ps=(0.5, 0.9, 1.0)
        ).collect()
    }
    s = sorted([3, 1, 4, 1, 5, 9, 2, 6, 8, 7])
    assert out[0.5] == s[4] and out[0.9] == s[8] and out[1.0] == s[9]


def test_percentile_downsample_per_bucket_independence(spark):
    rows = [("m", 100, 1), ("m", 200, 2), ("m", 1_100, 100), ("m", 1_200, 200)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, cents long")
    out = {
        (r.bucket, round(r.p, 2)): r.quantile_value
        for r in tsdb.percentile_downsample(
            df, bucket_ms=1000, ps=(1.0,)
        ).collect()
    }
    assert out[(0, 1.0)] == 2 and out[(1, 1.0)] == 200


def test_percentile_downsample_validates(spark):
    df = spark.createDataFrame([("m", 1, 1)], "event_type string, ts_ms long, cents long")
    with pytest.raises(ValueError, match="probes"):
        tsdb.percentile_downsample(df, ps=(0.0,))
    with pytest.raises(ValueError, match="bucket_ms"):
        tsdb.percentile_downsample(df, bucket_ms=0)


# ---------------------------------------------------------------------------
# plan contracts
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_percentile_downsample_single_data_exchange(spark):
    df = spark.createDataFrame(
        [("m", i, i) for i in range(100)],
        "event_type string, ts_ms long, cents long",
    )
    plan = _plan(tsdb.percentile_downsample(df, bucket_ms=10))
    # rank + count windows share ONE (series, bucket) exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_stale_series_broadcasts_now(spark):
    df = spark.createDataFrame(
        [("m", 1, 1)], "event_type string, ts_ms long, event_id long"
    )
    plan = _plan(tsdb.stale_series(df))
    assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# time_weighted_percentile
# ---------------------------------------------------------------------------


def test_time_weighted_percentile_holds_beat_counts(spark):
    # value 100 holds 900 of the 1000 ms bucket; nine samples of 1
    # hold 10 ms each at the end: the time-weighted median is 100 even
    # though 9 of 10 SAMPLES are 1 (a rank median would say 1)
    rows = [("m", 0, 100, 0)] + [
        ("m", 900 + i * 10, 1, i + 1) for i in range(9)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    r = tsdb.time_weighted_percentile(
        df, bucket_ms=1000, p_ppm=500_000
    ).collect()[0]
    assert r.twp == 100 and r.n == 10 and r.total_hold_ms == 1000
    # rank median over the same bucket says 1 — the bias this fixes
    rank = tsdb.percentile_downsample(df, bucket_ms=1000, ps=(0.5,)).collect()
    assert rank[0].quantile_value == 1


def test_time_weighted_percentile_exact_boundary(spark):
    # two values holding 500 ms each: cum(v=1)=500, 500*1e6 >= 5e5*1000
    # holds with equality -> the SMALLER value wins at p50 exactly
    rows = [("m", 0, 1, 0), ("m", 500, 2, 1)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    r = tsdb.time_weighted_percentile(df, bucket_ms=1000, p_ppm=500_000).collect()[0]
    assert r.twp == 1
    # p just above half -> the larger value
    r2 = tsdb.time_weighted_percentile(df, bucket_ms=1000, p_ppm=500_001).collect()[0]
    assert r2.twp == 2


def test_time_weighted_percentile_duplicate_ts_zero_hold(spark):
    # duplicate-ts sample holds 0 ms: it never becomes the percentile
    # unless it is the last by id
    rows = [("m", 0, 999, 0), ("m", 0, 5, 1)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    r = tsdb.time_weighted_percentile(df, bucket_ms=1000, p_ppm=1_000_000).collect()[0]
    # 999 holds 0ms (dup ts, earlier id); 5 holds the full bucket
    assert r.twp == 5


def test_time_weighted_percentile_validates(spark):
    df = spark.createDataFrame(
        [("m", 0, 1, 0)], "event_type string, ts_ms long, cents long, event_id long"
    )
    with pytest.raises(ValueError, match="p_ppm"):
        tsdb.time_weighted_percentile(df, p_ppm=0)
    with pytest.raises(ValueError, match="bucket_ms"):
        tsdb.time_weighted_percentile(df, bucket_ms=0)


def test_time_weighted_percentile_single_exchange(spark):
    df = spark.createDataFrame(
        [("m", i, i, i) for i in range(50)],
        "event_type string, ts_ms long, cents long, event_id long",
    )
    plan = (
        tsdb.time_weighted_percentile(df, bucket_ms=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
