"""Wave-16 operators: user-journey path mining, cross-source overlap."""

from __future__ import annotations

import pytest

from hbase_bulkload_service_spark.operators import analytics, curation


# ---------------------------------------------------------------------------
# user_journeys
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long, event_id long"
    )


def test_user_journeys_paths_and_ranks(spark):
    rows = [
        # two users do a>b, one does b>a
        (1, "a", 10, 1), (1, "b", 20, 2),
        (2, "a", 10, 3), (2, "b", 20, 4),
        (3, "b", 10, 5), (3, "a", 20, 6),
    ]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=10
    ).collect()
    got = {(r.path, r.n_users, r.rank) for r in out}
    assert got == {("a>b", 2, 1), ("b>a", 1, 2)}


def test_user_journeys_truncates_to_max_steps(spark):
    rows = [(1, t, i * 10, i) for i, t in enumerate("abcde")]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=3, top_k=5
    ).collect()
    assert out[0].path == "a>b>c"


def test_user_journeys_duplicate_ts_resolved_by_id(spark):
    rows = [(1, "x", 10, 2), (1, "y", 10, 1)]  # same ts: id order wins
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=5
    ).collect()
    assert out[0].path == "y>x"


def test_user_journeys_tie_rank_deterministic(spark):
    rows = [(1, "a", 10, 1), (2, "b", 10, 2)]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=5
    ).collect()
    # equal counts: path ascending breaks the tie
    assert [(r.path, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        ("a", 1), ("b", 2)
    ]


def test_user_journeys_top_k_bounds_output(spark):
    rows = [(u, f"t{u}", 10, u) for u in range(10)]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=2, top_k=3
    ).collect()
    assert len(out) == 3


def test_user_journeys_validates(spark):
    df = _events(spark, [(1, "a", 10, 1)])
    with pytest.raises(ValueError, match="max_steps"):
        analytics.user_journeys(df, max_steps=0)


def test_user_journeys_topk_is_take_ordered(spark):
    df = _events(spark, [(1, "a", 10, 1)])
    plan = (
        analytics.user_journeys(df, max_steps=2, top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# source_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_counts(spark):
    rows = [
        ("s1", "shared one"), ("s1", "shared one"),  # 2 copies in s1
        ("s1", "only s1"),
        ("s2", "shared one"),
        ("s2", "shared two"),
        ("s3", "shared two"), ("s3", "no match"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.source_a, r.source_b): (r.shared_digests, r.docs_a, r.docs_b)
        for r in curation.source_overlap(df).collect()
    }
    # s1-s2 share "shared one" (2 docs on the s1 side), s2-s3 share
    # "shared two"; s1-s3 share nothing -> no row
    assert out == {("s1", "s2"): (1, 2, 1), ("s2", "s3"): (1, 1, 1)}


def test_source_overlap_null_text_is_empty(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "")], "source string, text string"
    )
    out = curation.source_overlap(df).collect()
    assert len(out) == 1 and out[0].shared_digests == 1


def test_source_overlap_unordered_pairs_once(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "source string, text string"
    )
    out = curation.source_overlap(df).collect()
    assert len(out) == 1 and (out[0].source_a, out[0].source_b) == ("a", "b")


# ---------------------------------------------------------------------------
# threshold_episodes
# ---------------------------------------------------------------------------


def _samples(spark, vals, key="m"):
    from hbase_bulkload_service_spark.operators import tsdb  # noqa: F401
    rows = [(key, i * 10, v, i) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )


def test_threshold_episodes_islands(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    # breaches (>5): runs [10,20,30] at idx 1-3 and [40] at idx 6
    df = _samples(spark, [1, 10, 20, 30, 2, 3, 40, 4])
    out = sorted(
        tsdb.threshold_episodes(df, threshold=5).collect(),
        key=lambda r: r.start_ts,
    )
    assert len(out) == 2
    assert (out[0].start_ts, out[0].end_ts, out[0].n_samples, out[0].peak) == (
        10, 30, 3, 30
    )
    assert (out[1].start_ts, out[1].end_ts, out[1].n_samples, out[1].peak) == (
        60, 60, 1, 40
    )


def test_threshold_episodes_edges(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    # run touching both ends of the series; equality is NOT a breach
    df = _samples(spark, [9, 9, 5, 9])
    out = sorted(
        tsdb.threshold_episodes(df, threshold=5).collect(),
        key=lambda r: r.start_ts,
    )
    assert [(r.start_ts, r.end_ts, r.n_samples) for r in out] == [
        (0, 10, 2), (30, 30, 1)
    ]


def test_threshold_episodes_no_breach_empty(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    df = _samples(spark, [1, 2, 3])
    assert tsdb.threshold_episodes(df, threshold=10).count() == 0


def test_threshold_episodes_series_independent(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    a = _samples(spark, [10, 10], key="a")
    b = _samples(spark, [10, 1, 10], key="b")
    out = tsdb.threshold_episodes(a.unionByName(b), threshold=5)
    got = {(r.event_type, r.start_ts, r.n_samples) for r in out.collect()}
    # a: one 2-sample episode; b: two 1-sample episodes (no cross-series merge)
    assert got == {("a", 0, 2), ("b", 0, 1), ("b", 20, 1)}


def test_threshold_episodes_single_exchange(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    df = _samples(spark, list(range(20)))
    plan = (
        tsdb.threshold_episodes(df, threshold=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # rank window, breach cumsum, and the episode agg share ONE exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# slo_compliance
# ---------------------------------------------------------------------------


def test_slo_compliance_counts_held_breaches(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    # breach at t=0 held silently through buckets 0..3, recovery at t=4000:
    # raw samples are 50% breach, but the GRID says 4 of 5 slots breach
    rows = [("m", 0, 99, 0), ("m", 4_000, 1, 1)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    r = tsdb.slo_compliance(
        df, threshold=10, step_ms=1000, period_ms=5000
    ).collect()[0]
    assert (r.slots, r.ok_slots) == (5, 1)
    assert r.compliance_ppm == 1_000_000 // 5


def test_slo_compliance_period_boundaries(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    rows = [("m", 0, 1, 0), ("m", 9_000, 99, 1)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    out = {
        r.period: r
        for r in tsdb.slo_compliance(
            df, threshold=10, step_ms=1000, period_ms=5000
        ).collect()
    }
    # grid 0..9; periods 0 (slots 0-4, all held 1 -> ok) and 1 (slots
    # 5-9: four held 1, slot 9 observed 99 -> breach)
    assert out[0].ok_slots == 5 and out[0].compliance_ppm == 1_000_000
    assert out[1].slots == 5 and out[1].ok_slots == 4


def test_slo_compliance_validates_alignment(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    df = spark.createDataFrame(
        [("m", 0, 1, 0)], "event_type string, ts_ms long, cents long, event_id long"
    )
    with pytest.raises(ValueError, match="divide"):
        tsdb.slo_compliance(df, threshold=1, step_ms=900, period_ms=1000)


# ---------------------------------------------------------------------------
# rate_bursts
# ---------------------------------------------------------------------------


def test_rate_bursts_detects_spike(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    # counter increases 10/sec for 5 intervals, then 100/sec: the jump
    # is >= 3x the trailing-4 mean -> burst; steady rows never flag
    vals, ts = [0], [0]
    for i in range(5):
        vals.append(vals[-1] + 10); ts.append(ts[-1] + 1000)
    vals.append(vals[-1] + 100); ts.append(ts[-1] + 1000)
    rows = [("m", 1, t, v, i) for i, (t, v) in enumerate(zip(ts, vals))]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts_ms long, cents long, event_id long"
    )
    out = sorted(
        tsdb.rate_bursts(df, key_cols=("event_type", "user_id"), window_n=4).collect(),
        key=lambda r: r.ts_ms,
    )
    assert [r.is_burst for r in out] == [False, False, False, False, False, True]
    last = out[-1]
    assert last.base_n == 4 and last.base_sum == 4 * 10_000_000


def test_rate_bursts_requires_full_window(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    # a 100x jump on the SECOND interval has only 1 trailing rate: no flag
    rows = [("m", 1, 0, 0, 0), ("m", 1, 1000, 10, 1), ("m", 1, 2000, 1000, 2)]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts_ms long, cents long, event_id long"
    )
    out = tsdb.rate_bursts(
        df, key_cols=("event_type", "user_id"), window_n=4
    ).collect()
    assert all(not r.is_burst for r in out)


def test_rate_bursts_validates(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    df = spark.createDataFrame(
        [("m", 1, 0, 0, 0)],
        "event_type string, user_id long, ts_ms long, cents long, event_id long",
    )
    with pytest.raises(ValueError, match="window_n"):
        tsdb.rate_bursts(df, window_n=0)
    with pytest.raises(ValueError, match="factor"):
        tsdb.rate_bursts(df, factor_num=0)


def test_rate_bursts_single_exchange(spark):
    from hbase_bulkload_service_spark.operators import tsdb

    df = spark.createDataFrame(
        [("m", 1, i * 1000, i * 10, i) for i in range(20)],
        "event_type string, user_id long, ts_ms long, cents long, event_id long",
    )
    plan = (
        tsdb.rate_bursts(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the rate lag window and the trailing baseline window share one
    # (event_type, user_id) exchange
    assert plan.count("Exchange hashpartitioning") == 1
