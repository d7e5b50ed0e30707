"""Wave-33 operator tests: KS drift, behavior bitmask, golden-record
merge, top-dims, N-step funnel. Registry oracle parity runs in
tools/selfcheck.py; here live the hand-computable truths, edge cases,
and the plan contracts (zero-shuffle top_dims, carried funnel
partitioning) a hash comparison can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation, similarity


def test_ks_drift_hand_truth(spark):
    # a: {1, 2}; b: {2, 3}. Distinct v=1: cum (1,0) gap |1*2-0*2|=2
    # v=2: (2,1) gap |2*2-1*2|=2 ; v=3: (2,2) gap 0 -> D = 2/4 = 0.5
    df = spark.createDataFrame(
        [("k", "a", 1), ("k", "a", 2), ("k", "b", 2), ("k", "b", 3)],
        "k string, cohort string, v long",
    )
    r = analytics.ks_drift(df, "k", "cohort", "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["d_num"]) == (2, 2, 2)
    assert r["d_ppm"] == 500_000


def test_ks_drift_identical_cohorts_zero(spark):
    rows = [("k", c, v) for c in ("a", "b") for v in (1, 5, 9)]
    df = spark.createDataFrame(rows, "k string, cohort string, v long")
    r = analytics.ks_drift(df, "k", "cohort", "v").collect()[0]
    assert r["d_num"] == 0 and r["d_ppm"] == 0


def test_ks_drift_disjoint_cohorts_full(spark):
    df = spark.createDataFrame(
        [("k", "a", 1), ("k", "b", 10)], "k string, cohort string, v long"
    )
    r = analytics.ks_drift(df, "k", "cohort", "v").collect()[0]
    assert r["d_ppm"] == 1_000_000  # disjoint supports -> D = 1


def test_behavior_bitmask_census(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (3, "x")], "u long, t string"
    )
    out = {
        r["mask"]: (r["n_keys"], r["n_types"])
        for r in analytics.behavior_bitmask(df, "u", "t", {"x": 1, "y": 2}).collect()
    }
    assert out == {3: (1, 2), 1: (2, 1)}


def test_golden_record_priority_and_full_outer(spark):
    a = spark.createDataFrame([(1, "A1")], "k long, name string")
    b = spark.createDataFrame([(1, "B1"), (2, "B2")], "k long, name string")
    c = spark.createDataFrame([(3, 30)], "k long, extra long")
    out = {
        r["k"]: (r["name"], r["extra"])
        for r in curation.golden_record_merge(
            "k", [(a, ["name"]), (b, ["name"]), (c, ["extra"])]
        ).collect()
    }
    # key 1: A wins over B; key 2: only B; key 3: survives via feed C
    assert out == {1: ("A1", None), 2: ("B2", None), 3: (None, 30)}


def test_top_dims_ranking_and_ties(spark):
    # |0.5| top, then tie at |0.25| broken by dim index
    df = spark.createDataFrame(
        [(7, [0.25, -0.5, 0.25, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = similarity.top_dims(df, "vec_id", "embedding", k=3).collect()
    got = [(r["rnk"], r["dim_idx"], r["micro"]) for r in rows]
    assert got == [(1, 1, -500_000), (2, 0, 250_000), (3, 2, 250_000)]


def test_top_dims_is_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    plan = similarity.top_dims(df, "vec_id", "embedding")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # ranking happens inside the row


def test_funnel_path_strict_order_and_window(spark):
    rows = [
        # u1 completes in order
        (1, "s1", 10), (1, "s2", 20), (1, "s3", 30),
        # u2: s2 BEFORE s1 -> chain breaks at step 2
        (2, "s2", 5), (2, "s1", 10), (2, "s3", 30),
        # u3: completes but outside the window
        (3, "s1", 10), (3, "s2", 20), (3, "s3", 5000),
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts long")
    out = {
        r["u"]: (r["ts_0"], r["ts_1"], r["ts_2"], r["converted"])
        for r in analytics.funnel_path(
            df, "u", "t", "ts", ("s1", "s2", "s3"), within_ms=100
        ).collect()
    }
    assert out[1] == (10, 20, 30, True)
    assert out[2] == (10, None, None, False)  # s2 at 5 not strictly after 10
    assert out[3] == (10, 20, 5000, False)  # completed but late


def test_funnel_path_reuses_user_partitioning(spark):
    df = spark.createDataFrame([(1, "s1", 10)], "u long, t string, ts long")
    plan = analytics.funnel_path(
        df, "u", "t", "ts", ("s1", "s2", "s3")
    )._jdf.queryExecution().executedPlan().toString()
    # joins and aggs all key on u: at most one exchange per INPUT branch
    # (3 step slices + frontier), never one per round-trip
    assert plan.count("Exchange hashpartitioning") <= 4
