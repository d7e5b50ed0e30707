"""Wave-13 operators: grid fill, MAD outliers, trend, seasonal profile,
balanced oversample, rank fusion, drift monitors, k-core, cogroup merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import (
    analytics,
    curation,
    graph,
    similarity,
)
from hbase_bulkload_service_spark.operators import tsdb


# ---------------------------------------------------------------------------
# grid_fill
# ---------------------------------------------------------------------------


def test_grid_fill_emits_gap_slots_with_held_value(spark):
    # series s: samples in buckets 0, 3 (step 10); grid = 0..3
    df = spark.createDataFrame(
        [("s", 1, 100, 1), ("s", 5, 200, 2), ("s", 31, 900, 3)],
        "k string, ts long, v long, id long",
    )
    out = {
        r["bucket"]: (r["filled"], r["is_observed"])
        for r in tsdb.grid_fill(df, "k", "ts", "v", "id", 10).collect()
    }
    # bucket 0 takes the LAST sample by (ts, id) -> 200
    assert out == {0: (200, True), 1: (200, False), 2: (200, False),
                   3: (900, True)}


def test_grid_fill_last_by_ts_then_id_and_null_excluded(spark):
    df = spark.createDataFrame(
        [("s", 5, 1, 9), ("s", 5, 2, 7), ("s", 5, None, 99)],
        "k string, ts long, id long, v long",
    )
    # duplicate ts 5: id 2 wins; NULL value row ignored entirely
    r = tsdb.grid_fill(df, "k", "ts", "v", "id", 10).collect()
    assert len(r) == 1 and r[0]["filled"] == 7 and r[0]["is_observed"]


def test_grid_fill_rejects_bad_step(spark):
    df = spark.createDataFrame([("s", 1, 1, 1)], "k string, ts long, v long, id long")
    with pytest.raises(ValueError, match="step_ms"):
        tsdb.grid_fill(df, "k", "ts", "v", "id", 0)


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_hand_computed(spark):
    # values 1..9 plus outlier 1000: n=10, med = rank (10+1)div2=5 -> 5
    # devs sorted: 0,1,1,2,2,3,3,4,4,995 -> mad = rank 5 -> 2
    # outliers: dev > 3*2=6 -> only 995
    rows = [("g", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
    df = spark.createDataFrame(rows, "k string, v long")
    r = analytics.mad_outliers(df, "k", "v", k=3).collect()[0]
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (10, 5, 2, 1)


def test_mad_constant_group_all_inliers(spark):
    df = spark.createDataFrame([("g", 7)] * 5, "k string, v long")
    r = analytics.mad_outliers(df, "k", "v").collect()[0]
    assert (r["med"], r["mad"], r["n_outliers"]) == (7, 0, 0)


def test_mad_masks_nothing_where_zscore_would(spark):
    """One extreme value: MAD flags it; sample stddev of the same data
    is inflated enough that |v-mean| < 3*sigma hides it."""
    vals = [10, 11, 12, 13, 14, 10, 11, 12, 13, 1_000_000]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    r = analytics.mad_outliers(df, "k", "v").collect()[0]
    assert r["n_outliers"] == 1
    # documented contrast: the z-score variant keeps the point inlying
    # (one extreme value inflates sigma enough to mask itself)
    flagged = analytics.zscore_outliers(df, "k", "v", threshold=3.0)
    assert flagged.filter(F.col("v") == 1_000_000).count() == 0


def test_mad_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", None)], "k string, v long"
    )
    r = analytics.mad_outliers(df, "k", "v").collect()[0]
    assert r["n"] == 3 and r["med"] == 2


def test_mad_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(40)], "k string, v long"
    )
    plan = (
        analytics.mad_outliers(df, "k", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# group_trend
# ---------------------------------------------------------------------------


def test_trend_exact_line(spark):
    # y = 3x + 5 for x in 0..4: slope num/den == 3 exactly
    df = spark.createDataFrame(
        [("g", x, 3 * x + 5) for x in range(5)], "k string, x long, y long"
    )
    r = analytics.group_trend(df, "k", "x", "y").collect()[0]
    assert r["num"] % r["den"] == 0 and r["num"] // r["den"] == 3


def test_trend_degenerate_groups_yield_null_ppm(spark):
    df = spark.createDataFrame(
        [("one", 5, 9), ("flat", 2, 1), ("flat", 2, 5)],
        "k string, x long, y long",
    )
    out = {r["k"]: r for r in
           analytics.group_trend(df, "k", "x", "y").collect()}
    assert out["one"]["den"] == 0 and out["one"]["slope_ppm"] is None
    assert out["flat"]["den"] == 0 and out["flat"]["slope_ppm"] is None


def test_trend_negative_slope_sign(spark):
    df = spark.createDataFrame(
        [("g", x, 100 - 7 * x) for x in range(10)], "k string, x long, y long"
    )
    r = analytics.group_trend(df, "k", "x", "y").collect()[0]
    assert r["num"] < 0 < r["den"] and r["num"] // r["den"] == -7


# ---------------------------------------------------------------------------
# seasonal_profile
# ---------------------------------------------------------------------------


def test_seasonal_profile_index(spark):
    # slot 0 mean 10, slot 1 mean 30 -> series mean 20;
    # idx: 10e6 div 20 -> 500000 ppm / 1500000 ppm
    rows = [("k", 0, 10), ("k", 24, 10), ("k", 1, 30), ("k", 25, 30)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    out = {r["slot"]: r for r in
           analytics.seasonal_profile(df, "k", "ts", "v", period=24,
                                      slot_ms=1).collect()}
    assert out[0]["idx_ppm"] == 500_000 and out[1]["idx_ppm"] == 1_500_000
    assert out[0]["n"] == 2 and out[0]["sum_v"] == 20


# ---------------------------------------------------------------------------
# balanced_oversample
# ---------------------------------------------------------------------------


def test_oversample_exact_target_both_directions(spark):
    rows = [(i, "small") for i in range(3)] + [
        (100 + i, "big") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    out = curation.balanced_oversample(df, "cls", "doc_id", target=6)
    agg = {
        r["cls"]: (r["n"], r["d"])
        for r in out.groupBy("cls")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    # small: 3 docs -> 6 rows (each exactly twice); big: subsample 6 of 10
    assert agg == {"small": (6, 3), "big": (6, 6)}
    reps = out.filter(F.col("cls") == "small").groupBy("doc_id").count()
    assert all(r["count"] == 2 for r in reps.collect())


def test_oversample_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame(
        [(i, "c") for i in range(20)], "doc_id long, cls string"
    )
    pick = lambda seed: sorted(  # noqa: E731
        r["doc_id"]
        for r in curation.balanced_oversample(
            df, "cls", "doc_id", target=5, seed=seed
        ).collect()
    )
    assert pick(1) == pick(1)
    assert pick(1) != pick(2)


def test_oversample_single_exchange_replicas_map_side(spark):
    df = spark.createDataFrame(
        [(i, "c") for i in range(30)], "doc_id long, cls string"
    )
    plan = (
        curation.balanced_oversample(df, "cls", "doc_id", target=90)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # window only; explode after


# ---------------------------------------------------------------------------
# rank_fusion
# ---------------------------------------------------------------------------


def test_rrf_prefers_two_list_agreement_over_one_list_top(spark):
    # candidate 7 is rank 2 in BOTH lists (2/(60+2) per unit); 1 and 9
    # top exactly ONE list each (1/(60+1)): agreement wins in RRF.
    a = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 7)], "query_id long, rank long, neighbor_id long"
    )
    b = spark.createDataFrame(
        [(1, 1, 9), (1, 2, 7)], "query_id long, rank long, neighbor_id long"
    )
    out = similarity.rank_fusion([a, b], k_rrf=60, k_out=3).collect()
    top = sorted(out, key=lambda r: r["rank"])
    assert top[0]["neighbor_id"] == 7 and top[0]["n_lists"] == 2
    assert 2 * (10**9 // 62) == top[0]["rrf_score"]


def test_rrf_tie_breaks_by_id_and_validates(spark):
    a = spark.createDataFrame(
        [(1, 1, 5), (1, 2, 3)], "query_id long, rank long, neighbor_id long"
    )
    b = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 5)], "query_id long, rank long, neighbor_id long"
    )
    out = similarity.rank_fusion([a, b], k_rrf=10, k_out=2).collect()
    top = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in top] == [3, 5]  # equal scores
    with pytest.raises(ValueError):
        similarity.rank_fusion([])
    with pytest.raises(ValueError):
        similarity.rank_fusion([a], k_rrf=-1)


# ---------------------------------------------------------------------------
# centroid_drift
# ---------------------------------------------------------------------------


def test_centroid_drift_hand_computed(spark):
    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [3.0, 0.0])], "label int, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(0, [1.0, 1.0])], "label int, embedding array<float>"
    )
    r = similarity.centroid_drift(a, b, dim=2).collect()[0]
    # centroid a = (2e6, 0), b = (1e6, 1e6): L1 = 2e6, Linf = 1e6
    assert (r["n_a"], r["n_b"]) == (2, 1)
    assert r["l1_micros"] == 2_000_000 and r["linf_micros"] == 1_000_000


def test_centroid_drift_one_sided_label_is_null(spark):
    a = spark.createDataFrame(
        [(5, [1.0, 2.0])], "label int, embedding array<float>"
    )
    b = spark.createDataFrame(
        [], "label int, embedding array<float>"
    )
    r = similarity.centroid_drift(a, b, dim=2).collect()[0]
    assert r["n_b"] == 0 and r["l1_micros"] is None


# ---------------------------------------------------------------------------
# histogram_drift
# ---------------------------------------------------------------------------


def test_histogram_drift_shares_and_flag(spark):
    a = spark.createDataFrame([(v,) for v in [0, 1, 2, 3]], "v long")
    b = spark.createDataFrame([(v,) for v in [0, 10, 10, 10]], "v long")
    out = {r["bucket"]: r for r in analytics.histogram_drift(
        a, b, "v", lo=0, width=10, n_buckets=4, flag_ppm=100_000
    ).collect()}
    assert out[0]["ppm_a"] == 1_000_000 and out[0]["ppm_b"] == 250_000
    assert out[0]["delta_ppm"] == 750_000 and out[0]["flagged"]
    assert out[1]["n_a"] == 0 and out[1]["ppm_b"] == 750_000


def test_histogram_drift_clamps_out_of_range(spark):
    a = spark.createDataFrame([(-5,), (999,)], "v long")
    b = spark.createDataFrame([(1,)], "v long")
    out = {r["bucket"]: r for r in analytics.histogram_drift(
        a, b, "v", lo=0, width=10, n_buckets=3
    ).collect()}
    assert out[0]["n_a"] == 1 and out[2]["n_a"] == 1  # edge bins absorb


# ---------------------------------------------------------------------------
# kcore_rounds
# ---------------------------------------------------------------------------


def test_kcore_peels_tail_keeps_clique(spark):
    # triangle 1-2-3 plus pendant 3-4: 2-core = the triangle
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    out = {r["node"]: r["degree"] for r in
           graph.kcore_rounds(pairs, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_and_empty_core(spark):
    # path 1-2-3-4: 2-core empty, but only after CASCADING peels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    assert graph.kcore_rounds(pairs, k=2, rounds=3).count() == 0
    # one round is NOT enough (ends keep interior degrees at 2) —
    # fixed-round semantics are the contract, convergence needs rounds
    assert graph.kcore_rounds(pairs, k=2, rounds=1).count() == 2


def test_kcore_validates(spark):
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError):
        graph.kcore_rounds(pairs, k=0)


# ---------------------------------------------------------------------------
# cogroup_merge_stats
# ---------------------------------------------------------------------------


def test_cogroup_merge_alternation(spark):
    import hashlib

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 3)], "k long, ts long, id long"
    )
    b = spark.createDataFrame(
        [(1, 20, 2), (1, 40, 4)], "k long, ts long, id long"
    )
    r = analytics.cogroup_merge_stats(a, b, "k", "ts", "id").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_switches"]) == (2, 2, 3)  # abab
    assert r["seq_md5"] == hashlib.md5(b"abab").hexdigest()


def test_cogroup_one_sided_keys(spark):
    a = spark.createDataFrame([(1, 10, 1)], "k long, ts long, id long")
    b = spark.createDataFrame([(2, 20, 2)], "k long, ts long, id long")
    out = {r["k"]: r for r in
           analytics.cogroup_merge_stats(a, b, "k", "ts", "id").collect()}
    assert out[1]["n_a"] == 1 and out[1]["n_b"] == 0
    assert out[2]["n_a"] == 0 and out[2]["n_b"] == 1
    assert out[1]["n_switches"] == 0


def test_cogroup_duplicate_ts_ordered_by_id(spark):
    import hashlib

    a = spark.createDataFrame([(1, 10, 5)], "k long, ts long, id long")
    b = spark.createDataFrame([(1, 10, 2)], "k long, ts long, id long")
    r = analytics.cogroup_merge_stats(a, b, "k", "ts", "id").collect()[0]
    assert r["seq_md5"] == hashlib.md5(b"ba").hexdigest()  # id 2 first


def test_oversample_rejects_null_keys_loudly(spark):
    df = spark.createDataFrame(
        [(1, "c"), (None, "c")], "doc_id long, cls string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        curation.balanced_oversample(df, "cls", "doc_id", target=2).collect()


def test_cogroup_rejects_null_keys_loudly(spark):
    a = spark.createDataFrame([(None, 1, 1)], "k long, ts long, id long")
    b = spark.createDataFrame([(1, 1, 1)], "k long, ts long, id long")
    with pytest.raises(Exception, match="NULL k"):
        analytics.cogroup_merge_stats(a, b, "k", "ts", "id").collect()
