"""Wave-14 operators: counter rate, aligned-series ratio, top-N+other,
exact-quota dataset split, source reputation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation
from hbase_bulkload_service_spark.operators import tsdb


# ---------------------------------------------------------------------------
# counter_rate
# ---------------------------------------------------------------------------


def _counter_df(spark):
    # one series: monotonic 0->100->250, reset to 40, then 90
    rows = [
        ("m", 1, 1000, 0),
        ("m", 2, 2000, 100),
        ("m", 3, 4000, 250),
        ("m", 4, 5000, 40),   # reset (delta -210)
        ("m", 5, 7000, 90),
    ]
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )


def test_counter_rate_reset_rebase(spark):
    out = (
        tsdb.counter_rate(_counter_df(spark), key_cols=("event_type",))
        .orderBy("ts_ms")
        .collect()
    )
    # first sample dropped (no predecessor)
    assert [r.ts_ms for r in out] == [2000, 4000, 5000, 7000]
    assert [r.delta for r in out] == [100, 150, 40, 50]
    assert [r.is_reset for r in out] == [False, False, True, False]
    # rate = delta * 1e9 div dt_ms (micro-units/sec)
    assert out[0].rate_micros == 100 * 1_000_000_000 // 1000
    assert out[2].rate_micros == 40 * 1_000_000_000 // 1000


def test_counter_rate_drop_resets(spark):
    out = (
        tsdb.counter_rate(
            _counter_df(spark), key_cols=("event_type",), drop_resets=True
        )
        .orderBy("ts_ms")
        .collect()
    )
    assert [r.ts_ms for r in out] == [2000, 4000, 7000]
    assert all(not r.is_reset for r in out)
    assert [r.delta for r in out] == [100, 150, 50]


def test_counter_rate_zero_dt_dropped(spark):
    df = spark.createDataFrame(
        [("m", 1, 1000, 10), ("m", 2, 1000, 20), ("m", 3, 2000, 30)],
        "event_type string, event_id long, ts_ms long, cents long",
    )
    out = tsdb.counter_rate(df, key_cols=("event_type",)).collect()
    # the duplicate-ts pair has no defined rate; only the 1000->2000 edge
    # survives (predecessor by (ts, id) order is event_id=2)
    assert len(out) == 1
    assert out[0].delta == 10 and out[0].dt_ms == 1000


# ---------------------------------------------------------------------------
# align_series_ratio
# ---------------------------------------------------------------------------


def test_align_series_ratio_grid_intersection(spark):
    rows = [
        # series a: buckets 0..2 (observed 0 and 2)
        ("a", 1, 100, 10),
        ("a", 2, 2_100, 30),
        # series b: buckets 1..2 (observed 1 and 2)
        ("b", 3, 1_100, 5),
        ("b", 4, 2_100, 0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )
    out = {
        r.bucket: r
        for r in tsdb.align_series_ratio(
            df, series_a="a", series_b="b", step_ms=1000
        ).collect()
    }
    # each series' grid spans first..last observation (a: 0..2, b: 1..2);
    # the ratio exists only on the intersection
    assert set(out) == {1, 2}
    # bucket 1: a holds 10 (fill from bucket 0), b observed 5
    assert out[1].a_val == 10 and out[1].b_val == 5
    assert out[1].a_observed is False and out[1].b_observed is True
    assert out[1].ratio_ppm == 10 * 1_000_000 // 5
    # bucket 2: b observed 0 -> NULL ratio, not an error
    assert out[2].b_val == 0 and out[2].ratio_ppm is None


# ---------------------------------------------------------------------------
# topn_other
# ---------------------------------------------------------------------------


def test_topn_other_fold(spark):
    rows = [("g", str(i), 100 - i) for i in range(5) for _ in range(2)]
    df = spark.createDataFrame(rows, "g string, item string, v long")
    out = analytics.topn_other(df, "g", "item", "v", n=2).collect()
    by_item = {r.item: r for r in out}
    assert set(by_item) == {"0", "1", "__other__"}
    assert by_item["0"].rank == 1 and by_item["0"].total == 200
    other = by_item["__other__"]
    assert other.is_other and other.rank == 3
    assert other.total == 2 * (98 + 97 + 96) and other.n_rows == 6


def test_topn_other_no_tail(spark):
    df = spark.createDataFrame([("g", "x", 1)], "g string, item string, v long")
    out = analytics.topn_other(df, "g", "item", "v", n=5).collect()
    assert len(out) == 1 and not out[0].is_other


def test_topn_other_reserved_label_rejected(spark):
    df = spark.createDataFrame(
        [("g", "__other__", 1)], "g string, item string, v long"
    )
    with pytest.raises(Exception, match="reserved"):
        analytics.topn_other(df, "g", "item", "v", n=1).collect()


def test_topn_other_validates_n(spark):
    df = spark.createDataFrame([("g", "x", 1)], "g string, item string, v long")
    with pytest.raises(ValueError, match="n must be"):
        analytics.topn_other(df, "g", "item", "v", n=0)


# ---------------------------------------------------------------------------
# dataset_split
# ---------------------------------------------------------------------------


def test_dataset_split_exact_quotas(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 303 else "de") for i in range(403)],
        "doc_id long, lang string",
    )
    out = curation.dataset_split(
        docs, {"train": 800_000, "valid": 100_000, "test": 100_000}
    )
    counts = {
        (r.lang, r.split): r.n
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    # largest remainder on 303: floors 242/30/30 leave 1; remainders
    # 400k/300k/300k -> train gets it
    assert counts[("en", "train")] == 243
    assert counts[("en", "valid")] == 30 and counts[("en", "test")] == 30
    # 100: exact 80/10/10
    assert counts[("de", "train")] == 80
    assert counts[("de", "valid")] == 10 and counts[("de", "test")] == 10
    # total preservation, no dup assignment
    assert out.count() == 403
    assert out.select("doc_id").distinct().count() == 403


def test_dataset_split_deterministic_and_seeded(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(50)], "doc_id long, lang string"
    )
    w = {"a": 500_000, "b": 500_000}
    one = {r.doc_id: r.split for r in curation.dataset_split(docs, w, seed=1).collect()}
    two = {r.doc_id: r.split for r in curation.dataset_split(docs, w, seed=1).collect()}
    other = {r.doc_id: r.split for r in curation.dataset_split(docs, w, seed=2).collect()}
    assert one == two
    assert one != other  # independent draws


def test_dataset_split_validates_weights(spark):
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="sum to exactly"):
        curation.dataset_split(docs, {"a": 1})
    with pytest.raises(ValueError, match="non-empty"):
        curation.dataset_split(docs, {})
    with pytest.raises(ValueError, match="reserved"):
        curation.dataset_split(
            docs.withColumn("split", F.lit("x")),
            {"a": 1_000_000},
        )


def test_dataset_split_null_key_rejected(spark):
    docs = spark.createDataFrame(
        [(None, "en"), (1, "en")], "doc_id long, lang string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        curation.dataset_split(docs, {"a": 1_000_000}).collect()


def test_dataset_split_null_stratum_is_legal(spark):
    docs = spark.createDataFrame(
        [(i, None) for i in range(10)], "doc_id long, lang string"
    )
    out = curation.dataset_split(
        docs, {"a": 500_000, "b": 500_000}
    ).collect()
    assert len(out) == 10
    assert sorted(r.split for r in out) == ["a"] * 5 + ["b"] * 5


# ---------------------------------------------------------------------------
# source_reputation
# ---------------------------------------------------------------------------


def test_source_reputation_mirror_flagged(spark):
    rows = [("s1", f"text {i}", 10) for i in range(4)] + [
        ("mirror", "text 0", 10),
        ("mirror", "text 1", 10),
    ]
    df = spark.createDataFrame(rows, "source string, text string, n_chars long")
    out = {r.source: r for r in curation.source_reputation(
        df, dup_threshold_ppm=600_000
    ).collect()}
    assert out["mirror"].n_dup_docs == 2 and out["mirror"].dup_ppm == 1_000_000
    assert out["mirror"].flagged
    assert out["s1"].n_dup_docs == 2  # its two mirrored docs
    assert out["s1"].dup_ppm == 500_000 and not out["s1"].flagged
    assert out["s1"].total_chars == 40


def test_source_reputation_null_text_counts(spark):
    df = spark.createDataFrame(
        [("s", None, None), ("s", "", 0)], "source string, text string, n_chars long"
    )
    r = curation.source_reputation(df).collect()[0]
    # NULL text hashes as empty text -> the two rows are duplicates
    assert r.n_docs == 2 and r.n_dup_docs == 2 and r.flagged


# ---------------------------------------------------------------------------
# plan contracts
# ---------------------------------------------------------------------------


def test_counter_rate_single_exchange(spark):
    plan = tsdb.counter_rate(_counter_df(spark), key_cols=("event_type",))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_topn_other_first_agg_collapses(spark):
    rows = [("g", str(i % 3), i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, item string, v long")
    plan = analytics.topn_other(df, "g", "item", "v", n=2)._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) aggregate before the exchange
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_dataset_split_quota_side_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id long, lang string"
    )
    plan = curation.dataset_split(
        docs, {"a": 500_000, "b": 500_000}
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_counter_rate_counter_max_rollover(spark):
    # 8-bit-style counter wrapping at 256: 250 -> 4 is a wrap of 10
    rows = [("m", 1, 1000, 250), ("m", 2, 2000, 4)]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_ms long, cents long"
    )
    out = tsdb.counter_rate(
        df, key_cols=("event_type",), counter_max=256
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.delta == 4 - 250 + 256 == 10 and r.is_reset
    assert r.rate_micros == 10 * 1_000_000_000 // 1000


def test_counter_rate_mode_exclusivity(spark):
    df = _counter_df(spark)
    with pytest.raises(ValueError, match="mutually exclusive"):
        tsdb.counter_rate(df, drop_resets=True, counter_max=256)
    with pytest.raises(ValueError, match="counter_max"):
        tsdb.counter_rate(df, counter_max=0)
