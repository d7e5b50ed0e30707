"""Wave-32 operator tests: trailing features, LOO target encoding,
moment profiles, union-by-name / mergeSchema semantics, dynamic
partition overwrite, map-typed assembly, and the left-outer
stream-stream join's plan contract.

Registry-level oracle parity for q227–q235 runs in tools/selfcheck.py;
these tests pin the hand-computable truths and the scale-shape plan
contracts (broadcast, no fact-side shuffle) that a hash comparison
can't see.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics


def test_trailing_features_small_truth(spark):
    # ref = max ts = 100; horizons 10 and 50 (strict ts > ref - h)
    df = spark.createDataFrame(
        [(1, 100, 5), (1, 95, 7), (1, 40, 11), (2, 60, 1)],
        "k long, ts long, v long",
    )
    out = {
        r["k"]: r
        for r in analytics.trailing_features(df, "k", "ts", "v", (10, 50)).collect()
    }
    assert out[1]["n_total"] == 3 and out[1]["sum_total"] == 23
    # h=10: ts > 90 -> rows at 100, 95
    assert out[1]["n_10"] == 2 and out[1]["sum_10"] == 12
    # h=50: ts > 50 -> rows at 100, 95 (40 excluded: strict)
    assert out[1]["n_50"] == 2 and out[1]["sum_50"] == 12
    # key 2: one row at 60 -> inside h=50 (60 > 50) but not h=10
    assert out[2]["n_10"] == 0 and out[2]["sum_10"] == 0
    assert out[2]["n_50"] == 1 and out[2]["sum_50"] == 1


def test_trailing_features_no_fact_shuffle_before_agg(spark):
    df = spark.createDataFrame([(1, 10, 1)], "k long, ts long, v long")
    plan = analytics.trailing_features(df, "k", "ts", "v", (5,))._jdf.queryExecution(
    ).executedPlan().toString()
    # the 1-row reference joins as a broadcast nested loop (no key),
    # never by shuffling the fact side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_loo_target_encoding_truths_and_singleton_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 1)],
        "id long, cat string, t long",
    )
    out = {
        r["id"]: r
        for r in analytics.loo_target_encoding(df, "cat", "t", ("id",)).collect()
    }
    # cat a: n=3 sum=2; row1 (t=1): (2-1)*1e6 div 2 = 500000
    assert out[1]["loo_ppm"] == 500_000
    # row2 (t=0): (2-0)*1e6 div 2 = 1000000
    assert out[2]["loo_ppm"] == 1_000_000
    # singleton category -> NULL (no other row to borrow a mean from)
    assert out[4]["loo_ppm"] is None


def test_loo_encoding_broadcasts_stats(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, cat string, t long")
    plan = analytics.loo_target_encoding(df, "cat", "t", ("id",))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_moment_profile_exact(spark):
    df = spark.createDataFrame(
        [("g", 2, 3), ("g", 4, 5)], "k string, x long, y long"
    )
    r = analytics.moment_profile(df, "k", "x", "y").collect()[0]
    assert (r["n"], r["sum_x"], r["sum_y"]) == (2, 6, 8)
    assert (r["sum_xx"], r["sum_yy"], r["sum_xy"]) == (20, 34, 26)


def test_union_by_name_null_fills(spark):
    a = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    b = spark.createDataFrame([(2, "web", 10)], "doc_id long, source string, n_chars long")
    u = a.unionByName(b, allowMissingColumns=True)
    rows = {r["doc_id"]: r for r in u.collect()}
    assert rows[1]["source"] is None and rows[1]["n_chars"] is None
    assert rows[2]["lang"] is None and rows[2]["n_chars"] == 10
    assert set(u.columns) == {"doc_id", "lang", "source", "n_chars"}


def test_merge_schema_unions_generations(spark, tmp_path):
    d = str(tmp_path / "evo")
    spark.createDataFrame([(1, 10)], "id long, a long").write.parquet(f"{d}/g1")
    spark.createDataFrame([(2, 20, "x")], "id long, a long, b string").write.parquet(
        f"{d}/g2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(f"{d}/g1", f"{d}/g2")
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) == {"id", "a", "b"}
    assert rows[1]["b"] is None and rows[2]["b"] == "x"


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    d = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [(1, 100, "p1"), (2, 200, "p2")], "id long, v long, p string"
    )
    base.write.mode("overwrite").partitionBy("p").parquet(d)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame([(1, 999, "p1")], "id long, v long, p string").write.mode(
            "overwrite"
        ).partitionBy("p").parquet(d)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    rows = {r["p"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert rows == {"p1": 999, "p2": 200}  # p2 survived the overwrite
    # static mode would have dropped partition p2 entirely
    assert os.path.isdir(os.path.join(d, "p=p2"))


def test_map_assembly_div_is_exact(spark):
    # 3 of 7 -> 428571 ppm exactly (float division would give 428571.42..)
    df = spark.createDataFrame(
        [("d", "a", 3), ("d", "b", 4)], "decile string, et string, n long"
    )
    maps = df.groupBy("decile").agg(
        F.map_from_entries(F.collect_list(F.struct("et", "n"))).alias("m")
    ).withColumn(
        "tot", F.aggregate(F.map_values("m"), F.lit(0).cast("long"), lambda a, v: a + v)
    )
    out = maps.select(
        F.explode(
            F.expr("transform_values(m, (k, v) -> v * 1000000 div tot)")
        ).alias("et", "ppm")
    ).collect()
    assert {r["et"]: r["ppm"] for r in out} == {"a": 428_571, "b": 571_428}


def test_stream_stream_left_outer_drops_right_key(spark, tmp_path):
    """how='left_outer' plumbs through and the duplicate right-side key
    is dropped so the joined key column stays selectable."""
    from hbase_bulkload_service_spark.streaming import ops as st

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100)], "k long, lts string, lv long"
    ).select("k", F.col("lts").cast("timestamp").alias("lts"), "lv")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:20:00", 7)], "k long, rts string, rv long"
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "rv")
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ld)
    right.write.parquet(rd)
    ls = spark.readStream.schema("k long, lts timestamp, lv long").parquet(ld)
    rs = spark.readStream.schema("k long, rts timestamp, rv long").parquet(rd)
    joined = st.stream_stream_interval_join(
        ls, rs, key="k", left_ts="lts", right_ts="rts",
        within_ms=30 * 60 * 1000, how="left_outer",
    )
    assert joined.columns.count("k") == 1
    q = (
        joined.select("k", "lv", "rv")
        .writeStream.format("memory")
        .queryName("w32_lo_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    st.await_finite(q, 120)
    got = [(r["k"], r["lv"], r["rv"]) for r in spark.table("w32_lo_mem").collect()]
    assert got == [(1, 100, 7)]
