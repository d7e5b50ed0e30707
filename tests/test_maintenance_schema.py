"""Maintenance policy (K1-K3) + schema validation (§1.2) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType

from hbase_bulkload_service_spark.operators import maintenance as mnt
from hbase_bulkload_service_spark.schema import HBaseTableSchema

NOW_MS = 1_700_000_000_000
HOT_START = (NOW_MS - mnt.LONG_INTERVAL_MS) // 1000  # oldest mergeable
HOT_END = (NOW_MS - mnt.SHORT_INTERVAL_MS) // 1000  # newest mergeable
MB = 1024 * 1024


def region(name, bucket, size_mb, start=HOT_START + 10, end=HOT_END - 10, end_bucket=None):
    return mnt.Region(
        name=name,
        start_bucket=bucket,
        end_bucket=bucket if end_bucket is None else end_bucket,
        start_time_sec=start,
        end_time_sec=end,
        size_bytes=size_mb * MB,
    )


def test_merge_adjacent_small_regions():
    rs = [region("r1", 1, 50), region("r2", 1, 50), region("r3", 1, 50), region("r4", 1, 50)]
    assert mnt.plan_merges(rs, NOW_MS) == [("r1", "r2"), ("r3", "r4")]


def test_small_pending_merges_with_any_next():
    # sizeA < lower merges with current even if current is huge (ref :138-145)
    rs = [region("r1", 1, 50), region("r2", 1, 10000)]
    assert mnt.plan_merges(rs, NOW_MS) == [("r1", "r2")]


def test_cross_bucket_resets_pending():
    rs = [region("r1", 1, 50), region("x", 1, 50, end_bucket=2), region("r3", 2, 50), region("r4", 2, 50)]
    assert mnt.plan_merges(rs, NOW_MS) == [("r3", "r4")]


def test_hot_window_rule():
    # mid-size regions merge only inside [now-3y, now-3mo]
    recent = region("new", 1, 200, start=HOT_END + 1000, end=HOT_END + 2000)
    old = region("old", 1, 200, start=HOT_START - 2000, end=HOT_START - 1000)
    mid1 = region("m1", 1, 200)
    mid2 = region("m2", 1, 200)
    assert mnt.plan_merges([recent, mid1, mid2], NOW_MS) == [("m1", "m2")]
    assert mnt.plan_merges([mid1, old, mid2], NOW_MS) == []  # old resets pending A
    big = region("big", 1, 6000)
    assert mnt.plan_merges([mid1, big, mid2], NOW_MS) == []  # > upperSize resets


def test_open_end_key_breaks_walk():
    rs = [
        region("r1", 1, 50),
        mnt.Region("open", 1, 1, HOT_START, None, 50 * MB),
        region("r3", 1, 50),
        region("r4", 1, 50),
    ]
    assert mnt.plan_merges(rs, NOW_MS) == []


def test_backup_candidates(spark):
    frozen_end = (NOW_MS - mnt.LONG_INTERVAL_MS) // 1000 - 100
    rows = [
        ("ok", 1, 1, 0, frozen_end, 20 * MB),          # qualifies
        ("multi_bucket", 1, 2, 0, frozen_end, 20 * MB),  # crosses buckets
        ("too_new", 1, 1, 0, HOT_END, 20 * MB),
        ("too_small", 1, 1, 0, frozen_end, 5 * MB),
        ("inflight", 1, 1, 0, frozen_end, 20 * MB),
    ]
    df = spark.createDataFrame(
        rows,
        "region_name string, start_bucket int, end_bucket int, "
        "start_time_sec long, end_time_sec long, size_bytes long",
    )
    got = sorted(
        r["region_name"]
        for r in mnt.backup_candidates(df, NOW_MS, already_backing_up=["inflight"]).collect()
    )
    assert got == ["ok"]


def test_split_keys_layouts():
    raw = mnt.split_keys(512, 1)
    assert len(raw) == 511 and raw[0] == b"\x00\x01" and raw[-1] == b"\x01\xff"
    rollup = mnt.split_keys(512, 8)
    assert len(rollup) == 63 and rollup[0] == b"\x00\x08" and rollup[-1] == b"\x01\xf8"


def test_schema_rules():
    s = HBaseTableSchema().set_row_key("rk", StringType())
    with pytest.raises(ValueError, match="multiple times"):
        s.set_row_key("rk2", StringType())
    with pytest.raises(TypeError, match="byte\\[\\]"):
        s.add_column("f", "arr", ArrayType(IntegerType()))
    s.add_column("f1", "a", LongType()).add_column("f1", "b", DoubleType())
    st = s.to_struct_type()
    assert [f.name for f in st.fields] == ["rk", "f1"]

    round_trip = HBaseTableSchema.from_struct_type(st)
    assert round_trip.rowkey_name == "rk"
    assert round_trip.families == {"f1": {"a": LongType(), "b": DoubleType()}}

    with pytest.raises(ValueError, match="exactly one atomic"):
        HBaseTableSchema.from_struct_type(
            StructType([StructField("a", StringType()), StructField("b", LongType())])
        )

    proj = s.project({"f1": ["a"]})
    assert proj.families == {"f1": {"a": LongType()}}


def test_bucketed_table_plans_zero_exchanges(spark, tmp_path):
    """K1/D4 scale contract: on a bucket-clustered table, bucket-keyed agg
    and join satisfy distribution from the scan itself — no shuffle."""
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.operators.maintenance import (
        create_bucketed_table,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") % 512).cast("int").alias("bucket"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    t1 = create_bucketed_table(df, "t_kv_b", str(tmp_path / "t1"), file_buckets=8)
    t2 = create_bucketed_table(
        df.select("bucket", F.col("k").alias("w")), "t_kv2_b",
        str(tmp_path / "t2"), file_buckets=8,
    )
    agg_plan = (
        t1.groupBy("bucket").agg(F.sum("v"))._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in agg_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jplan = (
            t1.join(t2, "bucket")._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in jplan
    assert t1.count() == 4000
