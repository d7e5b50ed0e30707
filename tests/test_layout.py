"""Time-partitioned layout contract (sources/layout.py): the hour-range
scan must PRUNE partitions — same results as the row-level filter, while
opening only the in-range directories."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import tsdb
from hbase_bulkload_service_spark.sources import layout
from hbase_bulkload_service_spark.sources.tables import load_events

SF_DIR = "/root/testdata/sf0.001"

# 3 whole days inside the events month (2024-01)
START_MS = 1704672000000  # 2024-01-08T00:00Z
END_MS = 1704931200000  # 2024-01-11T00:00Z


def test_partitioned_scan_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = load_events(spark, SF_DIR).withColumn(
        "ts_sec", F.expr("ts_ms div 1000")
    ).select("event_id", "ts_sec", "ts_ms")
    layout.write_time_partitioned(ev, path, granularity="day")

    def files_touched(df):
        return {
            r[0] for r in df.select(F.input_file_name()).distinct().collect()
        }

    total_parts = len(files_touched(spark.read.parquet(path)))
    scan = layout.scan_time_partitioned(spark, path, START_MS, END_MS, granularity="day")
    pruned_parts = len(files_touched(scan))
    # January has ~31 day-partitions; a 3-day scan must touch only 3
    assert 0 < pruned_parts < total_parts, (pruned_parts, total_parts)
    assert pruned_parts <= 3, (pruned_parts, total_parts)

    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert re.search(r"PartitionFilters: \[.*ts_part.*\]", plan), plan

    got = sorted(r.event_id for r in scan.collect())
    want = sorted(
        r.event_id
        for r in tsdb.hour_range_filter(ev, START_MS, END_MS).collect()
    )
    assert got == want and len(got) > 0


def test_hour_granularity_boundaries_exact(spark, tmp_path):
    # sub-day range over hour partitions: start/end mid-hour still honors
    # whole-hour (FuzzyRowFilter) semantics
    path = str(tmp_path / "events_by_hour")
    ev = load_events(spark, SF_DIR).withColumn(
        "ts_sec", F.expr("ts_ms div 1000")
    ).select("event_id", "ts_sec")
    day = ev.filter(
        (F.col("ts_sec") >= START_MS // 1000)
        & (F.col("ts_sec") < START_MS // 1000 + layout.DAY_SEC)
    )
    layout.write_time_partitioned(day, path, granularity="hour")
    s = START_MS + 25 * 60 * 1000  # 00:25
    e = START_MS + 3 * 3600 * 1000 + 10 * 60 * 1000  # 03:10
    scan = layout.scan_time_partitioned(spark, path, s, e, granularity="hour")
    got = sorted(r.event_id for r in scan.collect())
    want = sorted(r.event_id for r in tsdb.hour_range_filter(day, s, e).collect())
    assert got == want and len(got) > 0
