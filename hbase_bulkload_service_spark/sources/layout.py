"""Time-partitioned storage layout (A1/B1 scale path).

The reference pushes its time-range predicate into storage as a
FuzzyRowFilter over the rowkey's 4-byte hour field (TsdbScanner.java:16-53)
and elides region splits outside the scan range
(AbstractTableInputFormat.java:248-273). The Spark-native equivalent is a
**partitioned layout**: cells written under ``ts_part=<epoch-sec>`` dirs
make the same predicate a partition-PRUNING filter — out-of-range hours are
never opened, the directory listing is the index. At 100 TB this is the
difference between scanning everything and touching only the queried hours.

Granularity: ``day`` for moderate retention (≤ ~10k partitions for 30 y),
``hour`` when queries are sub-day and the table is hot. Partition values
are epoch-second integers (TZ-proof, order-preserving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators.tsdb import HOUR_MS, HOUR_SEC, hour_range_filter

DAY_SEC = 86400

_GRANULARITY_SEC = {"hour": HOUR_SEC, "day": DAY_SEC}


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_sec_col: str = "ts_sec",
    granularity: str = "day",
) -> None:
    """Dynamic-partition write under ``ts_part=<epoch-sec floor>`` dirs.
    Input should be repartitioned by the partition column upstream if the
    job is large (one writer per partition value, H2-style roll)."""
    step = _GRANULARITY_SEC[granularity]
    part = (F.col(ts_sec_col) - F.col(ts_sec_col) % step).cast("long")
    (
        df.withColumn("ts_part", part)
        .repartition(F.col("ts_part"))  # one writer set per partition value
        .write.mode("overwrite")
        .partitionBy("ts_part")
        .parquet(path)
    )


def scan_time_partitioned(
    spark: SparkSession,
    path: str,
    start_ms: int,
    end_ms: int,
    ts_sec_col: str = "ts_sec",
    granularity: str = "day",
) -> DataFrame:
    """Whole-hour time-range scan (B1 semantics) over a partitioned layout.

    Two cooperating predicates:
    - a range filter on ``ts_part`` → **partition pruning** (Catalyst
      PartitionFilters; unqueried dirs never listed into the scan);
    - the exact hour-bucket filter on the row timestamp → row-level
      correctness inside boundary partitions when granularity is coarser
      than an hour.
    """
    step = _GRANULARITY_SEC[granularity]
    start_hour_sec = (start_ms - start_ms % HOUR_MS) // 1000
    end_hour_sec = (end_ms - end_ms % HOUR_MS) // 1000
    lo = start_hour_sec - start_hour_sec % step
    hi = (end_hour_sec - 1) - (end_hour_sec - 1) % step
    df = spark.read.parquet(path).filter(
        (F.col("ts_part") >= F.lit(lo)) & (F.col("ts_part") <= F.lit(hi))
    )
    return hour_range_filter(df, start_ms, end_ms, ts_sec_col=ts_sec_col)
