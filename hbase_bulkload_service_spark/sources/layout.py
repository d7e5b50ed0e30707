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


# ---------------------------------------------------------------------------
# Z-order (Morton) layout — multi-dimensional file skipping
# ---------------------------------------------------------------------------

def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into one
    long: bit i of ``c1`` lands at position 2i, bit i of ``c2`` at 2i+1.

    Why: a layout sorted on ``(bucket, hour)`` clusters perfectly for
    bucket predicates but scatters any hour-only range across EVERY
    bucket run; sorting on the z-value bounds BOTH dimensions per file —
    parquet row-group min/max stats then skip on either predicate (the
    same trick Delta/Iceberg OPTIMIZE ZORDER applies). Pure shift/or
    expression chain — whole-stage codegen, no UDF, no shuffle beyond
    the layout write's own range partition.

    ``bits`` bounds the domain HARD: only bits 0..bits-1 of each input
    are interleaved, so a value ≥ 2^bits would silently collide with
    ``value mod 2^bits`` and destroy the layout's clustering (epoch
    timestamps against the default 16 bits being the classic misuse).
    Out-of-range values therefore raise at execution time — rescale or
    bucket inputs into [0, 2^bits) first (e.g. ``ts_sec div 3600`` hour
    numbers relative to the table's min, or a modulo bucket that IS the
    intended key)."""
    lim = F.lit(1 << bits).cast("long")
    oob = (
        "zorder_key: input exceeds the %d-bit budget; rescale or bucket "
        "into [0, 2^bits) first" % bits
    )
    a = c1.cast("long")
    b = c2.cast("long")
    a = F.when((a < 0) | (a >= lim), F.raise_error(F.lit(oob))).otherwise(a)
    b = F.when((b < 0) | (b >= lim), F.raise_error(F.lit(oob))).otherwise(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write ``df`` range-partitioned + sorted by the z-value of
    ``(c1, c2)`` — each output file covers a compact rectangle in the
    (c1, c2) plane, so row-group stats prune on either column alone.
    The z column is dropped from the files (recomputable)."""
    z = zorder_key(F.col(c1), F.col(c2), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
