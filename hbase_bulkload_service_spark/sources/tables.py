"""Parquet-backed table loading (SURVEY.md §2.A A1-A3).

The reference plans one input split per HBase region intersected with the
scan range, with locality hints (AbstractTableInputFormat.java:219-283).
Spark's file source does the same job natively: split planning, locality,
predicate pushdown and column pruning all come from the parquet scan — the
engine only declares filters/projections and lets Catalyst push them down.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # parquet reader rejects; read nanos as raw long instead.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return spread_scan(df) if spread else df


def spread_scan(df: DataFrame) -> DataFrame:
    """Normalize scan granularity before CPU-heavy downstream stages.

    A parquet scan parallelizes at row-group granularity; a table written
    as a single row group (the testdata fixtures) plans ONE input
    partition, serializing every downstream codec/hash/UDF stage no matter
    how many cores the session has. When the scan yields fewer partitions
    than half the cores, redistribute round-robin once. On a cluster
    reading 100 TB the scan already yields far more splits than cores and
    this is a no-op — the exchange only fires in the degenerate
    small-file case it exists to fix. Filter pushdown is unaffected:
    Catalyst pushes predicates below a round-robin repartition, so pinned
    `PushedFilters` contracts still hold (tests/test_plan_contracts.py)."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 > cores:
        return df
    return df.repartition(cores)


def load_events(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """events with a normalized ``ts_ms`` epoch-millis column, robust to the
    session's parquet timestamp representation (nanos-as-long, NTZ, LTZ)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    df = load(spark, sf_dir, "events", spread=spread)
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        ts_ms = F.expr("ts div 1000000")
    elif isinstance(dt, TimestampNTZType):
        ts_ms = F.expr("timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    else:
        ts_ms = F.unix_millis(F.col("ts"))
    return df.withColumn("ts_ms", ts_ms)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
