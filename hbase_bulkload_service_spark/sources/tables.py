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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # parquet reader rejects; read nanos as raw long instead.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a normalized ``ts_ms`` epoch-millis column, robust to the
    session's parquet timestamp representation (nanos-as-long, NTZ, LTZ)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    df = load(spark, sf_dir, "events")
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
