#!/usr/bin/env python
"""Benchmark harness — runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via a noop-format write (forces every
operator, no driver collect cost)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_bulkload_service_spark import registry  # noqa: E402
from hbase_bulkload_service_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footer caches with the cheapest query
    registry.QUERIES["q04_point_get"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Python workers + Arrow path so the first pandas-UDF query
    # isn't charged worker-spawn cost
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    ident = pandas_udf(lambda s: s, "long")
    spark.range(0, 100000).repartition(int(cpus)).select(
        ident(F.col("id")).alias("x")
    ).write.format("noop").mode("overwrite").save()
    # materialize every table once (all columns) so no query is charged
    # first-scan footer/decode costs
    from hbase_bulkload_service_spark.sources.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # warm the Python DSv2 source (hfilescan) the same way as the pandas
    # path: its first use pays one-time Python planner + reader spawn
    # (~2-3 s) that is session overhead, not query cost — q56 measures
    # the pipeline, not the interpreter boot
    import shutil
    import tempfile

    from hbase_bulkload_service_spark.sources import hfile, hfilescan

    wd = tempfile.mkdtemp(prefix="benchwarm")
    try:
        tiny = spark.createDataFrame(
            [(0, b"\x00k", "006b", b"t", b"\x00\x01", "0001", b"\x00" * 8)],
            "bucket int, key binary, key_hex string, family binary, "
            "qualifier binary, qualifier_hex string, value binary",
        )
        hfile.write_hfiles(tiny.coalesce(1), wd, num_partitions=1)
        hfilescan.register(spark)
        spark.read.format("hfilescan").option("path", wd).load().write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    times: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        # operators persist() intermediates (LSH signatures, gram index);
        # drop them so later queries aren't measured under cache pressure
        from hbase_bulkload_service_spark import cachereg

        cachereg.release_all()
        spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                # hardware calibration: fixed deterministic work, so wall
                # times from different rounds/VMs can be normalized before
                # comparison (round-3 observation: identical code measured
                # ~1.4x slower than the recorded round-2 figures on a
                # different VM placement; these probes make that visible).
                "calibration": _calibration(spark, int(cpus)),
            }
        )
    )


def _calibration(spark, cpus: int) -> dict:
    """Two fixed-size probes: a single-core pure-Python loop (driver CPU
    speed) and a Spark shuffle round (JVM + scheduler + exchange path).
    Deterministic work — differences across runs measure the machine,
    not the engine."""
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i * i
    py_ms = round((time.perf_counter() - t0) * 1000, 1)

    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 2_000_000, numPartitions=cpus)
        .groupBy((F.col("id") % 1000).alias("k"))
        .agg(F.sum("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    shuffle_ms = round((time.perf_counter() - t0) * 1000, 1)
    return {"py_loop_ms": py_ms, "spark_shuffle_ms": shuffle_ms}


if __name__ == "__main__":
    main()
