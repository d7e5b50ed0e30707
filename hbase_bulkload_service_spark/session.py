"""SparkSession factory tuned for the engine.

The reference sizes a dedicated Flink per-job cluster
(FlinkEnvironmentBuild.java:55-74: 1024MB TM, 2 slots, request-level
parallelism). The Spark-first analog is one long-lived session with AQE
doing runtime re-planning; parallelism scales with the cluster, not the
request.

Scale posture (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting.
- Shuffle partitions default high enough to not bottleneck local runs but
  overridable by env for cluster deployment.
- Session timezone pinned to UTC: all TSDB epoch arithmetic is
  timezone-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # small-dim broadcast threshold; lookup-join (F1) dim tables are small
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # Python DataSource pushdown (sources/hfilescan.py region elision)
    "spark.sql.python.filterPushdown.enabled": "true",
}


def pinned_width(spark: SparkSession, per_core: int = 2, floor: int = 8) -> int:
    """Task width for explicit AQE-exempt ``repartition(n, keys)`` pins.

    Several operators pin a numbered repartition ahead of a CPU-heavy but
    byte-small stage (post-blocking verify, grouped-map Python, exact
    COUNT DISTINCT) because AQE coalesces shuffle partitions by BYTES and
    would serialize the stage onto a handful of tasks. The width must
    scale with the cluster — a literal caps parallelism on big clusters
    and over-tasks tiny ones — so it is derived from
    ``defaultParallelism`` (total executor cores) instead (ADVICE r05:
    similarity.py's hard-coded 64). ``per_core=2`` gives mild
    over-decomposition for stragglers; local[32] yields 64, matching the
    literal the fixed sites used to carry.

    The width must also never COLLIDE with the session's
    ``spark.sql.shuffle.partitions``: when the pin's keys and width both
    match the child's ENSURE_REQUIREMENTS exchange, Catalyst elides the
    user repartition as already-satisfied — and the surviving exchange
    is AQE-coalescible, silently reintroducing the single-task trap the
    pin exists to prevent (caught by
    test_ngram_verify_spread_survives_aqe under a local[4]/8-partition
    session where both widths landed on 8). On collision the width grows
    by a FULL core wave, not by 1: w+1 tasks on w-sized clusters schedule
    as an extra near-empty wave (64 cores, 65 uniform tasks -> one
    straggler wave, ~+50% stage wall — measured inflating the pinned
    queries' 10x probe readings), while w+parallelism keeps task count a
    wave multiple with the same total CPU.
    """
    par = spark.sparkContext.defaultParallelism
    w = max(floor, par * per_core)
    if w == int(spark.conf.get("spark.sql.shuffle.partitions")):
        w += par
    return w


def get_spark(
    app_name: str = "hbase-bulkload-service-spark",
    master: str | None = None,
    **conf_overrides: str,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` outside a cluster.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in conf_overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
