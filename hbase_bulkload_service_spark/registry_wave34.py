"""Registry wave 34 (round 8) — the three operational surfaces a
production ingest actually lives on, each previously pytest-only or
uncovered:

- the H6 buffered-sink contract driven END-TO-END: a cell stream flushed
  through ``foreachBatch`` into a latest-version-wins keyed snapshot
  (streaming/ops.upsert_batch_writer — micro-batches ARE the reference's
  2MB/1000-row/1s Put buffer);
- same-pass pipeline metrics via ``df.observe`` — row/null/sum counters
  collected DURING the production aggregate's single scan, the 100 TB
  answer to "audit the batch without a second pass";
- checkpointed incremental ingest: two ``availableNow`` runs over a
  growing directory sharing one checkpoint — run 2 processes ONLY the
  new files, the file sink's commit log keeps replays exactly-once.

Same portability rules as registry.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.session import local_frame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.registry import (
    _scoped_shuffle_partitions,
    cents,
    register,
)
from hbase_bulkload_service_spark.sources.tables import load_events

# ===========================================================================
# q241 — H6 buffered sink driven end-to-end (foreachBatch upsert)
# ===========================================================================


@register(
    "q241_foreachbatch_upsert",
    """
    WITH cells AS (
      SELECT CAST(user_id AS VARCHAR) AS key, event_type AS qualifier,
             epoch_ms(ts) AS version_ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS value
      FROM events WHERE user_id % 10 = 0
    )
    SELECT key, qualifier,
           MAX(version_ts) AS version_ts,
           arg_max(value, version_ts) AS value
    FROM cells GROUP BY key, qualifier
    """,
)
def q241_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 driven end-to-end: the cell stream replayed in micro-batches
    through ``foreachBatch`` + streaming/ops.upsert_batch_writer — each
    batch merges into a keyed parquet snapshot with latest-version-wins
    (read old ∪ batch → max_by per key → atomic directory swap). The
    reference's buffered sink (2 MB / 1000 rows / 1 s Put buffer,
    HBase2DynamicTableFactory.java:76-102) maps exactly onto
    micro-batch = flush; the settled snapshot equals the batch ``max_by``
    oracle regardless of how rows split across batches (two files +
    maxFilesPerTrigger=1 force a real multi-flush merge).

    arg_max ties: version collisions are impossible here — (key,
    qualifier, version_ts) is unique in this slice because version_ts is
    the event's own timestamp."""
    from hbase_bulkload_service_spark.streaming import ops as st

    cells = (
        load_events(spark, sf_dir, spread=True)
        .filter(F.col("user_id") % 10 == 0)
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_type").alias("qualifier"),
            F.col("ts_ms").alias("version_ts"),
            cents(F.col("value")).alias("value"),
        )
    )
    d = tempfile.mkdtemp(prefix="q241fb")
    try:
        # two source files with distinct mtimes -> two real flushes
        t0 = time.time() - 3600
        for i, pred in enumerate((F.col("version_ts") % 2 == 0,
                                  F.col("version_ts") % 2 == 1)):
            tmp = f"{d}/src/_b{i}"
            cells.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
            for fn in os.listdir(tmp):
                if fn.endswith(".parquet"):
                    os.makedirs(f"{d}/src", exist_ok=True)
                    full = f"{d}/src/batch_{i}.parquet"
                    os.replace(os.path.join(tmp, fn), full)
                    os.utime(full, (t0 + i * 10, t0 + i * 10))
            shutil.rmtree(tmp, ignore_errors=True)
        sch = "key string, qualifier string, version_ts long, value long"
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/src")
        )
        snap = f"{d}/snapshot"
        with _scoped_shuffle_partitions(spark, 8):
            q = (
                stream.writeStream.foreachBatch(st.upsert_batch_writer(snap))
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            st.await_finite(q, 300)
        rows = spark.read.parquet(snap).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_frame(spark,
        rows, "key string, qualifier string, version_ts long, value long"
    )


# ===========================================================================
# q242 — same-pass observed metrics (df.observe)
# ===========================================================================


@register(
    "q242_observed_metrics",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MIN(epoch_ms(ts)) AS BIGINT) AS min_ts_ms,
           CAST(MAX(epoch_ms(ts)) AS BIGINT) AS max_ts_ms
    FROM events
    """,
)
def q242_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability without a second scan: ``df.observe``
    attaches row/error/sum/ts-range counters to the PRODUCTION
    aggregate's own pass — the counters accumulate inside the same
    whole-stage-codegen'd scan that feeds the business aggregate, and at
    100 TB that is the difference between free monitoring and doubling
    the job. The production result is materialized (count) and the
    observation is returned as the query's 1-row frame; the oracle
    recomputes the same counters declaratively."""
    from pyspark.sql import Observation

    ev = load_events(spark, sf_dir, spread=True)
    obs = Observation("q242")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
    )
    # the production aggregate this pass actually exists for
    observed.groupBy("event_type").agg(F.count("*")).collect()
    m = obs.get
    return local_frame(spark,
        [
            (
                int(m["n_rows"]),
                int(m["n_errors"]),
                int(m["sum_cents"]),
                int(m["min_ts_ms"]),
                int(m["max_ts_ms"]),
            )
        ],
        "n_rows long, n_errors long, sum_cents long, min_ts_ms long, max_ts_ms long",
    )


# ===========================================================================
# q243 — checkpointed incremental ingest (exactly-once across restarts)
# ===========================================================================


@register(
    "q243_incremental_ingest",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events WHERE user_id % 9 = 0
    GROUP BY event_type
    """,
)
def q243_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed incremental ingest: the same streaming query started
    TWICE (availableNow) against a landing directory that grew between
    runs, both runs sharing one checkpoint — run 2's source offset log
    skips everything run 1 committed and processes ONLY the new file,
    and the parquet file sink's commit log (_spark_metadata) makes the
    combined output exactly-once even though the pipeline restarted.
    This is the nightly-ingest contract: crash/restart/late files, no
    dupes, no loss. The aggregate over the sink equals the plain batch
    oracle over all the data; a duplicated or dropped file would shift
    both counts and sums."""
    ev = (
        load_events(spark, sf_dir, spread=True)
        .filter(F.col("user_id") % 9 == 0)
        .select("event_id", "event_type", cents(F.col("value")).alias("cents"))
    )
    d = tempfile.mkdtemp(prefix="q243inc")
    try:
        land, out, ckpt = f"{d}/land", f"{d}/out", f"{d}/ckpt"
        os.makedirs(land, exist_ok=True)
        t0 = time.time() - 3600

        def _land(pred, i: int) -> None:
            tmp = f"{d}/_b{i}"
            ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
            for fn in os.listdir(tmp):
                if fn.endswith(".parquet"):
                    full = f"{land}/batch_{i}.parquet"
                    os.replace(os.path.join(tmp, fn), full)
                    os.utime(full, (t0 + i * 10, t0 + i * 10))
            shutil.rmtree(tmp, ignore_errors=True)

        sch = "event_id long, event_type string, cents long"

        def _run_once() -> None:
            from hbase_bulkload_service_spark.streaming import ops as st

            stream = spark.readStream.schema(sch).parquet(land)
            with _scoped_shuffle_partitions(spark, 8):
                q = (
                    stream.writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                st.await_finite(q, 300)

        _land(F.col("event_id") % 2 == 0, 0)
        _run_once()  # ingests file 0
        _land(F.col("event_id") % 2 == 1, 1)
        _run_once()  # restart: same checkpoint, ingests ONLY file 1
        final = (
            spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
        )
        rows = final.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_frame(spark,
        rows, "event_type string, n_rows long, sum_cents long"
    )
