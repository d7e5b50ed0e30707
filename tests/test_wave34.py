"""Wave-34 operational-surface tests: same-pass observe metrics and
checkpointed incremental ingest (exactly-once across stream restarts).
Registry oracle parity for q241-q243 runs in tools/selfcheck.py."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def test_observe_counters_match_truth(spark):
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "err", 20), (3, "a", 30)], "id long, t string, v long"
    )
    obs = Observation("t34")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("t") == "err", 1).otherwise(0)).alias("n_err"),
        F.sum("v").alias("sv"),
    )
    observed.groupBy("t").count().collect()  # the pass the metrics ride
    m = obs.get
    assert (m["n"], m["n_err"], m["sv"]) == (3, 1, 60)


def _land(spark, land, rows, i):
    os.makedirs(land, exist_ok=True)
    tmp = f"{land}/_b{i}"
    spark.createDataFrame(rows, "id long, v long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    t0 = time.time() - 3600
    for fn in os.listdir(tmp):
        if fn.endswith(".parquet"):
            full = f"{land}/batch_{i}.parquet"
            os.replace(os.path.join(tmp, fn), full)
            os.utime(full, (t0 + i * 10, t0 + i * 10))


def test_checkpointed_restart_is_exactly_once(spark, tmp_path):
    """Two availableNow runs sharing a checkpoint over a landing dir that
    grew in between: run 2 must ingest ONLY the new file; the sink's
    commit log must keep the union duplicate-free."""
    from hbase_bulkload_service_spark.streaming import ops as st

    land, out, ckpt = str(tmp_path / "land"), str(tmp_path / "out"), str(
        tmp_path / "ckpt"
    )

    def run_once():
        q = (
            spark.readStream.schema("id long, v long")
            .parquet(land)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        st.await_finite(q, 120)

    _land(spark, land, [(1, 10), (2, 20)], 0)
    run_once()
    first = sorted((r["id"], r["v"]) for r in spark.read.parquet(out).collect())
    assert first == [(1, 10), (2, 20)]
    _land(spark, land, [(3, 30)], 1)
    run_once()
    final = sorted((r["id"], r["v"]) for r in spark.read.parquet(out).collect())
    # exactly-once: old rows NOT re-ingested, new row present once
    assert final == [(1, 10), (2, 20), (3, 30)]
