"""Watermark / late-data parity for the streaming rollup cascade
(VERDICT r07 item 8 — the one streaming surface that was only
happy-path pytest-green).

The replay drives each fixture FILE through its own micro-batch
(``maxFilesPerTrigger=1`` + distinct mtimes, availableNow), so events
arriving out of order ACROSS micro-batches exercise real watermark
semantics instead of collapsing into one batch:

- a late event whose window is still open under the watermark must be
  INTEGRATED into that window's final emission;
- a late event whose window end has passed the watermark must be
  DROPPED;
- every window the stream emits (append mode = settled windows only)
  must match the batch ``tsdb.rollup_5m`` oracle computed over exactly
  the surviving events;
- the stateful latest-version upsert (watermark-free per-key state)
  must settle to the batch ``max_by`` truth regardless of version
  arrival order across batches.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from hbase_bulkload_service_spark import streaming as st
from hbase_bulkload_service_spark.operators import tsdb


def _write_batches(spark, d, schema, batches):
    """One parquet file per batch, strictly increasing mtimes so the
    file source (oldest-first) replays them in order."""
    os.makedirs(d, exist_ok=True)
    t0 = time.time() - 3600
    for i, rows in enumerate(batches):
        sub = os.path.join(d, f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        for fn in os.listdir(sub):
            if fn.endswith(".parquet"):
                full = os.path.join(d, f"batch_{i}.parquet")
                os.replace(os.path.join(sub, fn), full)
                os.utime(full, (t0 + i * 10, t0 + i * 10))


def test_streaming_rollup_late_data_settles_to_batch_oracle(spark, tmp_path):
    d = str(tmp_path / "events")
    # watermark 10 min, window 5 min; epoch-day timestamps for clean
    # math. Measured Spark semantics (this fixture was derived by
    # probing, not assuming): a below-watermark row is DROPPED only once
    # its window's state has been EVICTED, and append-mode eviction runs
    # in the first batch whose (start-of-batch) watermark has passed the
    # window end — so the to-be-dropped row must arrive one batch AFTER
    # the watermark passes, else it merges into the still-live state.
    batches = [
        # batch 0: w0 gets two events; 00:26 sets the NEXT batch's
        # watermark to 00:16
        [("2024-01-01 00:01:00", "click", 1.00),
         ("2024-01-01 00:03:00", "click", 2.00),
         ("2024-01-01 00:26:00", "click", 8.00)],
        # batch 1 (watermark 00:16): w0 (end 00:05) is evicted + emitted
        # THIS batch; 00:17 is 9 min late but w15 (end 00:20) is still
        # open under the watermark -> INTEGRATED; 00:22 on time
        [("2024-01-01 00:17:00", "click", 16.00),
         ("2024-01-01 00:22:00", "view", 3.00)],
        # batch 2: 00:02 targets the already-evicted w0 -> DROPPED
        # (numRowsDroppedByWatermark); 00:40 pushes the final watermark
        # to 00:30, closing w15/w20/w25; its own w40 stays open
        [("2024-01-01 00:02:00", "click", 4.00),
         ("2024-01-01 00:40:00", "click", 1.00)],
    ]
    _write_batches(
        spark, d, "ts_s string, event_type string, value double", batches,
    )
    stream = (
        spark.readStream.schema("ts_s string, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    )
    out = st.streaming_rollup_5m(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("late_rollup")
        .outputMode("append")  # settled windows only
        .trigger(availableNow=True)
        .start()
    )
    st.await_finite(q, 120)
    got = {
        (r.window_start_sec, r.event_type): (
            r.cnt, r.sum_value_cents, r.min_value_cents, r.max_value_cents,
        )
        for r in spark.sql("SELECT * FROM late_rollup").collect()
    }
    # the beyond-watermark row was dropped by the WATERMARK mechanism,
    # not lost some other way
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1

    # batch oracle over exactly the SURVIVING events (00:02 dropped),
    # restricted to windows closed by the final watermark (00:30)
    surviving = [r for b in batches for r in b if r[0] != "2024-01-01 00:02:00"]
    ev = (
        spark.createDataFrame(
            surviving, "ts_s string, event_type string, value double"
        )
        .select(
            (F.unix_timestamp(F.to_timestamp("ts_s")) * 1000).alias("ts_ms"),
            "event_type", "value",
        )
    )
    final_wm = F.unix_timestamp(F.to_timestamp(F.lit("2024-01-01 00:30:00")))
    oracle = {
        (r.window_start_sec, r.event_type): (
            r.cnt, r.sum_value_cents, r.min_value_cents, r.max_value_cents,
        )
        for r in tsdb.rollup_5m(ev)
        .filter((F.col("window_start_sec") + 300) <= final_wm)
        .collect()
    }
    assert got == oracle
    day = next(iter(got))[0] - next(iter(got))[0] % 86400
    # the late-but-in-watermark event really landed in w15
    assert got[(day + 15 * 60, "click")] == (1, 1600, 1600, 1600)
    # w0 settled WITHOUT the dropped late event (else sum would be 700)
    assert got[(day, "click")] == (2, 300, 100, 200)
    # the still-open w40 did not emit
    assert (day + 40 * 60, "click") not in got


def test_streaming_latest_version_out_of_order_replay_settles_to_max_by(
    spark, tmp_path
):
    d = str(tmp_path / "cells")
    batches = [
        [("k1", "q1", 300, 3.0), ("k2", "q1", 100, 1.0)],
        # k1's 100/200 arrive AFTER its 300 (stale versions, no-ops);
        # k2's 400 is a genuine upsert
        [("k1", "q1", 100, 9.0), ("k2", "q1", 400, 4.0)],
        # ties on version resolve to max value, batch-order-independent
        [("k1", "q1", 200, 7.0), ("k2", "q1", 400, 2.0)],
    ]
    _write_batches(spark, d, st.CELL_SCHEMA, batches)
    stream = (
        spark.readStream.schema(st.CELL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = st.streaming_latest_version(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("late_latest")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    st.await_finite(q, 120)
    settled = {
        (r.key, r.qualifier): (r.version_ts, r.value)
        for r in spark.sql(
            "SELECT key, qualifier, max_by(version_ts, version_ts) version_ts,"
            " max_by(value, struct(version_ts, value)) value FROM late_latest"
            " GROUP BY key, qualifier"
        ).collect()
    }
    allrows = [r for b in batches for r in b]
    truth = {
        (r.key, r.qualifier): (r.version_ts, r.value)
        for r in spark.createDataFrame(allrows, st.CELL_SCHEMA)
        .groupBy("key", "qualifier")
        .agg(
            F.max("version_ts").alias("version_ts"),
            F.max_by("value", F.struct("version_ts", "value")).alias("value"),
        )
        .collect()
    }
    assert settled == truth == {
        ("k1", "q1"): (300, 3.0),
        ("k2", "q1"): (400, 4.0),
    }
