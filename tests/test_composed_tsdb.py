"""Composed TSDB pipeline gate (pytest twin of the q139/q140 composition
pattern): events → 5-minute rollup → 1-hour cascade → dense hourly grid
with zero-order-hold fill, verified END-TO-END against one DuckDB oracle
over the same parquet input — proving the OPERATOR CHAIN (not just each
stage) agrees cross-engine, including the hand-off columns between
stages (window_start_sec units, cents sums, grid bucket arithmetic)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import tsdb


def _mk_events(spark, tmp_path):
    # 2 types, irregular hours with REAL gaps (hour 1 and 3 missing for
    # 'a'; 'b' covers a shorter span) — the shape the fill exists for
    rows = []
    for h, m, t, v in [
        (0, 10, "a", 1.25), (0, 40, "a", 2.50),
        (2, 5, "a", 4.00),
        (4, 59, "a", 8.00),
        (1, 0, "b", 3.00), (2, 30, "b", 5.00),
    ]:
        rows.append((t, (h * 3600 + m * 60) * 1000, v, len(rows)))
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, value double, event_id long"
    )
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return df, p


_ORACLE = """
WITH r5 AS (
  SELECT (ts_ms // 1000) - ((ts_ms // 1000) % 300) AS window_start_sec,
         event_type, COUNT(*) AS cnt,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS sum_value_cents,
         MIN(CAST(FLOOR(value * 100) AS BIGINT)) AS min_value_cents,
         MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS max_value_cents
  FROM ev GROUP BY 1, 2
),
r1h AS (
  SELECT window_start_sec - (window_start_sec % 3600) AS hour_start_sec,
         event_type, SUM(cnt) AS cnt, SUM(sum_value_cents) AS sum_cents,
         MIN(min_value_cents) AS min_cents, MAX(max_value_cents) AS max_cents
  FROM r5 GROUP BY 1, 2
),
obs AS (
  SELECT event_type, hour_start_sec // 3600 AS bucket, sum_cents FROM r1h
),
span AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM obs GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS bucket FROM span
),
j AS (
  SELECT g.event_type, g.bucket, o.sum_cents
  FROM grid g LEFT JOIN obs o
    ON o.event_type = g.event_type AND o.bucket = g.bucket
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(last_value(sum_cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS filled,
       sum_cents IS NOT NULL AS is_observed
FROM j
"""


def test_rollup_cascade_gridfill_matches_duckdb_end_to_end(spark, tmp_path):
    ev, path = _mk_events(spark, tmp_path)
    r5 = tsdb.rollup_5m(ev)
    r1h = tsdb.rollup_cascade_1h(r5)
    hourly = r1h.select(
        "event_type",
        F.col("window_start_sec").alias("ts"),
        F.col("sum_value_cents").alias("v"),
        F.col("window_start_sec").alias("tie"),
    )
    out = tsdb.grid_fill(
        hourly, series_col="event_type", ts_col="ts", value_col="v",
        id_col="tie", step_ms=3600,
    )
    got = sorted(
        (r["event_type"], r["bucket"], r["filled"], r["is_observed"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ev AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_ORACLE).fetchall())
    assert got == want
    # and the gaps are real: hour 1 and 3 of 'a' synthesized by the fill
    a = {b: (f, o) for t, b, f, o in got if t == "a"}
    assert set(a) == {0, 1, 2, 3, 4}
    assert a[1] == (a[0][0], False) and a[3] == (a[2][0], False)


def test_cascade_equals_direct_hourly_rollup(spark, tmp_path):
    """Mergeability cross-check inside the composition: cascading
    5-minute rollups to hours must equal rolling up the raw events
    directly at hour granularity."""
    ev, _ = _mk_events(spark, tmp_path)
    via_cascade = tsdb.rollup_cascade_1h(tsdb.rollup_5m(ev)).select(
        "event_type", "window_start_sec", "cnt", "sum_value_cents",
        "min_value_cents", "max_value_cents",
    )
    direct = tsdb.rollup_5m(ev, window_sec=3600).select(
        "event_type", "window_start_sec", "cnt", "sum_value_cents",
        "min_value_cents", "max_value_cents",
    )
    assert sorted(map(tuple, via_cascade.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_binary_sort_order_is_isomorphic_to_hex_sort_order(spark):
    """Round-8 invariant behind sorting bulkload_kv/write_hfiles on RAW
    binary keys: Spark's BinaryType ordering (unsigned lexicographic,
    == HBase Bytes.compareTo) must agree with ordering by the uppercase
    hex projection on adversarial keys — high bit set, 0x00 bytes,
    shared prefixes of different lengths, empty key."""
    import itertools

    keys = [b"", b"\x00", b"\x00\x00", b"\x7f", b"\x80", b"\xff",
            b"\x00\xff", b"\xff\x00", b"\x80\x00\x01", b"\x80\x00",
            b"ab", b"abc", b"aBc", b"\x10\x20", b"\x10", b"\x0f\xff"]
    keys += [bytes(p) for p in itertools.product([0, 127, 128, 255], repeat=2)]
    df = spark.createDataFrame([(k,) for k in keys], "k binary")
    from hbase_bulkload_service_spark.functions.codec import key_hex
    by_bin = [bytes(r.k) for r in df.orderBy("k").collect()]
    by_hex = [bytes(r.k) for r in df.orderBy(key_hex(F.col("k"))).collect()]
    assert by_bin == by_hex
    # and both equal Python's bytes ordering (unsigned lexicographic)
    assert by_bin == sorted(keys)
