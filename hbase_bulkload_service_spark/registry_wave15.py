"""Registry wave 15 (q157+) — the remaining OpenTSDB read-path family:

- q157 dense-grid resample with LINEAR interpolation fill (the other
  OpenTSDB fill policy, complement of q141's zero-order hold);
- q158 stale-series / dead-metric detection (the monitoring sweep every
  TSDB runs: which series stopped reporting?);
- q159 exact percentile downsample (the OpenTSDB percentile aggregator
  family — p50/p95/p99 per series per bucket, the latency-dashboard
  staple).

Same portability rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
from hbase_bulkload_service_spark.oracle_frags import duck_zoh_grid_ctes
from hbase_bulkload_service_spark.registry import cents, register
from hbase_bulkload_service_spark.sources.tables import load_events

_CENTS = "CAST(FLOOR(value * 100) AS BIGINT)"


# ===========================================================================
# q157 — dense grid + LINEAR interpolation fill
# ===========================================================================


@register(
    "q157_grid_fill_linear",
    f"""
    WITH {duck_zoh_grid_ctes(900_000)},
    fl AS (
      SELECT event_type, bucket,
             cents IS NOT NULL AS is_observed,
             last_value(cents IGNORE NULLS) OVER wf AS pv,
             last_value(CASE WHEN cents IS NOT NULL THEN bucket END
                        IGNORE NULLS) OVER wf AS pb,
             first_value(cents IGNORE NULLS) OVER wb AS nv,
             first_value(CASE WHEN cents IS NOT NULL THEN bucket END
                         IGNORE NULLS) OVER wb AS nb
      FROM j
      WINDOW wf AS (PARTITION BY event_type ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING),
             wb AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(CASE WHEN is_observed THEN pv
                ELSE pv + ((nv - pv) * (bucket - pb)) // (nb - pb)
                END AS BIGINT) AS filled,
           is_observed
    FROM fl
    """,
)
def q157_grid_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 15-minute grid per event type with LINEAR interpolation
    in the gaps (tsdb.grid_fill_linear): integer-truncating interp —
    engine-portable on decreasing series because Spark `div` and DuckDB
    `//` both truncate toward zero. Grid-sized state after the first
    exchange, like q141."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    return tsdb_ops.grid_fill_linear(ev, step_ms=900_000)


# ===========================================================================
# q158 — stale-series detection
# ===========================================================================

# fixed derivation: the generator's event range is Jan 2024 at every SF,
# so dropping the 'error' series after Jan 21 00:00 UTC makes it ~10 days
# stale against the corpus max while every live series stays minutes old
_CUTOFF_MS = 1_705_795_200_000  # 2024-01-21T00:00:00Z
_STALE_AFTER_MS = 5 * 86_400_000  # 5 days


@register(
    "q158_stale_series",
    f"""
    WITH c AS (
      SELECT event_type, epoch_ms(ts) AS ts_ms FROM events
      WHERE ts IS NOT NULL
        AND NOT (event_type = 'error' AND epoch_ms(ts) >= {_CUTOFF_MS})
    ),
    last AS (
      SELECT event_type, MAX(ts_ms) AS last_ts_ms FROM c GROUP BY event_type
    ),
    now AS (SELECT MAX(last_ts_ms) AS now_ms FROM last)
    SELECT event_type, last_ts_ms,
           now_ms - last_ts_ms AS age_ms,
           now_ms - last_ts_ms > {_STALE_AFTER_MS} AS is_stale
    FROM last CROSS JOIN now
    """,
)
def q158_stale_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-metric sweep (tsdb.stale_series): per series the last sample
    age against the corpus-max "now"; the fixture silences the 'error'
    series after a fixed date in BOTH engines, so the stale branch is
    live (every series in the raw corpus reports up to the final
    minutes). One combiner-bounded MAX agg + a 1-row broadcast."""
    ev = load_events(spark, sf_dir, spread=True).filter(
        ~(
            (F.col("event_type") == "error")
            & (F.col("ts_ms") >= _CUTOFF_MS)
        )
    )
    return tsdb_ops.stale_series(ev, stale_after_ms=_STALE_AFTER_MS)


# ===========================================================================
# q159 — exact percentile downsample
# ===========================================================================


@register(
    "q159_percentile_downsample",
    f"""
    WITH c AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS bucket,
             {_CENTS} AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
      SELECT event_type, bucket, cents,
             row_number() OVER (
               PARTITION BY event_type, bucket ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, bucket) AS n
      FROM c
    ),
    ps AS (
      SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE),
                     CAST(0.99 AS DOUBLE)]) AS p
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, p,
           cents AS quantile_value, CAST(n AS BIGINT) AS bucket_n
    FROM r CROSS JOIN ps
    WHERE rn = CAST(ceil(p * n) AS INT)
    """,
)
def q159_percentile_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 per (event type, hour) — exact PERCENTILE_DISC over a
    composite time key (tsdb.percentile_downsample): the OpenTSDB
    percentile aggregator, latency dashboards' staple. ONE exchange on
    (series, bucket); rank + count windows share it; bucket width caps
    per-group sort state."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    return tsdb_ops.percentile_downsample(
        ev, bucket_ms=3_600_000, ps=(0.5, 0.95, 0.99)
    )


# ===========================================================================
# q164 — time-weighted percentile downsample
# ===========================================================================


@register(
    "q164_time_weighted_percentile",
    f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, {_CENTS} AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type, event_id, ts_ms, cents,
             ts_ms // 3600000 AS bucket
      FROM e
    ),
    h AS (
      SELECT event_type, bucket, cents, ts_ms, event_id,
             COALESCE(lead(ts_ms) OVER (
                        PARTITION BY event_type, bucket
                        ORDER BY ts_ms, event_id),
                      (bucket + 1) * 3600000) - ts_ms AS hold
      FROM b
    ),
    c AS (
      SELECT event_type, bucket, cents, ts_ms, event_id,
             SUM(hold) OVER (PARTITION BY event_type, bucket
                             ORDER BY cents, ts_ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(hold) OVER (PARTITION BY event_type, bucket) AS total,
             COUNT(*) OVER (PARTITION BY event_type, bucket) AS n
      FROM h
    ),
    f AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                                   ORDER BY cents, ts_ms, event_id) AS rk
      FROM c WHERE cum * 1000000 >= 500000 * total
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(500000 AS BIGINT) AS p_ppm, cents AS twp,
           CAST(total AS BIGINT) AS total_hold_ms, CAST(n AS BIGINT) AS n
    FROM f WHERE rk = 1
    """,
)
def q164_time_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted MEDIAN per (event type, hour)
    (tsdb.time_weighted_percentile): each sample weighted by its
    zero-order-hold duration — the percentile estimator a bursty
    sampling rate cannot bias, completing the downsampler family
    (q138 time-weighted avg, q159 rank percentile). ONE (series,
    bucket) exchange shared by the hold window, the cumulative-hold
    window, and the winner rank."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    out = tsdb_ops.time_weighted_percentile(
        ev, bucket_ms=3_600_000, p_ppm=500_000
    )
    return out.select(
        "event_type",
        "bucket",
        F.col("p_ppm").cast("long").alias("p_ppm"),
        "twp",
        "total_hold_ms",
        "n",
    )
