"""Registry wave 16 (q160+) — product-analytics path mining and
cross-corpus leakage detection:

- q160 top user journeys (frequent ordered event paths — the FULL-path
  complement of q108's first-order transition matrix);
- q161 cross-source content-overlap matrix (train/test leakage and
  mirror detection across corpora — the pairwise generalization of
  q155's corpus-wide duplication rate).

Same portability rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load, load_events


# ===========================================================================
# q160 — top user journeys
# ===========================================================================


@register(
    "q160_user_journeys",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms
      FROM events
    ),
    r AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
      FROM e
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 5 GROUP BY user_id
    ),
    c AS (SELECT path, COUNT(*) AS n_users FROM p GROUP BY path),
    t AS (
      SELECT path, CAST(n_users AS BIGINT) AS n_users,
             CAST(row_number() OVER (ORDER BY n_users DESC, path ASC)
                  AS INT) AS rank
      FROM c
    )
    SELECT path, n_users, rank FROM t WHERE rank <= 20
    """,
)
def q160_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 five-step user journeys (analytics.user_journeys): each
    user's first 5 events in (ts, id) order form a path; paths are
    counted across users and ranked deterministically. The rank window
    and per-user path aggregate share ONE user-keyed exchange; the
    final top-k is a TakeOrdered over the path-cardinality count
    table."""
    ev = load_events(spark, sf_dir, spread=True)
    return analytics.user_journeys(ev, max_steps=5, top_k=20)


# ===========================================================================
# q161 — cross-source content-overlap matrix
# ===========================================================================


@register(
    "q161_source_overlap",
    """
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT 'mirror_src' AS source, text
      FROM documents WHERE doc_id % 4 = 0
    ),
    sd AS (
      SELECT source AS src, md5(COALESCE(text, '')) AS d, COUNT(*) AS cnt
      FROM corpus GROUP BY 1, 2
    )
    SELECT a.src AS source_a, b.src AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_digests,
           CAST(SUM(a.cnt) AS BIGINT) AS docs_a,
           CAST(SUM(b.cnt) AS BIGINT) AS docs_b
    FROM sd a JOIN sd b ON a.d = b.d AND a.src < b.src
    GROUP BY 1, 2
    """,
)
def q161_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which source pairs share content, and how much
    (curation.source_overlap): digest-keyed self-join whose per-key
    fan-out is bounded by SOURCE count, not document count. The fixture
    derives q155's mirror source in BOTH engines, so every original
    source overlaps the mirror on its every-4th docs while original
    pairs share nothing — both the hit and miss shapes are live."""
    docs = load(spark, sf_dir, "documents", spread=True)
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            F.lit("mirror_src").alias("source"), "text"
        )
    )
    return curation.source_overlap(corpus)


# ===========================================================================
# q162 — composed read-path gate: percentiles OF counter rates
# ===========================================================================


@register(
    "q162_rate_percentiles",
    """
    WITH c AS (
      SELECT event_type, user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    d AS (
      SELECT event_type, user_id, event_id, ts_ms, cents,
             cents - LAG(cents) OVER w AS raw_delta,
             ts_ms - LAG(ts_ms) OVER w AS dt_ms
      FROM c
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts_ms, event_id)
    ),
    f AS (SELECT * FROM d WHERE dt_ms IS NOT NULL AND dt_ms > 0),
    rate AS (
      SELECT event_type, ts_ms,
             CAST((CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END
                   * 1000000000) // dt_ms AS BIGINT) AS r
      FROM f
    ),
    b AS (SELECT event_type, ts_ms // 3600000 AS bucket, r FROM rate),
    rk AS (
      SELECT event_type, bucket, r,
             row_number() OVER (
               PARTITION BY event_type, bucket ORDER BY r) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, bucket) AS n
      FROM b
    ),
    ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS p)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, p,
           r AS quantile_value, CAST(n AS BIGINT) AS bucket_n
    FROM rk CROSS JOIN ps
    WHERE rn = CAST(ceil(p * n) AS INT)
    """,
)
def q162_rate_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE classic TSDB latency panel, composed end-to-end and gated as
    one unit: q151's counter rates (reset-rebased, per user series)
    pooled per event type and downsampled to exact p50/p99 per hour by
    q159's machinery (tsdb.counter_rate -> tsdb.percentile_downsample).
    Proves the COMPOSITION agrees across engines, not just each stage
    (the q139 composed-gate idiom applied to the TSDB read path).
    Plan: the rate's (type,user) exchange feeds the percentile's
    (type,bucket) exchange — two keyed exchanges total."""
    from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
    from hbase_bulkload_service_spark.registry import cents

    ev = load_events(spark, sf_dir, spread=True).withColumn(
        "cents", cents(F.col("value"))
    )
    rates = tsdb_ops.counter_rate(ev)
    return tsdb_ops.percentile_downsample(
        rates,
        series_col="event_type",
        ts_col="ts_ms",
        value_col="rate_micros",
        bucket_ms=3_600_000,
        ps=(0.5, 0.99),
    )


# ===========================================================================
# q163 — threshold-breach episodes (gaps-and-islands alerting)
# ===========================================================================

_EPISODE_THR = 10_000  # cents; ~the top decile of the value distribution (p90 ≈ 11k)


@register(
    "q163_threshold_episodes",
    f"""
    WITH c AS (
      SELECT event_type, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
      SELECT event_type, ts_ms, cents,
             cents > {_EPISODE_THR} AS breach,
             row_number() OVER w AS rn,
             SUM(CASE WHEN cents > {_EPISODE_THR} THEN 1 ELSE 0 END)
               OVER w AS rnb
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id)
    )
    SELECT event_type,
           CAST(MIN(ts_ms) AS BIGINT) AS start_ts,
           CAST(MAX(ts_ms) AS BIGINT) AS end_ts,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(cents) AS BIGINT) AS peak
    FROM r WHERE breach GROUP BY event_type, rn - rnb
    """,
)
def q163_threshold_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive above-threshold runs per event type collapsed into
    episode rows (tsdb.threshold_episodes) — the gaps-and-islands
    alerting primitive, done with two SAME-KEYED windows (rank + breach
    cumsum share one series exchange) instead of a self-join."""
    from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
    from hbase_bulkload_service_spark.registry import cents

    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    return tsdb_ops.threshold_episodes(ev, threshold=_EPISODE_THR)


# ===========================================================================
# q165 — SLO compliance over the regularized grid
# ===========================================================================

from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    duck_zoh_grid_ctes,
)


@register(
    "q165_slo_compliance",
    f"""
    WITH {duck_zoh_grid_ctes(900_000)},
    fl AS (
      SELECT event_type, bucket,
             last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING
             ) AS filled
      FROM j
    )
    SELECT event_type,
           CAST((bucket * 900000) // 86400000 AS BIGINT) AS period,
           CAST(COUNT(*) AS BIGINT) AS slots,
           CAST(SUM(CASE WHEN filled <= 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS ok_slots,
           CAST((SUM(CASE WHEN filled <= 10000 THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS compliance_ppm
    FROM fl
    GROUP BY event_type, (bucket * 900000) // 86400000
    """,
)
def q165_slo_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SLO compliance per event type over the 15-minute ZOH grid
    (tsdb.slo_compliance — grid_fill composed into a period aggregate):
    share of slots whose HELD value sits at or under the p90 threshold,
    in integer ppm. Regularizing first is the semantics: silent
    breaching intervals accrue breach time through the held value
    instead of vanishing from a raw-sample ratio."""
    from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
    from hbase_bulkload_service_spark.registry import cents

    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    return tsdb_ops.slo_compliance(
        ev, threshold=10_000, step_ms=900_000, period_ms=86_400_000
    )


# ===========================================================================
# q166 — burst detection over counter rates
# ===========================================================================


@register(
    "q166_rate_bursts",
    """
    WITH c AS (
      SELECT event_type, user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    d AS (
      SELECT event_type, user_id, event_id, ts_ms, cents,
             cents - LAG(cents) OVER w AS raw_delta,
             ts_ms - LAG(ts_ms) OVER w AS dt_ms
      FROM c
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts_ms, event_id)
    ),
    f AS (SELECT * FROM d WHERE dt_ms IS NOT NULL AND dt_ms > 0),
    r AS (
      SELECT event_type, user_id, event_id, ts_ms, cents,
             CAST(CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END
                  AS BIGINT) AS delta,
             dt_ms, raw_delta < 0 AS is_reset,
             CAST((CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END
                   * 1000000000) // dt_ms AS BIGINT) AS rate_micros
      FROM f
    ),
    b AS (
      SELECT *,
             SUM(rate_micros) OVER wb AS base_sum,
             COUNT(rate_micros) OVER wb AS base_n
      FROM r
      WINDOW wb AS (PARTITION BY event_type, user_id
                    ORDER BY ts_ms, event_id
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, user_id, event_id, ts_ms, cents, delta, dt_ms,
           is_reset, rate_micros,
           CAST(base_sum AS BIGINT) AS base_sum,
           CAST(base_n AS BIGINT) AS base_n,
           COALESCE(base_n = 4
                    AND rate_micros * 1 * base_n >= 3 * base_sum,
                    FALSE) AS is_burst
    FROM b
    """,
)
def q166_rate_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike alert per user counter series (tsdb.rate_bursts): a sample
    bursts when its rate is >= 3x the mean of its previous 4 rates —
    compared DIVISION-FREE (rate·n >= 3·Σprev) so the verdict is
    integer-exact with no quotient convention. Completes the alerting
    family (q163 episodes = sustained level, q166 = sudden change).
    ONE keyed exchange end to end: the trailing window shares the rate
    lag window's series keying."""
    from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
    from hbase_bulkload_service_spark.registry import cents

    ev = load_events(spark, sf_dir, spread=True).withColumn(
        "cents", cents(F.col("value"))
    )
    return tsdb_ops.rate_bursts(
        ev, window_n=4, factor_num=3, factor_den=1
    )
