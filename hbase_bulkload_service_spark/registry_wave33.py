"""Registry wave 33 (round 8) — distribution testing, behavior
encoding, entity survivorship, and sparse feature readout:

- exact two-sample Kolmogorov-Smirnov drift per metric family
  (analytics.ks_drift — cross-multiplied integer CDF gaps);
- behavior-set bitmask census (analytics.behavior_bitmask — bit_or /
  bit_count aggregate surface; a user's event-type SET in one BIGINT);
- golden-record survivorship merge across priority-ordered feeds
  (curation.golden_record_merge — chained full-outer joins + coalesce);
- per-vector top-k dimensions via array higher-order functions
  (similarity.top_dims — zero-shuffle in-row ranking);
- strict-ordered N-step funnel (analytics.funnel_path — q92's two-step
  funnel generalized; one carried user_id partitioning).

Same portability rules as registry.py: identical aliases both sides,
integer cents/ppm/micros only, FLOOR before every double->BIGINT cast
(Spark truncates, DuckDB rounds), CAST on every DuckDB SUM/COUNT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation, similarity
from hbase_bulkload_service_spark.registry import cents, register
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q236 — exact two-sample KS drift
# ===========================================================================


@register(
    "q236_ks_drift",
    """
    WITH e AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events
    ),
    pv AS (
      SELECT event_type, v,
             SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY event_type, v
    ),
    c AS (
      SELECT event_type, v,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cb) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM pv
    ),
    t AS (
      SELECT event_type, SUM(ca) AS n_a, SUM(cb) AS n_b
      FROM pv GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(t.n_a AS BIGINT) AS n_a,
           CAST(t.n_b AS BIGINT) AS n_b,
           CAST(MAX(ABS(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT) AS d_num,
           CASE WHEN t.n_a > 0 AND t.n_b > 0
                THEN CAST(MAX(ABS(c.cum_a * t.n_b - c.cum_b * t.n_a))
                          * 1000000 // (t.n_a * t.n_b) AS BIGINT)
           END AS d_ppm
    FROM c JOIN t USING (event_type)
    GROUP BY c.event_type, t.n_a, t.n_b
    """,
)
def q236_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per event type
    between the even- and odd-user cohorts (the A/B drift test a feature
    pipeline runs between a baseline and a candidate window). CDF gaps
    compare in cross-multiplied integer form — no float CDF ever exists —
    and only the final readout divides to truncating ppm
    (analytics.ks_drift). One (key,value) pre-agg, one same-key
    cumulative window (exchange reused), a broadcast totals join, one
    #keys-row max."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("cohort"),
        cents(F.col("value")).alias("v"),
    )
    return analytics.ks_drift(ev, "event_type", "cohort", "v")


# ===========================================================================
# q237 — behavior bitmask census
# ===========================================================================

_TYPE_BITS = {"click": 1, "view": 2, "purchase": 4, "signup": 8, "error": 16}


@register(
    "q237_bitmask_census",
    """
    WITH m AS (
      SELECT user_id,
             bit_or(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'view' THEN 2
                      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                      WHEN 'error' THEN 16 ELSE 0 END) AS mask
      FROM events WHERE event_id % 50 = 0 GROUP BY user_id
    )
    SELECT CAST(mask AS BIGINT) AS mask,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(bit_count(mask) AS BIGINT) AS n_types
    FROM m GROUP BY mask
    """,
)
def q237_bitmask_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-set census: each user's set of observed event types
    OR-ed into one bitmask (click=1, view=2, purchase=4, signup=8,
    error=16), then counted per exact combination with its popcount
    (analytics.behavior_bitmask). The bitmask replaces collect_set's
    variable-length array state with a single associative BIGINT —
    the set-algebra encoding that stays cheap at 100 TB. The every-50th
    slice keeps per-user type sets PARTIAL so the census is non-trivial
    (the full table gives every user all five types)."""
    ev = (
        load_events(spark, sf_dir, spread=True)
        .filter(F.col("event_id") % 50 == 0)
        .select("user_id", "event_type")
    )
    return analytics.behavior_bitmask(ev, "user_id", "event_type", _TYPE_BITS)


# ===========================================================================
# q238 — golden-record survivorship merge
# ===========================================================================


@register(
    "q238_golden_record",
    """
    WITH a AS (
      SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment
      FROM customer WHERE c_custkey % 2 = 0
    ),
    b AS (
      SELECT c_custkey AS k, 'B:' || c_name AS name,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey % 3 = 0
    ),
    c AS (SELECT c_custkey AS k, c_nationkey AS nation FROM customer)
    SELECT c.k AS c_custkey,
           COALESCE(a.name, b.name) AS name,
           a.segment AS segment,
           b.cents AS cents,
           c.nation AS nation
    FROM c LEFT JOIN a ON a.k = c.k LEFT JOIN b ON b.k = c.k
    """,
)
def q238_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship merge: the same customer entity
    arriving from three priority-ordered feeds (feed A: name+segment for
    even keys; feed B: a differently-spelled name + balance for
    every-3rd keys; feed C: nationality for all) is assembled into one
    row per key, each field taken from the highest-trust feed that has
    it (curation.golden_record_merge: chained FULL OUTER joins on the
    key + priority coalesce). The oracle's LEFT JOINs from feed C are
    equivalent because C covers every key — the engine does NOT assume
    that, which is the point of full-outer survivorship."""
    cust = load(spark, sf_dir, "customer", spread=True)
    feed_a = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    feed_b = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("B:"), F.col("c_name")).alias("name"),
        cents(F.col("c_acctbal")).alias("cents"),
    )
    feed_c = cust.select("c_custkey", F.col("c_nationkey").alias("nation"))
    return curation.golden_record_merge(
        "c_custkey",
        [
            (feed_a, ["name", "segment"]),
            (feed_b, ["name", "cents"]),
            (feed_c, ["nation"]),
        ],
    )


# ===========================================================================
# q239 — per-vector top-k dimensions (array higher-order functions)
# ===========================================================================


@register(
    "q239_top_dims",
    """
    WITH x AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS micro,
             generate_subscripts(embedding, 1) - 1 AS idx
      FROM embeddings
    ),
    r AS (
      SELECT vec_id, idx, micro,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY ABS(micro) DESC, idx) AS rnk
      FROM x
    )
    SELECT vec_id, CAST(rnk AS BIGINT) AS rnk,
           CAST(idx AS BIGINT) AS dim_idx, micro
    FROM r WHERE rnk <= 3
    """,
)
def q239_top_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector top-3 dimensions by |magnitude| (deterministic micro
    integers; ties break on dimension index) — the sparse
    feature-attribution readout over the embeddings table. Ranking
    happens INSIDE each row via transform/array_sort/slice
    (similarity.top_dims): zero shuffle, versus the relational
    explode-then-window which would shuffle dims x rows elements."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.top_dims(emb, "vec_id", "embedding", k=3)


# ===========================================================================
# q240 — strict-ordered 3-step funnel
# ===========================================================================

_FUNNEL_WINDOW_MS = 7 * 86_400_000


@register(
    "q240_funnel3",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ),
    s0 AS (
      SELECT user_id, MIN(ts_ms) AS click_ms
      FROM e WHERE event_type = 'click' GROUP BY user_id
    ),
    s1 AS (
      SELECT s0.user_id, s0.click_ms,
             MIN(CASE WHEN e.ts_ms > s0.click_ms THEN e.ts_ms END) AS view_ms
      FROM s0 LEFT JOIN e ON e.user_id = s0.user_id AND e.event_type = 'view'
      GROUP BY s0.user_id, s0.click_ms
    ),
    s2 AS (
      SELECT s1.user_id, s1.click_ms, s1.view_ms,
             MIN(CASE WHEN e.ts_ms > s1.view_ms THEN e.ts_ms END) AS purchase_ms
      FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'purchase'
      GROUP BY s1.user_id, s1.click_ms, s1.view_ms
    )
    SELECT user_id, click_ms, view_ms, purchase_ms,
           CASE WHEN purchase_ms IS NOT NULL
                THEN purchase_ms - click_ms <= {_FUNNEL_WINDOW_MS}
                ELSE FALSE END AS converted
    FROM s2
    """,
)
def q240_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered 3-step funnel (first click -> first view strictly
    after it -> first purchase strictly after that), converted iff the
    chain completes within 7 days of the first click — q92's two-step
    funnel generalized to arbitrary paths (analytics.funnel_path). Every
    join+aggregate keys on user_id, so one partitioning carries through
    all three rounds; each round joins the #users-row frontier against
    only that step's type slice. A broken chain NULL-propagates
    (ts > NULL is NULL) with no special-casing."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "user_id", "event_type", "ts_ms"
    )
    out = analytics.funnel_path(
        ev, "user_id", "event_type", "ts_ms",
        ("click", "view", "purchase"), within_ms=_FUNNEL_WINDOW_MS,
    )
    return out.select(
        "user_id",
        F.col("ts_0").alias("click_ms"),
        F.col("ts_1").alias("view_ms"),
        F.col("ts_2").alias("purchase_ms"),
        "converted",
    )
