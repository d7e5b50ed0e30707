"""Registry wave 32 (round 8) — source/sink semantics breadth + the
feature-engineering block a training pipeline runs after curation:

- heterogeneous-frame union (``unionByName(allowMissingColumns)``) —
  how a 100 TB corpus accretes columns across independently-evolving
  feeds (file-level mergeSchema is q98's gate; a briefly-registered
  q227 duplicate was retired round 8);
- Spark 4 VARIANT semi-structured access (``parse_json`` /
  ``variant_get``) next to q81's string-path extraction;
- dynamic partition overwrite (the idempotent backfill/correction sink
  contract);
- multi-horizon trailing features, leave-one-out target encoding, and
  exact bivariate moment profiles (operators/analytics.py);
- map-typed feature assembly through Spark's map higher-order functions;
- the LEFT OUTER stream-stream interval join (watermark-gated
  null-padding — the one stream-stream shape q60 doesn't cover).

Same portability rules as registry.py: every aggregate aliased
identically on both sides, integer (cents/ppm) arithmetic only, CAST on
every DuckDB SUM/COUNT (HUGEINT→pandas float drift).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.session import local_frame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics
from hbase_bulkload_service_spark.registry import (
    _scoped_shuffle_partitions,
    cents,
    register,
)
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q228 — unionByName over heterogeneous projections
# ===========================================================================


@register(
    "q228_union_by_name",
    """
    WITH u AS (
      SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
             CAST(NULL AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source, n_chars
      FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source, n_chars
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
           CAST(COUNT(source) AS BIGINT) AS n_with_source
    FROM u GROUP BY lang
    """,
)
def q228_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-frame union: three ingest feeds project DIFFERENT
    column subsets of the documents table (a lang-only feed, a
    source+size feed, a lang+size feed) and are unioned by NAME with
    ``allowMissingColumns=True`` — absent columns null-fill instead of
    positional misalignment (plain ``union`` would silently zip
    mismatched columns; the by-name contract is the only safe one when
    feeds evolve independently).

    The union is a zero-shuffle plan concatenation — each branch keeps
    its own scan partitions; only the final small aggregate shuffles."""
    docs = load(spark, sf_dir, "documents", spread=True)
    a = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "lang")
    b = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id", "source", "n_chars")
    c = docs.filter(F.col("doc_id") % 3 == 2).select("doc_id", "lang", "n_chars")
    u = a.unionByName(b, allowMissingColumns=True).unionByName(
        c, allowMissingColumns=True
    )
    return u.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count("n_chars").alias("n_with_chars"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
        F.count("source").alias("n_with_source"),
    )


# ===========================================================================
# q229 — multi-horizon trailing features
# ===========================================================================

_H_1H, _H_1D, _H_7D = 3_600_000, 86_400_000, 604_800_000


@register(
    "q229_trailing_features",
    f"""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS c
      FROM events
    ),
    r AS (SELECT MAX(ts_ms) AS ref FROM e)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(c) AS BIGINT) AS cents_total,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_1H} THEN 1 ELSE 0 END) AS BIGINT) AS n_1h,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_1H} THEN c ELSE 0 END) AS BIGINT) AS cents_1h,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_1D} THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_1D} THEN c ELSE 0 END) AS BIGINT) AS cents_1d,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_7D} THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
           CAST(SUM(CASE WHEN ts_ms > ref - {_H_7D} THEN c ELSE 0 END) AS BIGINT) AS cents_7d
    FROM e CROSS JOIN r GROUP BY user_id
    """,
)
def q229_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user multi-horizon trailing activity features (events and
    revenue in the last 1h/1d/7d before the corpus reference time) — the
    churn/engagement feature block assembled right before model training.
    One conditional-aggregate pass (analytics.trailing_features): k
    horizons are k expressions inside ONE hash aggregate, the reference
    time is a 1-row broadcast, and the fact stream shuffles once on
    user_id — never k scans, never a window sort."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "user_id", "ts_ms", cents(F.col("value")).alias("c")
    )
    out = analytics.trailing_features(
        ev, "user_id", "ts_ms", "c", (_H_1H, _H_1D, _H_7D)
    )
    return out.select(
        "user_id",
        "n_total",
        F.col("sum_total").alias("cents_total"),
        F.col(f"n_{_H_1H}").alias("n_1h"),
        F.col(f"sum_{_H_1H}").alias("cents_1h"),
        F.col(f"n_{_H_1D}").alias("n_1d"),
        F.col(f"sum_{_H_1D}").alias("cents_1d"),
        F.col(f"n_{_H_7D}").alias("n_7d"),
        F.col(f"sum_{_H_7D}").alias("cents_7d"),
    )


# ===========================================================================
# q230 — leave-one-out target encoding
# ===========================================================================

_LOO_THRESH = 5000  # cents; value > $50 = positive label


@register(
    "q230_loo_target_encoding",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             CASE WHEN CAST(FLOOR(value * 100) AS BIGINT) > {_LOO_THRESH}
                  THEN 1 ELSE 0 END AS t
      FROM events
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n, SUM(t) AS sum_t
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, CAST(e.t AS BIGINT) AS t,
           CASE WHEN s.n > 1
                THEN CAST((s.sum_t - e.t) * 1000000 // (s.n - 1) AS BIGINT)
           END AS loo_ppm
    FROM e JOIN s USING (event_type)
    """,
)
def q230_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe categorical encoding: each event's type is encoded as
    the positive-label rate over every OTHER event of that type
    (``(Σt - t_i)/(n-1)`` as truncating ppm; analytics.loo_target_encoding)
    — plain target encoding leaks the row's own label into its feature
    and corrupts eval. Scale shape: a #categories-row stats aggregate
    broadcast back onto the stream; the fact side is never shuffled."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_id",
        "event_type",
        F.when(cents(F.col("value")) > _LOO_THRESH, 1).otherwise(0).alias("t"),
    )
    return analytics.loo_target_encoding(
        ev, "event_type", "t", id_cols=("event_id",)
    )


# ===========================================================================
# q231 — LEFT OUTER stream-stream interval join
# ===========================================================================

_ATTR_MS = 3600 * 1000


@register(
    "q231_stream_stream_outer",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id % 5 = 0
    )
    SELECT c.event_id AS click_id, c.user_id, c.ts_ms AS click_ms,
           p.ts_ms AS purchase_ms, p.cents AS purchase_cents
    FROM (SELECT * FROM e WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts_ms >= c.ts_ms AND p.ts_ms <= c.ts_ms + {_ATTR_MS}
    """,
)
def q231_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join driven end-to-end: every
    click emits — matched to purchases within the 1-hour window, or
    null-padded once the watermark PROVES no match can still arrive.
    The outer row is watermark-gated state eviction (unlike q60's inner
    join, which emits on arrival), and eviction runs one micro-batch
    after the watermark passes — so the replay pushes a far-future
    sentinel batch through BOTH streams (global watermark = min across
    streams) and the availableNow no-data final batch flushes the
    unmatched state. Exactly the mechanics a production attribution job
    relies on; the finite replay equals the batch LEFT JOIN oracle.

    Scale: state per stream is bounded by rate × (interval + watermark);
    the sentinel trick is test-harness-only — a live stream's watermark
    advances on its own."""
    from hbase_bulkload_service_spark.streaming import ops as st

    ev = (
        load_events(spark, sf_dir, spread=True)
        .filter(F.col("user_id") % 5 == 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts_ms"),
            cents(F.col("value")).alias("cents"),
        )
    )
    # 48h margin: far past every click's (window + watermark) horizon
    # even if the session timezone skews the sentinel's event-time by
    # up to a day when the naive datetime is re-interpreted on write.
    max_ms = ev.agg(F.max("ts_ms")).collect()[0][0]
    sentinel_ms = int(max_ms) + 48 * 3600 * 1000

    def _write_side(df: DataFrame, path: str, sentinel_rows) -> None:
        """Real data as batch file 0, then one sentinel file per batch
        with strictly later mtimes, so maxFilesPerTrigger=1 replays them
        in order. TWO sentinel batches: the first advances the watermark
        past every click's window; eviction (the null-padded emission)
        only runs in a LATER batch (the measured one-batch-late rule),
        and the availableNow no-data final batch does not reliably evict
        outer-join state — so the second sentinel batch is the one that
        flushes the stragglers deterministically."""
        os.makedirs(path, exist_ok=True)
        t0 = time.time() - 3600
        frames = [df] + [
            local_frame(spark, [row], df.schema) for row in sentinel_rows
        ]
        for i, frame in enumerate(frames):
            tmp = f"{path}/_b{i}"
            frame.coalesce(1).write.mode("overwrite").parquet(tmp)
            for fn in os.listdir(tmp):
                if fn.endswith(".parquet"):
                    full = f"{path}/batch_{i}.parquet"
                    os.replace(os.path.join(tmp, fn), full)
                    os.utime(full, (t0 + i * 10, t0 + i * 10))
            shutil.rmtree(tmp, ignore_errors=True)

    d = tempfile.mkdtemp(prefix="q231lo")
    try:
        clicks_b = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.timestamp_millis(F.col("ts_ms")).alias("c_evt"),
            F.col("ts_ms").alias("click_ms"),
        )
        purch_b = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.timestamp_millis(F.col("ts_ms")).alias("p_evt"),
            F.col("ts_ms").alias("purchase_ms"),
            F.col("cents").alias("purchase_cents"),
        )
        import datetime

        def _ts(ms: int) -> datetime.datetime:
            return datetime.datetime.fromtimestamp(
                ms / 1000.0, tz=datetime.timezone.utc
            ).replace(tzinfo=None)

        s1, s2 = sentinel_ms, sentinel_ms + 48 * 3600 * 1000
        _write_side(
            clicks_b, f"{d}/clicks",
            [(-1, -1, _ts(s1), s1), (-1, -1, _ts(s2), s2)],
        )
        _write_side(
            purch_b, f"{d}/purch",
            [(-1, _ts(s1), s1, 0), (-1, _ts(s2), s2, 0)],
        )

        csch = "click_id long, user_id long, c_evt timestamp, click_ms long"
        psch = (
            "user_id long, p_evt timestamp, purchase_ms long, "
            "purchase_cents long"
        )
        clicks = (
            spark.readStream.schema(csch)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/clicks")
        )
        purch = (
            spark.readStream.schema(psch)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/purch")
        )
        joined = st.stream_stream_interval_join(
            clicks, purch, key="user_id", left_ts="c_evt", right_ts="p_evt",
            within_ms=_ATTR_MS, watermark="10 minutes", how="left_outer",
        ).select(
            "click_id", "user_id", "click_ms", "purchase_ms", "purchase_cents"
        )
        # The sentinel filter must NOT ride the streaming plan: a
        # `user_id >= 0` predicate there gets pushed below the watermark
        # assignment, the sentinel rows vanish before they can advance
        # the clicks-side watermark, and the unmatched-click state never
        # evicts (measured: the 3 newest stragglers stay unemitted).
        # Filter the SINK table instead.
        with _scoped_shuffle_partitions(spark, 8):
            q = (
                joined.writeStream.format("memory")
                .queryName("q231_lo_mem")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            st.await_finite(q, 300)
        rows = spark.table("q231_lo_mem").filter(F.col("user_id") >= 0).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_frame(spark,
        rows,
        "click_id long, user_id long, click_ms long, purchase_ms long, "
        "purchase_cents long",
    )


# ===========================================================================
# q232 — exact bivariate moment profile (corr/OLS sufficient stats)
# ===========================================================================


@register(
    "q232_metric_moments",
    """
    WITH e AS (
      SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS x,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sum_x,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM(x * x) AS BIGINT) AS sum_xx,
           CAST(SUM(y * y) AS BIGINT) AS sum_yy,
           CAST(SUM(x * y) AS BIGINT) AS sum_xy
    FROM e GROUP BY event_type
    """,
)
def q232_metric_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bivariate moments (n, Σx, Σy, Σx², Σy², Σxy) of
    (value-cents, props.$.k) per event type — the sufficient statistics
    for Pearson correlation and OLS, shipped as exact integers because
    the float statistic itself is not engine-portable bit-for-bit
    (analytics.moment_profile). Associative moments = one partial-agg
    pass + a #keys-row shuffle; this is how a 1000-node cluster computes
    exact correlation in one pass with no sort."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        cents(F.col("value")).alias("x"),
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("y"),
    )
    return analytics.moment_profile(ev, "event_type", "x", "y")


# ===========================================================================
# q233 — Spark 4 VARIANT semi-structured access
# ===========================================================================


@register(
    "q233_variant_props",
    """
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
               AS k_bucket
      FROM events
    )
    SELECT event_type, k_bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM e GROUP BY event_type, k_bucket
    """,
)
def q233_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: ``parse_json`` turns the props string
    into a VariantType value once, ``variant_get($.k, 'bigint')`` does a
    TYPED extraction, and the decade-bucket histogram aggregates over it.
    Against q81's per-access string path eval, variant parses once into a
    binary-encoded tree that all later accesses share — the 100 TB
    posture for multi-key semi-structured columns (and what an open
    table format would store physically). Extraction + bucketing fuse
    into the scan projection; one #groups-row shuffle."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    return (
        ev.select(
            "event_type",
            # `div`: exact BIGINT bucketing straight off the typed extract
            F.expr("variant_get(v, '$.k', 'bigint') div 10").alias("k_bucket"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# q234 — dynamic partition overwrite (idempotent backfill)
# ===========================================================================


@register(
    "q234_partition_overwrite",
    """
    WITH s AS (
      SELECT epoch_ms(ts) // 86400000 AS day_num,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id % 13 = 0
    ),
    m AS (SELECT MIN(day_num) AS tgt FROM s)
    SELECT CAST(day_num AS BIGINT) AS day_num,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN day_num = tgt THEN cents * 2
                         ELSE cents END) AS BIGINT) AS sum_cents
    FROM s CROSS JOIN m GROUP BY day_num
    """,
)
def q234_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill sink
    contract: a day-partitioned table gets ONE day's data rewritten
    (here: a correction doubling that day's cents) by a second
    ``mode("overwrite")`` write under
    ``partitionOverwriteMode=dynamic``, which replaces exactly the
    partitions present in the incoming frame and leaves every other day
    untouched (static mode would truncate the whole table — the classic
    backfill footgun). Read-back aggregates prove the merge: target day
    doubled, all others intact.

    At 100 TB this is THE correction primitive: rewriting one day is
    1/365th of the table, and the overwrite is atomic per partition
    directory. The conf is set scoped to the write and restored."""
    sub = (
        load_events(spark, sf_dir, spread=True)
        .filter(F.col("user_id") % 13 == 0)
        .select(
            (F.col("ts_ms") / F.lit(86_400_000)).cast("long").alias("day_num"),
            cents(F.col("value")).alias("cents"),
        )
    )
    d = tempfile.mkdtemp(prefix="q234dpo")
    try:
        sub.coalesce(4).write.mode("overwrite").partitionBy("day_num").parquet(
            f"{d}/tbl"
        )
        tgt = sub.agg(F.min("day_num")).collect()[0][0]
        correction = sub.filter(F.col("day_num") == tgt).withColumn(
            "cents", F.col("cents") * 2
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            correction.coalesce(1).write.mode("overwrite").partitionBy(
                "day_num"
            ).parquet(f"{d}/tbl")
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        back = spark.read.parquet(f"{d}/tbl")
        out = back.groupBy(F.col("day_num").cast("long").alias("day_num")).agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_frame(spark, rows, "day_num long, n_rows long, sum_cents long")


# ===========================================================================
# q235 — map-typed feature assembly (map higher-order functions)
# ===========================================================================

_SHARE_MIN_PPM = 200_000  # keep event types holding >= 20% of a decile


@register(
    "q235_map_assembly",
    f"""
    WITH c AS (
      SELECT user_id % 10 AS decile, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id % 10, event_type
    ),
    t AS (SELECT decile, SUM(n) AS tot FROM c GROUP BY decile)
    SELECT c.decile, c.event_type,
           CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm
    FROM c JOIN t USING (decile)
    WHERE c.n * 1000000 // t.tot >= {_SHARE_MIN_PPM}
    """,
)
def q235_map_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed feature assembly: per user decile, the event-type
    frequency MAP is built with ``map_from_entries(collect_list(...))``,
    normalized to ppm shares with ``transform_values`` (total via
    ``aggregate(map_values(...))``), thresholded with ``map_filter``,
    and exploded back to rows only for the cross-engine hash — the map
    stays the working representation, as it would feeding a feature
    store. Two keyed aggregates ((decile,type) then decile); every map
    op is a JVM-side higher-order function, no UDF."""
    counts = (
        load_events(spark, sf_dir, spread=True)
        .select((F.col("user_id") % 10).alias("decile"), "event_type")
        .groupBy("decile", "event_type")
        .agg(F.count("*").alias("n"))
    )
    maps = counts.groupBy("decile").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    with_tot = maps.withColumn(
        "tot",
        F.aggregate(F.map_values("m"), F.lit(0).cast("long"), lambda a, v: a + v),
    )
    # SQL-text lambdas so the ppm share uses exact `div`, matching the
    # oracle's integer floor division bit-for-bit (float `/` would drift).
    shares = with_tot.select(
        "decile",
        F.expr(
            "map_filter("
            "  transform_values(m, (k, v) -> v * 1000000 div tot),"
            f" (k, v) -> v >= {_SHARE_MIN_PPM})"
        ).alias("m"),
    )
    return shares.select(
        "decile", F.explode("m").alias("event_type", "share_ppm")
    ).select(
        "decile", "event_type", F.col("share_ppm").cast("long").alias("share_ppm")
    )
