"""Registry wave 12 (q135+) — robust statistics + streaming quality:

- q135 winsorized (clipped-tail) per-group statistics — the robust-mean
  preprocessing step, PERCENTILE_DISC cut points, integer-exact;
- q136 exact per-group mode (most frequent value, deterministic ties);
- q137 streaming data-quality monitor — the continuous twin of q130's
  expectations audit (row-check layer), finite-replay verified against
  the same first-principles counts.

Same portability rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics
from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load, load_events


# ===========================================================================
# q135 — winsorized per-group statistics
# ===========================================================================


@register(
    "q135_winsorized_stats",
    """
    WITH e AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events
      WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    c AS (
      SELECT event_type, v, n,
             MAX(CASE WHEN rn <= CAST(ceil(0.05 * n) AS INT) THEN v END)
               OVER (PARTITION BY event_type) AS lo,
             MAX(CASE WHEN rn <= CAST(ceil(0.95 * n) AS INT) THEN v END)
               OVER (PARTITION BY event_type) AS hi
      FROM r
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(lo) AS BIGINT) AS lo,
           CAST(MAX(hi) AS BIGINT) AS hi,
           CAST(SUM(LEAST(GREATEST(v, lo), hi)) AS BIGINT) AS win_sum,
           CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi
    FROM c GROUP BY event_type
    """,
)
def q135_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type value statistics: clamp the integer-cents
    value at the exact p05/p95 PERCENTILE_DISC cut points and aggregate
    the clipped sum + clip counts — the outlier-proof mean. ONE keyed
    exchange (rank/count/cut windows + the final agg all share the
    event_type partitioning)."""
    e = load_events(spark, sf_dir, spread=True).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("v")
    )
    return analytics.winsorized_stats(e, "event_type", "v", 0.05, 0.95)


# ===========================================================================
# q136 — exact per-group mode
# ===========================================================================


@register(
    "q136_group_mode",
    """
    WITH e AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events
      WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type, v, COUNT(*) AS cnt FROM e GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, v, cnt,
             row_number() OVER (
               PARTITION BY event_type ORDER BY cnt DESC, v ASC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM c
    )
    SELECT event_type,
           CAST(v AS BIGINT) AS mode_value,
           CAST(cnt AS BIGINT) AS mode_count,
           CAST(nd AS BIGINT) AS n_distinct
    FROM r WHERE rn = 1
    """,
)
def q136_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent cents value per event type (ties to the smallest
    value — deterministic cross-engine). The window runs over the
    DISTINCT-PAIR table, not the raw rows: the map-side combiner does
    the heavy lifting, the exchange carries (type, value) cardinality."""
    e = load_events(spark, sf_dir, spread=True).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("v")
    )
    return analytics.group_mode(e, "event_type", "v")


# ===========================================================================
# q137 — streaming data-quality monitor (q130's continuous twin)
# ===========================================================================


@register(
    "q137_streaming_expectations",
    """
    WITH u AS (
    SELECT 'orders_key_not_null' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderkey IS NOT NULL, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'),
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_priority_urgent',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderpriority = '1-URGENT',
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    )
    SELECT expectation, n_checked, n_failed, n_failed = 0 AS ok FROM u
    """,
)
def q137_streaming_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q130's row-check suite run as a STREAM over the orders table
    (finite availableNow replay): per-micro-batch failure counters fold
    into running per-expectation totals whose final snapshot must equal
    the batch audit bit-for-bit. Bounded state: one counter row per
    expectation."""
    from hbase_bulkload_service_spark.streaming import ops as st

    schema = load(spark, sf_dir, "orders").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    from hbase_bulkload_service_spark.registry_wave10 import (
        _orders_row_checks,
    )

    audited = st.streaming_expectations(stream, _orders_row_checks())
    q = (
        audited.writeStream.format("memory")
        .queryName("q137_expect_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    st.await_finite(q, 300)
    return spark.table("q137_expect_mem")


# ===========================================================================
# q138 — time-weighted average downsample (zero-order hold)
# ===========================================================================


@register(
    "q138_time_weighted_avg",
    """
    WITH e AS (
      SELECT event_type, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type, event_id, ts_ms, cents,
             ts_ms // 3600000 AS bucket
      FROM e
    ),
    h AS (
      SELECT event_type, bucket, cents, ts_ms,
             COALESCE(
               lead(ts_ms) OVER (
                 PARTITION BY event_type, bucket ORDER BY ts_ms, event_id
               ),
               (bucket + 1) * 3600000
             ) - ts_ms AS hold_ms
      FROM b
    )
    SELECT event_type,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents * hold_ms) AS BIGINT) AS num,
           CAST((MAX(bucket) + 1) * 3600000 - MIN(ts_ms) AS BIGINT)
             AS span_ms,
           CAST(SUM(cents * hold_ms)
                // ((MAX(bucket) + 1) * 3600000 - MIN(ts_ms)) AS BIGINT)
             AS twa
    FROM h GROUP BY event_type, bucket
    """,
)
def q138_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly zero-order-hold time-weighted average of the event value
    per event type — the downsample that is robust to irregular sample
    spacing (OpenTSDB downsampler family). ONE keyed exchange: the
    hold-time lead() window and the final agg share the
    (event_type, bucket) partitioning; integer-exact throughout."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return tsdb_ops.time_weighted_avg(
        ev, series_col="event_type", ts_col="ts_ms",
        value_col="cents", id_col="event_id", bucket_ms=3_600_000,
    )


# ===========================================================================
# q139 — end-to-end corpus build: funnel -> stratified cap -> manifest
# ===========================================================================

from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE

_CAP139 = 40
_SEED139 = 11


@register(
    "q139_corpus_build_e2e",
    f"""
    WITH funnel AS ({_ORACLE["q45_corpus_curation"]}),
    kept AS (
      SELECT f.doc_id, f.n_tokens, d.lang
      FROM funnel f JOIN documents d USING (doc_id)
      WHERE f.verdict = 'kept'
    ),
    kc AS (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang),
    r AS (
      SELECT doc_id, lang, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('{_SEED139}:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM kept
    ),
    s AS (SELECT * FROM r WHERE rk <= {_CAP139})
    SELECT s.lang,
           CAST(MAX(kc.n_kept) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(s.n_tokens) AS BIGINT) AS sampled_tokens,
           md5(string_agg(CAST(s.doc_id AS VARCHAR), ','
               ORDER BY s.doc_id)) AS manifest_md5
    FROM s JOIN kc ON kc.lang = s.lang
    GROUP BY s.lang
    """,
)
def q139_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-corpus build verified as ONE hash: q45's
    curation funnel (lang -> quality -> exact dedup -> LSH near-dedup)
    feeds the exact k-per-stratum sampler (q133's operator, cap {_CAP139}
    per source-language label), and each stratum emits its kept count,
    sampled count, sampled token total, and an md5 MANIFEST of the
    sorted sampled doc_ids — so the oracle match proves the composed
    pipeline selects the IDENTICAL document set end-to-end, not merely
    matching aggregates per stage. This is the gate a user of the
    composed engine actually cares about: operators verified in
    isolation can still disagree after composition (column drift, NULL
    leaks, order assumptions); this row pins the composition."""
    from hbase_bulkload_service_spark.operators import curation

    docs = load(spark, sf_dir, "documents", spread=True)
    led = curation.curate_corpus(docs)
    kept = (
        led.filter(F.col("verdict") == "kept")
        .select("doc_id", "n_tokens")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    samp = curation.capped_stratum_sample(
        kept, cap=_CAP139, strata_col="lang", key_col="doc_id",
        seed=_SEED139,
    )
    kc = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        samp.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_tokens").cast("long").alias("sampled_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col("doc_id"))),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("manifest_md5"),
        )
        .join(kc, "lang")
        .select(
            "lang",
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("n_sampled").cast("long").alias("n_sampled"),
            "sampled_tokens",
            "manifest_md5",
        )
    )


# ===========================================================================
# q140 — dataset snapshot diff (corpus versioning)
# ===========================================================================

_NT140 = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "q140_snapshot_diff",
    f"""
    WITH base AS (SELECT doc_id, text FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM base WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 1000000, text || ' new'
      FROM base WHERE doc_id % 13 = 0
    ),
    od AS (
      SELECT doc_id AS key, md5(COALESCE({_NT140}, '')) AS old_md5 FROM base
    ),
    nd AS (
      SELECT doc_id AS key, md5(COALESCE({_NT140}, '')) AS new_md5 FROM v2
    ),
    j AS (
      SELECT COALESCE(od.key, nd.key) AS key, old_md5, new_md5
      FROM od FULL OUTER JOIN nd ON od.key = nd.key
    ),
    c AS (
      SELECT key,
             CASE WHEN old_md5 IS NULL THEN 'added'
                  WHEN new_md5 IS NULL THEN 'removed'
                  WHEN old_md5 <> new_md5 THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM j
    )
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n,
           md5(string_agg(CAST(key AS VARCHAR), ',' ORDER BY key))
             AS manifest_md5
    FROM c GROUP BY change
    """,
)
def q140_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release diff: a deterministic v2 snapshot (every 11th doc
    removed, every 7th survivor edited, every 13th doc re-added under a
    new id) is diffed against v1 with curation.snapshot_diff — per
    change class the row count AND an md5 manifest of the sorted keys,
    so the hash match proves the exact membership of added / removed /
    changed / unchanged, not just their sizes. One keyed full-outer
    join of (key, md5) digests — raw text never shuffles."""
    from hbase_bulkload_service_spark.operators import curation

    base = load(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    v2 = base.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        base.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" new")).alias("text"),
        )
    )
    d = curation.snapshot_diff(base, v2, key_col="doc_id", text_col="text")
    return d.groupBy("change").agg(
        F.count("*").cast("long").alias("n"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("key"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("manifest_md5"),
    )
