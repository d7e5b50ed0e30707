"""Registry wave 14 (q151+) — counter-rate semantics, multi-series
expressions, dashboard cardinality caps, and dataset-release curation:

- q151 monotonic-counter rate with reset detection (the OpenTSDB
  RateOptions{counter=true} read path — reference domain: the tsdb
  rate queries the bulkloaded counters feed);
- q152 aligned two-series ratio on a shared zero-order-hold grid (the
  OpenTSDB expression / Graphite divideSeries surface);
- q153 top-N contributors per group with the long tail folded into a
  single ``__other__`` row (dashboard cardinality cap);
- q154 deterministic exact-quota train/val/test split (largest-
  remainder apportionment per stratum over an md5 draw);
- q155 source-level reputation: per-source duplication rate against the
  whole corpus, with a mirror source derived in BOTH engines so the
  dup branch is actually exercised (the q140 derived-snapshot idiom).

Same portability rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation
from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
from hbase_bulkload_service_spark.oracle_frags import duck_zoh_grid_ctes
from hbase_bulkload_service_spark.registry import cents, register
from hbase_bulkload_service_spark.sources.tables import load, load_events

_CENTS = "CAST(FLOOR(value * 100) AS BIGINT)"


# ===========================================================================
# q151 — counter rate with reset detection
# ===========================================================================


@register(
    "q151_counter_rate",
    f"""
    WITH c AS (
      SELECT event_type, user_id, event_id, epoch_ms(ts) AS ts_ms,
             {_CENTS} AS cents
      FROM events
    ),
    d AS (
      SELECT event_type, user_id, event_id, ts_ms, cents,
             cents - LAG(cents) OVER w AS raw_delta,
             ts_ms - LAG(ts_ms) OVER w AS dt_ms
      FROM c
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts_ms, event_id)
    ),
    f AS (SELECT * FROM d WHERE dt_ms IS NOT NULL AND dt_ms > 0)
    SELECT event_type, user_id, event_id, ts_ms, cents,
           CAST(CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END
                AS BIGINT) AS delta,
           dt_ms,
           raw_delta < 0 AS is_reset,
           CAST((CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END
                 * 1000000000) // dt_ms AS BIGINT) AS rate_micros
    FROM f
    """,
)
def q151_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series counter rate (tsdb.counter_rate): negative consecutive
    deltas are restarts — the post-reset value is the increase since the
    rebase (OpenTSDB counter semantics). The gate's per-user cents
    series resets constantly, exercising both branches on every series.
    ONE keyed exchange; rate is integer micros/sec (delta·1e9 div dt)."""
    ev = load_events(spark, sf_dir, spread=True).withColumn(
        "cents", cents(F.col("value"))
    )
    return tsdb_ops.counter_rate(ev)


# ===========================================================================
# q152 — aligned two-series ratio on a shared ZOH grid
# ===========================================================================


@register(
    "q152_aligned_ratio",
    f"""
    WITH {duck_zoh_grid_ctes(900_000, "AND event_type IN ('click', 'view')")},
    fl AS (
      SELECT event_type, bucket,
             last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING
             ) AS filled,
             cents IS NOT NULL AS is_observed
      FROM j
    ),
    p AS (
      SELECT bucket,
             MAX(CASE WHEN event_type = 'click' THEN filled END) AS a_val,
             MAX(CASE WHEN event_type = 'view' THEN filled END) AS b_val,
             MAX(CASE WHEN event_type = 'click' THEN is_observed END)
               AS a_observed,
             MAX(CASE WHEN event_type = 'view' THEN is_observed END)
               AS b_observed
      FROM fl GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(a_val AS BIGINT) AS a_val, CAST(b_val AS BIGINT) AS b_val,
           a_observed, b_observed,
           CASE WHEN b_val <> 0
                THEN CAST((a_val * 1000000) // b_val AS BIGINT) END
             AS ratio_ppm
    FROM p
    WHERE a_val IS NOT NULL AND b_val IS NOT NULL
    """,
)
def q152_aligned_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click/view ratio per 15-minute slot on the shared zero-order-hold
    grid (tsdb.align_series_ratio): both series ride ONE grid_fill
    subtree and a conditional-aggregate pivot separates them without a
    self-join. Integer ppm ratio; NULL (not an error) where the
    denominator holds at zero."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    return tsdb_ops.align_series_ratio(
        ev, series_a="click", series_b="view", step_ms=900_000
    )


# ===========================================================================
# q153 — top-N + __other__ fold
# ===========================================================================


@register(
    "q153_topn_other",
    f"""
    WITH c AS (
      SELECT event_type, CAST(user_id % 100 AS VARCHAR) AS item,
             {_CENTS} AS cents
      FROM events
    ),
    a AS (
      SELECT event_type, item, SUM(cents) AS total, COUNT(*) AS n_rows
      FROM c GROUP BY event_type, item
    ),
    r AS (
      SELECT event_type, item, total, n_rows,
             row_number() OVER (
               PARTITION BY event_type ORDER BY total DESC, item ASC
             ) AS rank
      FROM a
    )
    SELECT event_type, item, CAST(total AS BIGINT) AS total,
           CAST(n_rows AS BIGINT) AS n_rows, CAST(rank AS BIGINT) AS rank,
           FALSE AS is_other
    FROM r WHERE rank <= 10
    UNION ALL
    SELECT event_type, '__other__' AS item,
           CAST(SUM(total) AS BIGINT) AS total,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(11 AS BIGINT) AS rank, TRUE AS is_other
    FROM r WHERE rank > 10 GROUP BY event_type
    """,
)
def q153_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 user buckets by spend per event type, tail folded into one
    ``__other__`` row (analytics.topn_other) — output is at most 11 rows
    per group regardless of item cardinality; the corpus collapses at
    the first map-side-combined hash aggregate."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        (F.col("user_id") % 100).cast("string").alias("item"),
        cents(F.col("value")).alias("cents"),
    )
    out = analytics.topn_other(
        ev, group_col="event_type", item_col="item", value_col="cents", n=10
    )
    return out.select(
        "event_type",
        "item",
        "total",
        "n_rows",
        F.col("rank").cast("long").alias("rank"),
        "is_other",
    )


# ===========================================================================
# q154 — deterministic exact-quota dataset split
# ===========================================================================

_SPLITS = {"train": 800_000, "valid": 100_000, "test": 100_000}
_SPLIT_SEED = 7


@register(
    "q154_dataset_split",
    f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    splits(idx, split, w) AS (VALUES
      (0, 'train', 800000), (1, 'valid', 100000), (2, 'test', 100000)),
    alloc AS (
      SELECT lang, n, idx, split,
             (n * w) // 1000000 AS fl, (n * w) % 1000000 AS rem
      FROM counts CROSS JOIN splits
    ),
    a2 AS (
      SELECT *,
             n - SUM(fl) OVER (PARTITION BY lang) AS leftover,
             row_number() OVER (
               PARTITION BY lang ORDER BY rem DESC, idx ASC) AS rr
      FROM alloc
    ),
    q AS (
      SELECT lang, idx, split,
             fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS quota
      FROM a2
    ),
    t AS (
      SELECT lang, split,
             SUM(quota) OVER (PARTITION BY lang ORDER BY idx
                              ROWS UNBOUNDED PRECEDING) AS hi,
             SUM(quota) OVER (PARTITION BY lang ORDER BY idx
                              ROWS UNBOUNDED PRECEDING) - quota AS lo
      FROM q
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)),
                        doc_id
             ) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang, t.split
    FROM r JOIN t
      ON r.lang IS NOT DISTINCT FROM t.lang
     AND r.rk > t.lo AND r.rk <= t.hi
    """,
)
def q154_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split per language with EXACT largest-remainder quotas
    (curation.dataset_split): every row assigned, split sizes exact to
    the row, stable across runs/retries/partitionings. One stratum-keyed
    exchange; the quota table is broadcast."""
    docs = load(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang"
    )
    return curation.dataset_split(
        docs, _SPLITS, strata_col="lang", key_col="doc_id", seed=_SPLIT_SEED
    )


# ===========================================================================
# q155 — source reputation (mirror-source dup rate)
# ===========================================================================


@register(
    "q155_source_reputation",
    """
    WITH corpus AS (
      SELECT source, text, n_chars FROM documents
      UNION ALL
      SELECT 'mirror_src' AS source, text, n_chars
      FROM documents WHERE doc_id % 4 = 0
    ),
    d AS (
      SELECT source, md5(COALESCE(text, '')) AS dg,
             COALESCE(n_chars, 0) AS ch
      FROM corpus
    ),
    sd AS (
      SELECT source, dg, COUNT(*) AS cnt, SUM(ch) AS chr
      FROM d GROUP BY source, dg
    ),
    g AS (SELECT dg, SUM(cnt) AS gcnt FROM sd GROUP BY dg),
    s AS (
      SELECT source,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN gcnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             CAST(SUM(chr) AS BIGINT) AS total_chars
      FROM sd JOIN g USING (dg) GROUP BY source
    )
    SELECT source, n_docs, n_dup_docs, total_chars,
           CAST((n_dup_docs * 1000000) // n_docs AS BIGINT) AS dup_ppm,
           (n_dup_docs * 1000000) // n_docs > 500000 AS flagged
    FROM s
    """,
)
def q155_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication rate against the whole corpus
    (curation.source_reputation) — the RefinedWeb-style domain trust
    gate. The fixture derives a ``mirror_src`` (every 4th doc re-sourced)
    in BOTH engines, so the mirror flags at 1e6 ppm while originals sit
    at 250k ppm under the 500k threshold — both verdict branches are
    live in the gate. Raw text never shuffles (map-side md5)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    corpus = docs.select("source", "text", "n_chars").unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            F.lit("mirror_src").alias("source"), "text", "n_chars"
        )
    )
    return curation.source_reputation(corpus, dup_threshold_ppm=500_000)


# ===========================================================================
# q156 — streaming counter rate (q151's continuous twin)
# ===========================================================================

from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE  # noqa: E402


@register("q156_streaming_counter_rate", _ORACLE["q151_counter_rate"])
def q156_streaming_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q151 as a LIVE stream (streaming/ops.streaming_counter_rate):
    the per-series carried sample lives in applyInPandasWithState
    state — O(1) per series, watermark-free — and the reset/rebase/rate
    arithmetic is the same stateless layer as batch. Finite availableNow
    replay of the corpus must reproduce q151's oracle bit-for-bit, so
    the streaming path inherits the batch gate (the q137 idiom)."""
    import shutil
    import tempfile

    from hbase_bulkload_service_spark.streaming import ops as st

    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "user_id",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("cents"),
    )
    d = tempfile.mkdtemp(prefix="q156rate")
    try:
        # repartition(16), NOT coalesce(4): coalesce clamps the whole
        # event derivation AND the parquet encode into 4 tasks (the r05
        # stage-audit flag — 4-task 1.6 s stages), and the 4-file layout
        # then caps the micro-batch file-scan parallelism too; a
        # numbered exchange keeps the derive at full width and 16 replay
        # files keep both the encode and the stream scan spread
        ev.repartition(16).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(ev.schema).parquet(d)
        out = st.streaming_counter_rate(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("q156_rate_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        st.await_finite(q, 300)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table("q156_rate_mem")
