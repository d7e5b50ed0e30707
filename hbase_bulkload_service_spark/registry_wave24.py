"""Registry wave 24 (round 6, session 3): continuous + reconciliation
surfaces — the streaming blocklist monitor (q201, availableNow-gated
against q196's batch oracle), the sketch-mode profiler accuracy gate
(q202, the q115 device over q198's melt), the dedup savings report
(q203), and the rollup reconciliation audit (q204, three live
discrepancy classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, quality
from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE
from hbase_bulkload_service_spark.registry import cents, register
from hbase_bulkload_service_spark.registry_wave22 import (
    _BL_LIST,
    _BL_THRESH,
)
from hbase_bulkload_service_spark.registry_wave23 import (
    _PRF_MELT,
    lineitem_canon,
)
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q201 — streaming blocklist monitor (q196's continuous twin)
# ===========================================================================


@register("q201_streaming_blocklist", _ORACLE["q196_blocklist_audit"])
def q201_streaming_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q196 as a LIVE stream
    (streaming/ops.streaming_blocklist_audit): per-document violation
    scores are STATELESS map-side expressions (the blocklist rides the
    plan as literals — nothing broadcasts into the stream), and the
    per-source counters are a bounded-state streaming agg (one row per
    source, runs forever). Finite availableNow replay of the corpus
    must reproduce q196's batch audit bit-for-bit — the q137/q180
    idiom; this query inherits q196's oracle verbatim."""
    import shutil
    import tempfile

    from hbase_bulkload_service_spark.streaming import ops as st

    docs = load(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "source", "text"
    )
    d = tempfile.mkdtemp(prefix="q201bl")
    try:
        docs.repartition(16).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(docs.schema).parquet(d)
        out = st.streaming_blocklist_audit(
            stream, _BL_LIST, flag_threshold=_BL_THRESH
        )
        q = (
            out.writeStream.format("memory")
            .queryName("q201_bl_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        st.await_finite(q, 300)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table("q201_bl_mem").select(
        "source",
        "n_docs",
        "flagged_docs",
        "total_score",
        F.expr("flagged_docs * 1000000 div n_docs").alias("flagged_ppm"),
    )


# ===========================================================================
# q202 — sketch-mode profiler accuracy gate (q115 device over q198's melt)
# ===========================================================================


@register(
    "q202_sketch_profile",
    f"""
    WITH m AS ({_PRF_MELT})
    SELECT col_name,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           TRUE AS hll_within_bound
    FROM m GROUP BY 1
    """,
)
def q202_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-mode table profiler
    (operators/quality.py:column_profile_sketch): HLL++ NDV estimates
    next to the exact counts over the same (col, val) pre-agg, emitting
    a per-column boolean that the sketch landed within 5% — the q115
    device: the oracle computes the exact side and asserts the bound as
    literal TRUE, so a sketch out of contract breaks the hash. At
    100 TB the sketch path skips q198's exact-NDV shuffle entirely;
    this gate is the evidence it may."""
    li = load(spark, sf_dir, "lineitem", spread=True)
    return quality.column_profile_sketch(li, lineitem_canon(li))


# ===========================================================================
# q203 — dedup savings report (prices what q123's verdicts delete)
# ===========================================================================


@register(
    "q203_dedup_savings",
    """
    WITH x AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
             length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS ln
      FROM documents
    ),
    v AS (
      SELECT doc_id, source, ln,
             first_value(doc_id) OVER (
               PARTITION BY h ORDER BY ln DESC, doc_id) AS canonical_id
      FROM x
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_dropped,
           CAST(SUM(CASE WHEN doc_id <> canonical_id THEN ln ELSE 0 END)
                AS BIGINT) AS chars_dropped,
           CAST(SUM(ln) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS drop_ppm
    FROM v GROUP BY 1
    """,
)
def q203_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report (operators/curation.py:dedup_savings): per
    source, the documents and characters exact-dedup would drop
    (non-canonical duplicate-group members, q123's verdicts) and the
    drop ppm — q199's matrix shows WHO copies whom, this prices what
    deleting the copies saves. One md5-keyed window + one thin id join
    + one source rollup."""
    return curation.dedup_savings(
        load(spark, sf_dir, "documents", spread=True)
    )


# ===========================================================================
# q204 — rollup reconciliation audit (backfill validation)
# ===========================================================================

_RC_SLOT = 300_000
_RC_DROP = 97
_RC_CORRUPT = 101
_RC_PHANTOM = 89
_RC_PHANTOM_SLOT = 999_999_999


@register(
    "q204_rollup_reconcile",
    f"""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) // {_RC_SLOT} AS slot,
             SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT user_id, slot,
             CASE WHEN (user_id + slot) % {_RC_CORRUPT} = 0
                  THEN cents + 1 ELSE cents END AS cents
      FROM e WHERE user_id % {_RC_DROP} <> 3
      UNION ALL
      SELECT DISTINCT user_id, {_RC_PHANTOM_SLOT} AS slot,
             CAST(42 AS BIGINT)
      FROM e WHERE user_id % {_RC_PHANTOM} = 7
    ),
    j AS (
      SELECT COALESCE(e.user_id, st.user_id) AS user_id,
             COALESCE(e.slot, st.slot) AS slot,
             e.cents AS ec, st.cents AS sc,
             e.user_id IS NULL AS eno, st.user_id IS NULL AS sno
      FROM e FULL OUTER JOIN st
        ON e.user_id = st.user_id AND e.slot = st.slot
    )
    SELECT user_id, slot,
           CAST(ec AS BIGINT) AS expected_cents,
           CAST(sc AS BIGINT) AS stored_cents,
           CASE WHEN sno THEN 'missing_in_stored'
                WHEN eno THEN 'missing_in_expected'
                ELSE 'value_mismatch' END AS status
    FROM j WHERE eno OR sno OR ec <> sc
    """,
)
def q204_rollup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup reconciliation audit
    (operators/quality.py:reconcile_rollup): the recomputed 5-minute
    per-user rollup full-outer-joined against a stored copy with three
    DETERMINISTIC fault injections (dropped slots, +1-cent corruption,
    phantom slots — the test fixture for the auditor; in deployment
    ``stored`` is the warehouse table), emitting only the
    disagreements, each classified. All three discrepancy classes are
    live at sf0.01. One rollup-grain full-outer exchange; the report
    is discrepancy-sized."""
    from hbase_bulkload_service_spark import cachereg

    ev = load_events(spark, sf_dir, spread=True)
    # expected feeds three consumers (two fault-injection branches + the
    # reconcile join) with different prunings — the q214/q216
    # exchange-reuse class (r07 sweep: events scanned 3x before the
    # persist). Rollup-grain (user x slot), cachereg-bounded.
    expected = (
        ev.groupBy("user_id", F.expr(f"ts_ms div {_RC_SLOT}").alias("slot"))
        .agg(F.sum(cents(F.col("value"))).alias("cents"))
        .persist()
    )
    cachereg.register(expected, family="reconcile")
    stored = (
        expected.filter(F.col("user_id") % _RC_DROP != 3)
        .withColumn(
            "cents",
            F.when(
                (F.col("user_id") + F.col("slot")) % _RC_CORRUPT == 0,
                F.col("cents") + 1,
            ).otherwise(F.col("cents")),
        )
        .unionByName(
            expected.filter(F.col("user_id") % _RC_PHANTOM == 7)
            .select("user_id")
            .distinct()
            .select(
                "user_id",
                F.lit(_RC_PHANTOM_SLOT).cast("long").alias("slot"),
                F.lit(42).cast("long").alias("cents"),
            )
        )
    )
    return quality.reconcile_rollup(
        expected, stored, ["user_id", "slot"], "cents"
    )
