"""Wave-24 operators: streaming blocklist, sketch profile, dedup
savings, rollup reconciliation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, quality, textops
from hbase_bulkload_service_spark.streaming import ops as st


# ---------------------------------------------------------------------------
# streaming_blocklist_audit
# ---------------------------------------------------------------------------


def test_streaming_blocklist_replay_matches_batch(spark):
    rows = [
        (0, "a", "bad bad words"),
        (1, "a", "clean text"),
        (2, "b", "bad thing"),
        (3, "b", "nothing here"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    batch = {
        r.source: (r.n_docs, r.flagged_docs, r.total_score)
        for r in textops.blocklist_audit(
            docs, {"bad": 2}, flag_threshold=4
        ).collect()
    }
    d = tempfile.mkdtemp(prefix="w24bl")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(docs.schema).parquet(d)
        out = st.streaming_blocklist_audit(stream, {"bad": 2}, flag_threshold=4)
        q = (
            out.writeStream.format("memory")
            .queryName("w24_bl_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        st.await_finite(q, 120)
        got = {
            r.source: (r.n_docs, r.flagged_docs, r.total_score)
            for r in spark.table("w24_bl_mem").collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == batch
    assert got["a"] == (2, 1, 4)  # 2*2 from doc 0 flags at threshold 4


def test_streaming_blocklist_guards(spark):
    stream = spark.readStream.format("rate").load().selectExpr(
        "'s' AS source", "'t' AS text"
    )
    with pytest.raises(ValueError):
        st.streaming_blocklist_audit(stream, {})
    with pytest.raises(ValueError):
        st.streaming_blocklist_audit(stream, {"x": -1})


# ---------------------------------------------------------------------------
# column_profile_sketch
# ---------------------------------------------------------------------------


def test_sketch_profile_exact_count_and_bound(spark):
    df = spark.createDataFrame(
        [(i % 7, f"s{i % 3}") for i in range(100)], "k int, s string"
    )
    out = {r.col_name: r for r in quality.column_profile_sketch(
        df, {"k": F.col("k"), "s": F.col("s")}).collect()}
    assert out["k"].n_distinct == 7 and out["s"].n_distinct == 3
    # tiny cardinalities: HLL++ is exact via the sparse register path
    assert out["k"].hll_within_bound and out["s"].hll_within_bound
    with pytest.raises(ValueError):
        quality.column_profile_sketch(df, {})


# ---------------------------------------------------------------------------
# dedup_savings
# ---------------------------------------------------------------------------


def test_dedup_savings_prices_non_canonical_members(spark):
    rows = [
        (1, "a", "same text"),
        (2, "a", "same  text"),   # normalizes equal -> dup of 1 (same len)
        (3, "b", "same text"),    # dup group member from b
        (4, "b", "unique thing"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r.source: r for r in curation.dedup_savings(docs).collect()}
    # canonical = lowest id at equal length -> doc 1; drops are 2 and 3
    assert out["a"].n_docs == 2 and out["a"].docs_dropped == 1
    assert out["b"].n_docs == 2 and out["b"].docs_dropped == 1
    assert out["a"].chars_dropped == len("same text")
    assert out["a"].drop_ppm == 500_000
    assert out["b"].chars_total == len("same text") + len("unique thing")


# ---------------------------------------------------------------------------
# reconcile_rollup
# ---------------------------------------------------------------------------


def _roll(spark, rows):
    return spark.createDataFrame(rows, "k long, slot long, cents long")


def test_reconcile_classifies_all_three_discrepancies(spark):
    expected = _roll(spark, [(1, 10, 100), (1, 11, 200), (2, 10, 300)])
    stored = _roll(spark, [(1, 10, 101), (2, 10, 300), (9, 99, 5)])
    out = {(r.k, r.slot): r for r in quality.reconcile_rollup(
        expected, stored, ["k", "slot"], "cents").collect()}
    assert out[(1, 10)].status == "value_mismatch"
    assert out[(1, 10)].expected_cents == 100
    assert out[(1, 10)].stored_cents == 101
    assert out[(1, 11)].status == "missing_in_stored"
    assert out[(9, 99)].status == "missing_in_expected"
    assert (2, 10) not in out  # agreement is silent


def test_reconcile_empty_on_full_agreement(spark):
    a = _roll(spark, [(1, 10, 100), (2, 11, 200)])
    assert quality.reconcile_rollup(a, a, ["k", "slot"], "cents").collect() == []
    with pytest.raises(ValueError):
        quality.reconcile_rollup(a, a, [], "cents")
