"""Wave-23 operators: column profile, dup source matrix, audio trim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import dedup, multimodal, quality


# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------


def test_column_profile_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "b"), (3, None)],
        "k int, s string",
    )
    out = {r.col_name: r for r in quality.column_profile(
        df, {"k": F.col("k"), "s": F.col("s")}).collect()}
    k, s = out["k"], out["s"]
    assert k.n_rows == 4 and k.n_nulls == 1 and k.n_distinct == 3
    assert k.min_val == "1" and k.max_val == "3"
    assert k.null_ppm == 250_000
    assert s.n_distinct == 2 and s.min_val == "a" and s.max_val == "b"


def test_column_profile_canonicalizes_through_caller_exprs(spark):
    # doubles profiled as floor-cents: 1.005 and 1.009 collapse to one
    # distinct canonical value
    df = spark.createDataFrame([(1.005,), (1.009,), (2.5,)], "v double")
    out = {r.col_name: r for r in quality.column_profile(
        df, {"v": F.floor(F.col("v") * 100).cast("long")}).collect()}
    assert out["v"].n_distinct == 2
    assert out["v"].min_val == "100" and out["v"].max_val == "250"
    with pytest.raises(ValueError):
        quality.column_profile(df, {})


def test_column_profile_prebuckets_ndv_shuffle(spark):
    # the exact-NDV exchange must be keyed on (col, val) — two hash
    # aggregates, no expensive distinct expansion
    df = spark.createDataFrame([(i % 3,) for i in range(30)], "k int")
    plan = (
        quality.column_profile(df, {"k": F.col("k")})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Expand" not in plan  # not the count-distinct Expand rewrite


# ---------------------------------------------------------------------------
# dup_source_matrix
# ---------------------------------------------------------------------------


def test_dup_matrix_counts_unordered_source_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [
        (1, "crawlA", base),
        (2, "crawlB", base + "tail"),   # near-dup of 1, cross-source
        (3, "crawlB", "totally different words only here " * 8),
        (4, "crawlA", base + "tail2"),  # near-dup of 1/2
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.source_a, r.source_b): r.n_pairs
           for r in dedup.dup_source_matrix(df).collect()}
    # pairs: (1,2) A-B, (1,4) A-A, (2,4) A-B -> matrix
    assert out[("crawlA", "crawlB")] == 2
    assert out[("crawlA", "crawlA")] == 1
    assert ("crawlB", "crawlB") not in out


# ---------------------------------------------------------------------------
# audio_trim_plan
# ---------------------------------------------------------------------------


def _media(spark, rows):
    # rows: (doc_id, payload bytes) — media_type forced to audio
    return spark.createDataFrame(
        [(d, "audio", bytearray(p)) for d, p in rows],
        "doc_id long, media_type string, payload binary",
    )


def test_audio_trim_trims_leading_and_trailing_silence(spark):
    # frame size 4: [silence, loud, loud, silence] -> lead 1, tail 1
    quiet, loud = bytes([10] * 4), bytes([200] * 4)
    m = _media(spark, [(1, quiet + loud + loud + quiet)])
    r = multimodal.audio_trim_plan(m, frame_bytes=4, threshold=100).collect()[0]
    assert r.n_frames == 4
    assert r.lead_trim == 1 and r.tail_trim == 1 and r.kept_frames == 2
    assert r.max_energy == 200


def test_audio_trim_all_silent_and_all_active(spark):
    quiet, loud = bytes([5] * 4), bytes([150] * 4)
    m = _media(spark, [(1, quiet * 3), (2, loud * 2)])
    out = {r.doc_id: r for r in multimodal.audio_trim_plan(
        m, frame_bytes=4, threshold=100).collect()}
    assert out[1].kept_frames == 0
    assert out[1].lead_trim == 3 and out[1].tail_trim == 0
    assert out[2].kept_frames == 2
    assert out[2].lead_trim == 0 and out[2].tail_trim == 0


def test_audio_trim_ignores_non_audio(spark):
    m = spark.createDataFrame(
        [(1, "video", bytearray(bytes([200] * 8)))],
        "doc_id long, media_type string, payload binary",
    )
    assert multimodal.audio_trim_plan(m, frame_bytes=4).collect() == []
