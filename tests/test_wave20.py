"""Wave-20 operators: vocab coverage, integer EWMA chart, scene shots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, multimodal, textops


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_coverage_counts_oov_against_top_v(spark):
    rows = [
        (1, "common common common rare1"),
        (2, "common other other rare2"),
        (3, "common other"),
    ]
    # V=2 -> vocab = {common(5), other(3)}; rare1/rare2 are OOV
    out = {r.doc_id: r for r in textops.vocab_coverage(
        _docs(spark, rows), vocab_size=2).collect()}
    assert out[1].n_tok == 4 and out[1].oov == 1
    assert out[1].oov_ppm == 1_000_000 // 4
    assert out[2].oov == 1 and out[3].oov == 0 and out[3].oov_ppm == 0


def test_vocab_coverage_cut_ties_break_lexicographically(spark):
    # 'aa' and 'zz' both occur twice; V=1 must keep 'aa' (cnt desc, word asc)
    rows = [(1, "aa zz"), (2, "aa zz")]
    out = {r.doc_id: r for r in textops.vocab_coverage(
        _docs(spark, rows), vocab_size=1).collect()}
    assert out[1].oov == 1 and out[2].oov == 1  # zz is out, aa is in


def test_vocab_coverage_validates_and_is_deterministic(spark):
    with pytest.raises(ValueError):
        textops.vocab_coverage(_docs(spark, [(1, "a")]), vocab_size=0)
    df = _docs(spark, [(i, f"w{i % 5} w{i % 3} filler") for i in range(30)])
    a = sorted(map(tuple, textops.vocab_coverage(df, 3).collect()))
    b = sorted(map(tuple, textops.vocab_coverage(df, 3).collect()))
    assert a == b


def test_vocab_coverage_vocab_join_is_broadcast(spark):
    df = _docs(spark, [(i, "a b c") for i in range(8)])
    plan = (
        textops.vocab_coverage(df, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# ewma_control
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, value double"
    )


def test_ewma_recurrence_and_spikes_hand_checked(spark):
    # series: cents 100, 100, 500, 100 ->
    # e: 100, (100+100)//2=100, (100+500)//2=300, (300+100)//2=200
    # spikes (x > 2*prev_e): rn2: 100>200 no; rn3: 500>200 yes; rn4: no
    rows = [(7, 1, 10, 1.0), (7, 2, 20, 1.0), (7, 3, 30, 5.0), (7, 4, 40, 1.0)]
    out = sorted(
        analytics.ewma_control(_events(spark, rows)).collect(),
        key=lambda r: r.rn,
    )
    assert [r.ewma_cents for r in out] == [100, 100, 300, 200]
    assert [r.spike for r in out] == [0, 0, 1, 0]
    assert [r.x_cents for r in out] == [100, 100, 500, 100]


def test_ewma_orders_by_ts_then_event_id_per_series(spark):
    # same ts: event_id breaks the tie; two independent series
    rows = [
        (1, 2, 100, 3.0), (1, 1, 100, 1.0),  # user 1: ids 1 then 2
        (2, 9, 50, 2.0),
    ]
    out = {(r.user_id, r.rn): r for r in
           analytics.ewma_control(_events(spark, rows)).collect()}
    assert out[(1, 1)].event_id == 1 and out[(1, 2)].event_id == 2
    assert out[(1, 2)].ewma_cents == (100 + 300) // 2
    assert out[(2, 1)].ewma_cents == 200 and out[(2, 1)].spike == 0


def test_ewma_deterministic_and_validates(spark):
    rows = [(u, i, i * 10, float(1 + (u * i) % 7)) for u in (1, 2) for i in range(1, 20)]
    df = _events(spark, rows)
    a = sorted(map(tuple, analytics.ewma_control(df).collect()))
    b = sorted(map(tuple, analytics.ewma_control(df).collect()))
    assert a == b and len(a) == 38
    with pytest.raises(ValueError):
        analytics.ewma_control(df, spike_factor=0)


# ---------------------------------------------------------------------------
# frame_luma / scene_shots
# ---------------------------------------------------------------------------


def _media(spark, payloads):
    # payload text per doc; attach_media derives the binary payload
    docs = spark.createDataFrame(
        [(i, t) for i, t in payloads], "doc_id long, text string"
    )
    return multimodal.attach_media(docs)


def test_frame_luma_is_integer_mean_of_frame_bytes(spark):
    # doc 0: 4 bytes of 'A'(65) then 4 bytes of 'a'(97), frame=4
    out = {r.frame_idx: r.luma for r in multimodal.frame_luma(
        _media(spark, [(0, "AAAAaaaa")]), frame_bytes=4).collect()}
    assert out == {0: 65, 1: 97}


def test_scene_shots_cuts_on_luma_jump_and_groups_islands(spark):
    # frames (len 4): 65,65,97,97 -> cut at frame 2 (|97-65|>8): 2 shots
    media = _media(spark, [(0, "AAAA" + "AAAA" + "aaaa" + "aaaa")])
    out = sorted(
        multimodal.scene_shots(media, frame_bytes=4, threshold=8).collect(),
        key=lambda r: r.shot_id,
    )
    assert len(out) == 2
    assert (out[0].n_frames, out[0].first_frame) == (2, 0)
    assert (out[1].n_frames, out[1].first_frame) == (2, 2)
    assert out[0].min_luma == out[0].max_luma == 65
    assert out[1].min_luma == out[1].max_luma == 97


def test_scene_shots_partial_tail_frame_and_single_shot(spark):
    # 6 bytes at frame 4: tail frame has 2 bytes; no jump -> one shot
    media = _media(spark, [(0, "BBBBBB")])
    out = multimodal.scene_shots(media, frame_bytes=4, threshold=8).collect()
    assert len(out) == 1 and out[0].n_frames == 2
    assert out[0].min_luma == out[0].max_luma == 66


def test_scene_shots_validates_params(spark):
    media = _media(spark, [(0, "abc")])
    with pytest.raises(ValueError):
        multimodal.scene_shots(media, frame_bytes=0)
    with pytest.raises(ValueError):
        multimodal.scene_shots(media, threshold=-1)
