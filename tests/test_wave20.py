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


# ---------------------------------------------------------------------------
# ivfpq_residual_topk (IVFADC)
# ---------------------------------------------------------------------------

from hbase_bulkload_service_spark.operators import similarity  # noqa: E402


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _clustered_rows(n=24, dim=8):
    rows = []
    for i in range(n):
        c = i % 3
        rows.append((i, [10.0 * c + 0.01 * ((i * 7 + j) % 5) for j in range(dim)]))
    return rows


def test_ivfadc_shape_rank_and_self_recall(spark):
    emb = _vecs(spark, _clustered_rows())
    out = similarity.ivfpq_residual_topk(
        emb, n_cells=3, coarse_iters=2, m=2, k=6, pq_iters=1,
        nprobe=1, n_queries=1, topk=5,
    ).collect()
    # tight clusters: top-5 for query 0 are cluster-0 members; rank 1 is
    # the query itself (its residual codes minimize every ADC lookup)
    assert {r.vec_id % 3 for r in out} == {0}
    rows = sorted(out, key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].vec_id == 0
    assert [r.adist for r in rows] == sorted(r.adist for r in rows)


def test_ivfadc_probes_bound_cells_and_is_deterministic(spark):
    emb = _vecs(spark, _clustered_rows())
    a = similarity.ivfpq_residual_topk(
        emb, n_cells=3, m=2, k=4, nprobe=2, n_queries=2, topk=8
    ).collect()
    b = similarity.ivfpq_residual_topk(
        emb, n_cells=3, m=2, k=4, nprobe=2, n_queries=2, topk=8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q = {}
    for r in a:
        by_q.setdefault(r.qid, set()).add(r.cell)
    assert all(len(cs) <= 2 for cs in by_q.values())
    with pytest.raises(ValueError):
        similarity.ivfpq_residual_topk(emb, n_cells=2, nprobe=3)


def test_ivfadc_residuals_share_codebook_across_cells(spark):
    # two far-apart but internally-identical clusters: residuals
    # coincide, so a k=2 residual codebook represents BOTH cells well —
    # every corpus vector's adist is small vs the cluster spread
    rows = []
    for i in range(12):
        c = i % 2
        rows.append((i, [100.0 * c + float(i // 2 % 3)] * 8))
    emb = _vecs(spark, rows)
    out = similarity.ivfpq_residual_topk(
        emb, n_cells=2, coarse_iters=2, m=2, k=3, pq_iters=2,
        nprobe=1, n_queries=2, topk=6,
    ).collect()
    # cluster separation is 100 (=> d2 ~ 8*100^2*1e12 micros^2); residual
    # quantization error is bounded by the within-cluster spread (<= 3)
    assert all(r.adist < 8 * (3_000_000 ** 2) for r in out)


# ---------------------------------------------------------------------------
# stl_decompose
# ---------------------------------------------------------------------------


def test_stl_hand_checked_trend_seasonal_resid(spark):
    # one series, 7 samples 1h apart, values in cents via /100
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    rows = [("m", 1, i, i * 3_600_000, vals[i]) for i in range(7)]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts_ms long, value double"
    )
    out = {r.event_id: r for r in analytics.stl_decompose(df, k=2).collect()}
    # edges (first/last two) have NULL trend
    assert out[0].trend_cents is None and out[6].trend_cents is None
    assert out[1].trend_cents is None and out[5].trend_cents is None
    # interior: centered mean of 5 consecutive = middle value
    assert out[2].trend_cents == 300 and out[3].trend_cents == 400
    # detrended interior samples are 0 -> seasonal mean 0, resid 0
    assert out[3].seasonal_cents == 0 and out[3].resid_cents == 0
    # identity where all parts defined: x = trend + seasonal + resid
    for r in out.values():
        if r.trend_cents is not None and r.seasonal_cents is not None:
            assert r.x_cents == r.trend_cents + r.seasonal_cents + r.resid_cents


def test_stl_negative_detrended_truncation_and_phases(spark):
    # descending series -> negative detrended possible; same phase slots
    vals = [9.0, 7.0, 4.0, 0.5, 0.25]
    rows = [("m", 1, i, i * 3_600_000, vals[i]) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts_ms long, value double"
    )
    out = {r.event_id: r for r in analytics.stl_decompose(df, k=1).collect()}
    # k=1: trend at i=1 is (900+700+400) div 3 = 666; detr = 700-666 = 34
    assert out[1].trend_cents == 666
    # i=3: (400+50+25) div 3 = 158; detr = 50-158 = -108 (truncating div
    # agreement on the negative seasonal sum is the oracle's job; here we
    # pin the engine arithmetic)
    assert out[3].trend_cents == 158
    assert out[3].x_cents - out[3].trend_cents == -108
    # every sample's phase is its hour-of-day
    assert [out[i].phase for i in range(5)] == [0, 1, 2, 3, 4]


def test_stl_series_independence_and_guards(spark):
    rows = [("a", 1, i, i * 1000, 1.0) for i in range(3)] + [
        ("b", 2, i, i * 1000, 100.0) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts_ms long, value double"
    )
    out = analytics.stl_decompose(df, k=1, period=4, slot_ms=1000).collect()
    # k=1 window never crosses series: 3-sample series each have exactly
    # one full window (the middle sample)
    with_trend = [r for r in out if r.trend_cents is not None]
    assert len(with_trend) == 2
    assert {r.event_type for r in with_trend} == {"a", "b"}
    with pytest.raises(ValueError):
        analytics.stl_decompose(df, k=0)


# ---------------------------------------------------------------------------
# stl_mad_anomalies
# ---------------------------------------------------------------------------


def test_stl_mad_flags_planted_spike_only(spark):
    # hourly flat series with one big spike; period=4 so each phase has
    # several samples (one-sample phases are absorbed by the seasonal
    # term by construction — the residual is identically zero there)
    vals = [5.0] * 48
    vals[20] = 500.0
    rows = [("m", 1, i, i * 3_600_000, vals[i]) for i in range(48)]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts_ms long, value double"
    )
    out = analytics.stl_mad_anomalies(df, k=1, period=4, c=3).collect()
    assert [r.event_id for r in out] != []
    # the spike (and the window/phase-mates its trend and seasonal means
    # contaminate) flag; the spike itself carries the largest |resid|
    assert 20 in {r.event_id for r in out}
    spike = max(out, key=lambda r: abs(r.resid_cents))
    assert spike.event_id == 20 and spike.x_cents == 50_000


def test_stl_mad_flat_series_flags_nothing(spark):
    rows = [("m", 1, i, i * 3_600_000, 7.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts_ms long, value double"
    )
    assert analytics.stl_mad_anomalies(df, k=1).collect() == []


def test_stl_mad_guards(spark):
    df = spark.createDataFrame(
        [("m", 1, 1, 0, 1.0)],
        "event_type string, user_id long, event_id long, ts_ms long, value double",
    )
    with pytest.raises(ValueError):
        analytics.stl_mad_anomalies(df, c=0)


# ---------------------------------------------------------------------------
# holt_forecast
# ---------------------------------------------------------------------------


def test_holt_hand_checked_including_negative_trend_truncation(spark):
    # falling series: cents 100 -> 50. rn2: f=100, e=-50,
    # l=(50+100+0) div 2 = 75, b=(75-100+0) div 2 = -25 div 2 = -12
    # (TRUNCATION toward zero — floor division would give -13)
    rows = [(7, 1, 10, 1.0), (7, 2, 20, 0.5)]
    out = {r.rn: r for r in analytics.holt_forecast(
        _events(spark, rows)).collect()}
    assert out[1].level_cents == 100 and out[1].trend_cents == 0
    assert out[1].forecast_cents is None and out[1].err_cents is None
    assert out[2].forecast_cents == 100 and out[2].err_cents == -50
    assert out[2].level_cents == 75 and out[2].trend_cents == -12


def test_holt_forecast_identity_and_rising_series(spark):
    # rising series 10,20,30,40,50 cents/100 -> forecasts chase the trend
    rows = [(1, i, i * 10, i / 10.0) for i in range(1, 6)]
    out = sorted(analytics.holt_forecast(_events(spark, rows)).collect(),
                 key=lambda r: r.rn)
    # f_t = l_{t-1} + b_{t-1} exactly
    for prev, cur in zip(out, out[1:]):
        assert cur.forecast_cents == prev.level_cents + prev.trend_cents
        assert cur.err_cents == cur.x_cents - cur.forecast_cents
    # the trend register learns the rise (strictly positive by the end)
    assert out[-1].trend_cents > 0


def test_holt_deterministic_across_series(spark):
    rows = [(u, i, i * 10, float((u * i) % 9)) for u in (1, 2, 3) for i in range(1, 15)]
    df = _events(spark, rows)
    a = sorted(map(tuple, analytics.holt_forecast(df).collect()))
    b = sorted(map(tuple, analytics.holt_forecast(df).collect()))
    assert a == b and len(a) == 42


# ---------------------------------------------------------------------------
# hard_negative_pairs
# ---------------------------------------------------------------------------


def _labeled_vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_hard_negatives_keeps_only_cross_label_high_cos(spark):
    # two near-identical vectors with DIFFERENT labels (the hard pair),
    # one near-identical SAME-label pair (dedup's business, not ours),
    # one orthogonal cross-label pair (an easy negative)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.999, 0.01, 0.0, 0.0], 2),   # hard negative vs 0
        (2, [0.998, 0.02, 0.0, 0.0], 1),   # same label as 0 -> excluded
        (3, [0.0, 0.0, 1.0, 0.0], 2),      # easy negative -> below threshold
    ]
    out = similarity.hard_negative_pairs(
        _labeled_vecs(spark, rows), 900_000
    ).collect()
    got = {(r.vec_a, r.vec_b) for r in out}
    assert (0, 1) in got and (1, 2) in got
    assert (0, 2) not in got            # same label
    assert all(3 not in p for p in got)  # orthogonal never passes
    for r in out:
        assert r.label_a != r.label_b and r.cos_micros >= 900_000


def test_hard_negatives_blocked_path_matches_brute_force_on_clusters(spark):
    # with one centroid per cluster, blocking keeps in-cluster pairs;
    # the cross-label subset must match the unblocked run's subset
    rows = []
    for i in range(12):
        c = i % 2
        rows.append((i, [10.0 * c + 0.1 * (i % 3), 1.0, 0.0, 0.0], i % 4))
    emb = _labeled_vecs(spark, rows)
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    blocked = {
        (r.vec_a, r.vec_b)
        for r in similarity.hard_negative_pairs(emb, 990_000, cents).collect()
    }
    brute = {
        (r.vec_a, r.vec_b)
        for r in similarity.hard_negative_pairs(emb, 990_000, None).collect()
    }
    assert blocked <= brute and len(blocked) > 0


# ---------------------------------------------------------------------------
# salt_plan
# ---------------------------------------------------------------------------


def test_salt_plan_factors_and_cutoff(spark):
    rows = (
        [(1, i, i, 1.0) for i in range(70)]      # key 1: 70 rows -> factor 3
        + [(2, i, i, 1.0) for i in range(33)]    # key 2: 33 rows -> factor 2
        + [(3, i, i, 1.0) for i in range(32)]    # key 3: at target -> excluded
        + [(4, 0, 0, 1.0)]                       # key 4: tiny -> excluded
    )
    df = _events(spark, rows)
    out = {r.user_id: r for r in analytics.salt_plan(
        df, "user_id", target_rows=32).collect()}
    assert set(out) == {1, 2}
    assert out[1].cnt == 70 and out[1].salt_factor == 3
    assert out[2].cnt == 33 and out[2].salt_factor == 2
    with pytest.raises(ValueError):
        analytics.salt_plan(df, "user_id", target_rows=0)


# ---------------------------------------------------------------------------
# k_anonymity_audit / forget_plan
# ---------------------------------------------------------------------------

from hbase_bulkload_service_spark.operators import quality  # noqa: E402


def test_k_anonymity_flags_small_classes_only(spark):
    rows = [("US", "A")] * 5 + [("US", "B")] * 2 + [("DE", "A")]
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {(r.nation, r.seg): r.group_n for r in
           quality.k_anonymity_audit(df, ["nation", "seg"], k=5).collect()}
    assert out == {("US", "B"): 2, ("DE", "A"): 1}
    # k=2: only the singleton remains
    out2 = quality.k_anonymity_audit(df, ["nation", "seg"], k=2).collect()
    assert [(r.nation, r.seg) for r in out2] == [("DE", "A")]
    with pytest.raises(ValueError):
        quality.k_anonymity_audit(df, ["nation"], k=1)
    with pytest.raises(ValueError):
        quality.k_anonymity_audit(df, [], k=5)


def test_forget_plan_counts_slots_and_span(spark):
    rows = [
        (10, 1, 0, 1.0),          # slot 0
        (10, 2, 100_000, 1.0),    # slot 0
        (10, 3, 650_000, 1.0),    # slot 2
        (11, 4, 50, 1.0),         # not in cohort
    ]
    df = _events(spark, rows)
    out = {r.user_id: r for r in quality.forget_plan(
        df, F.col("user_id") == 10).collect()}
    assert set(out) == {10}
    assert out[10].n_rows == 3 and out[10].n_rollup_slots == 2
    assert out[10].first_ts == 0 and out[10].last_ts == 650_000
    with pytest.raises(ValueError):
        quality.forget_plan(df, F.col("user_id") == 10, slot_ms=0)


# ---------------------------------------------------------------------------
# join_size_estimate / split_leakage
# ---------------------------------------------------------------------------

from hbase_bulkload_service_spark.operators import dedup  # noqa: E402


def test_join_size_estimate_prices_the_self_join_exactly(spark):
    rows = [(1, i, i, 1.0) for i in range(5)] + [(2, i, i, 1.0) for i in range(3)] + [
        (3, 0, 0, 1.0)
    ]
    df = _events(spark, rows)
    out = sorted(analytics.join_size_estimate(df, "user_id", top_n=2).collect(),
                 key=lambda r: -r.pairs)
    # predicted sizes: 25, 9, 1 (total 35); top-2 kept
    assert [(r.user_id, r.cnt, r.pairs) for r in out] == [(1, 5, 25), (2, 3, 9)]
    assert out[0].share_ppm == 25 * 1_000_000 // 35
    # ground truth: the actual self-join row count equals the total
    actual = df.alias("a").join(df.alias("b"), "user_id").count()
    assert actual == 35
    with pytest.raises(ValueError):
        analytics.join_size_estimate(df, "user_id", top_n=0)


def test_split_leakage_flags_only_cross_split_neardups(spark):
    # find ids on both sides of the hash split, then plant a near-dup
    # pair across the boundary and an identical pair within one side
    import hashlib

    def side(d):
        return int(hashlib.md5(f"s:{d}".encode()).hexdigest()[:8], 16) % 10 == 0

    tests = [d for d in range(200) if side(d)]
    trains = [d for d in range(200) if not side(d)]
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (tests[0], text),            # test twin
        (trains[0], text),           # train twin -> cross-split leak
        (trains[1], text + " iota"), # near-dup, train side
        (trains[2], "totally different words all around here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.split_leakage(docs, test_mod=10)
    got = {(r.doc_a, r.doc_b): (r.split_a, r.split_b) for r in out.collect()}
    a, b = sorted((tests[0], trains[0]))
    assert (a, b) in got          # the cross-split twin pair
    for (da, db), (sa, sb) in got.items():
        assert sa != sb
    # the train-train near-dup pair never appears
    assert all(
        sorted((da, db)) != sorted((trains[0], trains[1]))
        for da, db in got
    )
    with pytest.raises(ValueError):
        dedup.split_leakage(docs, test_mod=1)
