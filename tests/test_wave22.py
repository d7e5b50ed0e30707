"""Wave-22 operators: DoReMi weights, blocklist audit, embedding health."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# doremi_weights
# ---------------------------------------------------------------------------


def test_doremi_upweights_high_loss_domains(spark):
    # vocab_size=1 -> vocab = {'common'}; srcA is all-common (loss 0),
    # srcB is all-rare (loss 1e6) -> B's weight must grow every round
    rows = [(i, "srcA", "common common") for i in range(4)] + [
        (10 + i, "srcB", "rare1 rare2") for i in range(4)
    ]
    out = {r.source: r for r in curation.doremi_weights(
        _docs(spark, rows), rounds=3, vocab_size=1).collect()}
    a, b = out["srcA"], out["srcB"]
    assert a.loss == 0 and b.loss == 1_000_000
    assert b.w0_ppm == 500_000 and a.w0_ppm == 500_000
    assert b.w1_ppm > b.w0_ppm and b.w2_ppm > b.w1_ppm and b.w3_ppm > b.w2_ppm
    # ppm invariant: every round sums to exactly 1e6
    for t in range(4):
        assert out["srcA"][f"w{t}_ppm"] + out["srcB"][f"w{t}_ppm"] == 1_000_000


def test_doremi_rounds_depend_on_moving_average(spark):
    # three domains with distinct losses: the middle one sits below the
    # mixture average at round 1 but the average falls as the heavy
    # domain grows — weights must not be a closed-form power of round 1
    # token counts: common 12+6=18, rare 6+12=18 — the TIE breaks
    # lexicographically -> vocab = {'common'} (cnt desc, word asc), so
    # losses are s0=0, s1=500000, s2=1e6
    rows = (
        [(i, "s0", "common common") for i in range(6)]
        + [(10 + i, "s1", "common rare") for i in range(6)]
        + [(20 + i, "s2", "rare rare") for i in range(6)]
    )
    out = {r.source: r for r in curation.doremi_weights(
        _docs(spark, rows), rounds=3, vocab_size=1).collect()}
    total = [sum(out[s][f"w{t}_ppm"] for s in out) for t in range(4)]
    assert total == [1_000_000] * 4
    # round 1: s1 sits one ppm above the mixture average and gets a
    # strictly positive excess boost — the moving-average coupling
    assert out["s2"].w1_ppm > out["s1"].w1_ppm > out["s0"].w1_ppm
    # by round 3 the average has risen past s1: below-average domains
    # decay together (proportional multiplier 1), s2 dominates
    assert out["s2"].w3_ppm > out["s1"].w3_ppm >= out["s0"].w3_ppm
    assert out["s1"].w2_ppm < out["s1"].w1_ppm
    with pytest.raises(ValueError):
        curation.doremi_weights(_docs(spark, rows), rounds=0)


def test_doremi_is_deterministic(spark):
    rows = [(i, f"s{i % 4}", f"w{i % 7} w{i % 3}") for i in range(40)]
    a = sorted(map(tuple, curation.doremi_weights(
        _docs(spark, rows), rounds=2, vocab_size=3).collect()))
    b = sorted(map(tuple, curation.doremi_weights(
        _docs(spark, rows), rounds=2, vocab_size=3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# blocklist_audit
# ---------------------------------------------------------------------------


def test_blocklist_flags_by_weighted_score(spark):
    rows = [
        (0, "clean", "nice words only"),
        (1, "spicy", "bad bad words"),       # score 2*2=4 -> flagged at 4
        (2, "spicy", "bad words"),           # score 2 -> not flagged
    ]
    out = {r.source: r for r in textops.blocklist_audit(
        _docs(spark, rows), {"bad": 2}, flag_threshold=4).collect()}
    assert out["clean"].flagged_docs == 0 and out["clean"].total_score == 0
    assert out["spicy"].n_docs == 2
    assert out["spicy"].flagged_docs == 1
    assert out["spicy"].total_score == 6
    assert out["spicy"].flagged_ppm == 500_000


def test_blocklist_clean_sources_survive_with_zeroes(spark):
    # a source with NO violations must still appear (left join), and a
    # blocklist word absent from the corpus must not error
    rows = [(0, "a", "x y"), (1, "b", "x z")]
    out = {r.source: r for r in textops.blocklist_audit(
        _docs(spark, rows), {"missing": 9}, flag_threshold=1).collect()}
    assert set(out) == {"a", "b"}
    assert all(r.flagged_docs == 0 and r.flagged_ppm == 0 for r in out.values())
    with pytest.raises(ValueError):
        textops.blocklist_audit(_docs(spark, rows), {})
    with pytest.raises(ValueError):
        textops.blocklist_audit(_docs(spark, rows), {"x": 0})


def test_blocklist_join_is_broadcast(spark):
    plan = (
        textops.blocklist_audit(
            _docs(spark, [(0, "a", "x")]), {"x": 1})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# embedding_health
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_embedding_health_counts_degenerates(spark):
    rows = [
        (0, [0.0, 0.0], 1),    # zero norm
        (1, [0.1, 0.0], 1),    # low norm (0.1 < 0.5)
        (2, [3.0, 4.0], 1),    # norm 5.0
        (3, [2.0, 2.0], 1),    # constant dims, norm sqrt(8)
    ]
    out = {r.label: r for r in similarity.embedding_health(
        _emb(spark, rows)).collect()}
    r = out[1]
    assert r.n_vecs == 4 and r.zero_norm == 1 and r.low_norm == 1
    # zero vector and [2,2] are constant-dims
    assert r.const_dims == 2
    assert r.min_norm_micros == 0
    assert r.max_norm_micros == 5_000_000
    assert r.mean_norm_micros == (
        0 + 100_000 + 5_000_000 + 2_828_427
    ) // 4


def test_embedding_health_groups_by_label(spark):
    rows = [(0, [1.0, 0.0], 1), (1, [0.0, 1.0], 2), (2, [0.0, 0.0], 2)]
    out = {r.label: r for r in similarity.embedding_health(
        _emb(spark, rows)).collect()}
    assert out[1].n_vecs == 1 and out[1].zero_norm == 0
    assert out[2].n_vecs == 2 and out[2].zero_norm == 1


def test_embedding_health_plan_is_single_agg_no_join(spark):
    plan = (
        similarity.embedding_health(_emb(spark, [(0, [1.0], 1)]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan
