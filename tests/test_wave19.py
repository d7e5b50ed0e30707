"""Wave-19 operators: concat-and-cut sequence packing, n-gram novelty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# concat_pack_stats
# ---------------------------------------------------------------------------


def test_concat_pack_conserves_tokens_and_fills_interior_windows(spark):
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(37))) for i in range(40)]
    df = _docs(spark, rows)
    out = textops.concat_pack_stats(df, seq_len=64, seed=3, n_shards=4)
    got = out.collect()
    # token conservation: every token lands in exactly one window
    assert sum(r.n_tokens for r in got) == 40 * 37
    # every doc starts in exactly one window
    assert sum(r.n_starts for r in got) == 40
    # interior windows are exactly full; only a shard's LAST window may be
    # partial (concat-and-cut has zero interior waste by construction)
    last = {}
    for r in got:
        last[r.shard] = max(last.get(r.shard, -1), r.seq_id)
    for r in got:
        if r.seq_id != last[r.shard]:
            assert r.n_tokens == 64 and r.fill_ppm == 1_000_000
        assert r.n_docs >= r.n_starts >= 0


def test_concat_pack_single_doc_spans_windows(spark):
    # one 150-token doc, one shard, L=64 -> 3 windows; the doc starts in
    # window 0 and carries into 1 and 2
    df = _docs(spark, [(1, " ".join(f"t{j}" for j in range(150)))])
    out = textops.concat_pack_stats(df, seq_len=64, seed=0, n_shards=1)
    rows = {r.seq_id: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    assert [rows[i].n_starts for i in (0, 1, 2)] == [1, 0, 0]
    assert [rows[i].n_docs for i in (0, 1, 2)] == [1, 1, 1]
    assert [rows[i].n_tokens for i in (0, 1, 2)] == [64, 64, 22]
    assert rows[2].fill_ppm == 22 * 1_000_000 // 64


def test_concat_pack_deterministic_and_seed_sensitive(spark):
    rows = [(i, " ".join(f"x{i}y{j}" for j in range(5 + i % 7))) for i in range(30)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, textops.concat_pack_stats(df, 32, seed=1).collect()))
    b = sorted(map(tuple, textops.concat_pack_stats(df, 32, seed=1).collect()))
    c = sorted(map(tuple, textops.concat_pack_stats(df, 32, seed=2).collect()))
    assert a == b
    assert a != c  # a new seed is a fresh permutation -> different packing


def test_concat_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        textops.concat_pack_stats(_docs(spark, [(1, "a b")]), seq_len=0)


def test_concat_pack_plan_has_no_join(spark):
    df = _docs(spark, [(i, "a b c") for i in range(8)])
    plan = textops.concat_pack_stats(df, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_novelty_first_batch_is_all_new(spark):
    rows = [
        (0, "a b c d e f"),          # batch 0
        (1, "a b c d e"),            # batch 0 (same grams)
        (50, "a b c d e"),           # batch 1: nothing new
        (51, "p q r s t"),           # batch 1: one new gram
    ]
    out = {r.batch: r for r in textops.ngram_novelty(
        _docs(spark, rows), k=5, batch_docs=50).collect()}
    assert out[0].novelty_ppm == 1_000_000
    # batch 0: grams 'a b c d e' (x2), 'b c d e f' -> 3 occ, 2 distinct
    assert out[0].n_occ == 3 and out[0].n_distinct == 2 and out[0].n_new == 2
    # batch 1: 'a b c d e' seen before, 'p q r s t' new
    assert out[1].n_distinct == 2 and out[1].n_new == 1
    assert out[1].novelty_ppm == 500_000


def test_novelty_short_docs_contribute_nothing(spark):
    rows = [(0, "only four words here"), (1, "a b c d e")]
    out = textops.ngram_novelty(_docs(spark, rows), k=5, batch_docs=50)
    got = out.collect()
    assert len(got) == 1 and got[0].n_occ == 1


def test_novelty_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        textops.ngram_novelty(_docs(spark, [(1, "a b")]), k=0)
    with pytest.raises(ValueError):
        textops.ngram_novelty(_docs(spark, [(1, "a b")]), batch_docs=0)


def test_novelty_occurrences_counted_not_collapsed(spark):
    # the same gram repeated within one doc counts every occurrence in
    # n_occ but once in n_distinct
    rows = [(0, "a b a b a b a b")]  # grams of k=2: 'a b' x4, 'b a' x3
    out = textops.ngram_novelty(_docs(spark, rows), k=2, batch_docs=10).collect()
    assert out[0].n_occ == 7 and out[0].n_distinct == 2


# ---------------------------------------------------------------------------
# ivfpq_topk
# ---------------------------------------------------------------------------

from hbase_bulkload_service_spark.operators import similarity  # noqa: E402


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _clustered_rows(n=24, dim=8):
    # three well-separated clusters along different axes
    rows = []
    for i in range(n):
        c = i % 3
        base = [10.0 * c + 0.01 * ((i * 7 + j) % 5) for j in range(dim)]
        rows.append((i, base))
    return rows


def test_ivfpq_shape_rank_order_and_probed_cells(spark):
    emb = _vecs(spark, _clustered_rows())
    out = similarity.ivfpq_topk(
        emb, n_cells=3, coarse_iters=1, m=2, k=4, pq_iters=1,
        nprobe=2, n_queries=2, topk=5,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
        assert [r.adist for r in rows] == sorted(r.adist for r in rows)
        # results come from at most nprobe distinct cells
        assert len({r.cell for r in rows}) <= 2


def test_ivfpq_query_finds_own_cluster(spark):
    # tight clusters: query 0's top-5 must all be cluster-0 members, and
    # its own vector ranks 1 (its codes minimize every per-subspace ADC
    # lookup, so its adist — the pure quantization error — is the global
    # minimum; ties break to the lowest id, which is the query itself)
    emb = _vecs(spark, _clustered_rows())
    out = similarity.ivfpq_topk(
        emb, n_cells=3, coarse_iters=2, m=2, k=6, pq_iters=1,
        nprobe=1, n_queries=1, topk=5,
    ).collect()
    assert {r.vec_id % 3 for r in out} == {0}
    top = min(out, key=lambda r: r.rnk)
    assert top.vec_id == 0
    assert top.adist == min(r.adist for r in out)


def test_ivfpq_nprobe_widens_candidates(spark):
    # probing every cell can only add candidates relative to nprobe=1
    emb = _vecs(spark, _clustered_rows())
    narrow = similarity.ivfpq_topk(
        emb, n_cells=3, m=2, k=4, nprobe=1, n_queries=1, topk=24
    ).collect()
    wide = similarity.ivfpq_topk(
        emb, n_cells=3, m=2, k=4, nprobe=3, n_queries=1, topk=24
    ).collect()
    assert {r.vec_id for r in narrow} <= {r.vec_id for r in wide}
    assert len(wide) > len(narrow)


def test_ivfpq_deterministic_and_validates_params(spark):
    emb = _vecs(spark, _clustered_rows())
    a = similarity.ivfpq_topk(emb, n_cells=2, m=4, k=3, nprobe=2).collect()
    b = similarity.ivfpq_topk(emb, n_cells=2, m=4, k=3, nprobe=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        similarity.ivfpq_topk(emb, n_cells=2, nprobe=3)
    with pytest.raises(ValueError):
        similarity.ivfpq_topk(emb, m=3)  # dim 8 not divisible


def test_ivfpq_probe_and_adc_joins_are_broadcast(spark):
    emb = _vecs(spark, _clustered_rows())
    plan = (
        similarity.ivfpq_topk(emb, n_cells=3, m=2, k=4, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# label_propagation_rounds
# ---------------------------------------------------------------------------

from hbase_bulkload_service_spark.operators import graph  # noqa: E402


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_lpa_separates_two_cliques_joined_by_a_bridge(spark):
    # two 4-cliques {0..3} and {10..13} joined by one bridge 3-10: CC
    # would flood min(0) everywhere; LPA keeps two communities
    clique = lambda ids: [(x, y) for x in ids for y in ids if x < y]
    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    out = {r.node: r.community for r in
           graph.label_propagation_rounds(_pairs(spark, edges), rounds=3).collect()}
    left = {out[n] for n in (0, 1, 2)}
    right = {out[n] for n in (11, 12, 13)}
    assert left == {0} and right == {10}
    assert len(out) == 8


def test_lpa_star_adopts_hub_label_and_is_deterministic(spark):
    # star: leaves see only the hub; after round 1 every leaf carries the
    # hub's initial label, the hub carries the min leaf label
    edges = [(5, leaf) for leaf in (1, 2, 3, 4)]
    df = _pairs(spark, edges)
    out = {r.node: r.community for r in
           graph.label_propagation_rounds(df, rounds=1).collect()}
    assert all(out[leaf] == 5 for leaf in (1, 2, 3, 4))
    assert out[5] == 1  # all neighbor labels tie at count 1 -> lowest
    a = sorted(map(tuple, graph.label_propagation_rounds(df, rounds=3).collect()))
    b = sorted(map(tuple, graph.label_propagation_rounds(df, rounds=3).collect()))
    assert a == b


def test_lpa_rejects_bad_rounds(spark):
    with pytest.raises(ValueError):
        graph.label_propagation_rounds(_pairs(spark, [(1, 2)]), rounds=0)
