"""Wave-18 operators: DSIR importance resampling, product-quantization ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dsir_prefers_target_like_docs(spark):
    # target stratum speaks "alpha beta"; doc 10 mimics it, doc 11 doesn't
    rows = [
        (1, "zh", "alpha beta alpha beta alpha beta"),
        (2, "zh", "alpha beta gamma alpha beta"),
        (10, "en", "alpha beta alpha beta"),
        (11, "en", "delta epsilon zeta delta epsilon"),
    ]
    out = curation.dsir_importance(
        _docs(spark, rows), keep_n=10, n_buckets=64
    ).collect()
    got = {r.doc_id: r.weight_ppm for r in out}
    assert set(got) == {10, 11}  # target docs never appear in the ledger
    assert got[10] > got[11]


def test_dsir_excludes_featureless_docs_and_caps_keep_n(spark):
    rows = [(i, "en", "one two three") for i in range(5)] + [
        (100, "en", "single"),  # < 2 words -> no bigram features
        (200, "zh", "one two"),
    ]
    out = curation.dsir_importance(
        _docs(spark, rows), keep_n=3, n_buckets=64
    ).collect()
    ids = {r.doc_id for r in out}
    assert len(out) == 3 and 100 not in ids and 200 not in ids


def test_dsir_weights_are_occurrence_weighted(spark):
    # identical vocabulary, doc 20 repeats the target bigram twice as often
    rows = [
        (1, "zh", "hot cold"),
        (20, "en", "hot cold hot cold hot cold"),
        (21, "en", "hot cold stray"),
    ]
    out = {
        r.doc_id: r
        for r in curation.dsir_importance(
            _docs(spark, rows), keep_n=10, n_buckets=64
        ).collect()
    }
    assert out[20].n_feats > out[21].n_feats
    assert out[20].weight_ppm > out[21].weight_ppm


def test_dsir_deterministic_rerun(spark):
    rows = [
        (i, "zh" if i % 3 == 0 else "en", f"tok{i % 7} tok{(i + 1) % 7} tok{i % 5}")
        for i in range(30)
    ]
    a = curation.dsir_importance(_docs(spark, rows), keep_n=8).collect()
    b = curation.dsir_importance(_docs(spark, rows), keep_n=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# pq_ann_topk
# ---------------------------------------------------------------------------


def _vecs(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _clustered_rows(n=24, dim=8):
    # three well-separated clusters along different axes
    rows = []
    for i in range(n):
        c = i % 3
        base = [0.0] * dim
        for j in range(dim):
            base[j] = 10.0 * c + (0.01 * ((i * 7 + j) % 5))
        rows.append((i, base))
    return rows


def test_pq_topk_shape_and_rank_order(spark):
    emb = _vecs(spark, _clustered_rows(), dim=8)
    out = similarity.pq_ann_topk(
        emb, m=2, k=4, iters=1, n_queries=3, topk=5
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
        dists = [r.adist for r in rows]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)


def test_pq_groups_same_cluster_first(spark):
    # query 0 lives in cluster 0 (ids 0,3,6,...): with tight clusters the
    # ADC top-5 for query 0 must all carry cluster-0 ids
    emb = _vecs(spark, _clustered_rows(), dim=8)
    out = similarity.pq_ann_topk(
        emb, m=2, k=4, iters=1, n_queries=1, topk=5
    ).collect()
    assert {r.vec_id % 3 for r in out} == {0}


def test_pq_deterministic_rerun(spark):
    emb = _vecs(spark, _clustered_rows(), dim=8)
    a = similarity.pq_ann_topk(emb, m=4, k=3, iters=2, n_queries=2).collect()
    b = similarity.pq_ann_topk(emb, m=4, k=3, iters=2, n_queries=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pq_rejects_indivisible_dim(spark):
    emb = _vecs(spark, [(0, [1.0] * 6)], dim=6)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_ann_topk(emb, m=4, k=2)


def test_pq_zero_iters_uses_init_codebook(spark):
    # iters=0 must still encode + answer (codebook = the k lowest-id vecs)
    emb = _vecs(spark, _clustered_rows(n=9), dim=8)
    out = similarity.pq_ann_topk(
        emb, m=2, k=3, iters=0, n_queries=1, topk=3
    ).collect()
    assert len(out) == 3


def test_pq_adc_join_is_broadcast(spark):
    emb = _vecs(spark, _clustered_rows(), dim=8)
    plan = similarity.pq_ann_topk(
        emb, m=2, k=4, iters=0, n_queries=1, topk=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
