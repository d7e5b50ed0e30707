"""Wave-25 operators: matryoshka recall curve, stratified batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matryoshka_full_dim_is_perfect_control(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(8)]) for i in range(12)]
    out = similarity.matryoshka_recall(
        _emb(spark, rows), dims=(2, 8), k=3, n_queries=2
    ).collect()
    full = [r for r in out if r.dim_budget == 8]
    assert len(full) == 2 and all(r.recall_ppm == 1_000_000 for r in full)
    assert all(0 <= r.overlap <= 3 for r in out)
    # grid is complete: every (budget, query) pair appears
    assert len(out) == 4


def test_matryoshka_detects_prefix_blindness(spark):
    # vectors identical in the first 2 dims but distinct in the tail:
    # the 2-dim budget cannot rank the tail, full-dim can -> recall < 1
    # is possible; with ties broken by id the 2-dim top-k is id-ordered
    rows = [
        (0, [1.0, 0.0, 1.0, 0.0]),
        (1, [1.0, 0.0, 0.9, 0.1]),   # full-dim best for 0
        (2, [1.0, 0.0, 0.0, 1.0]),   # full-dim worst for 0
        (3, [1.0, 0.0, 0.8, 0.2]),
    ]
    out = {(r.dim_budget, r.qid): r for r in similarity.matryoshka_recall(
        _emb(spark, rows), dims=(2, 4), k=1, n_queries=1).collect()}
    # at d=2 all cosines tie at 1.0 -> neighbor is lowest id (1);
    # full-dim ground truth for query 0 is also 1 -> recall 1 here,
    # but the tie-ordering is what we pin
    assert out[(4, 0)].recall_ppm == 1_000_000
    assert (2, 0) in out
    with pytest.raises(ValueError):
        similarity.matryoshka_recall(_emb(spark, rows), dims=(), k=1)


def test_stratified_batches_deals_round_robin(spark):
    rows = [(i, "en" if i < 33 else "de", "t") for i in range(53)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation.stratified_batches(df, n_batches=4, strata_col="lang").collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r)
        assert r.dev in (0, 1)  # round-robin fairness by construction
    # en: 33 over 4 batches -> counts {9, 8, 8, 8}; de: 20 -> all 5
    assert sorted(r.n_docs for r in per["en"]) == [8, 8, 8, 9]
    assert [r.n_docs for r in per["de"]] == [5, 5, 5, 5]
    # totals conserve
    assert sum(r.n_docs for r in out) == 53
    with pytest.raises(ValueError):
        curation.stratified_batches(df, n_batches=0)


def test_stratified_batches_deterministic(spark):
    rows = [(i, f"l{i % 3}", "t") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, curation.stratified_batches(df, 5).collect()))
    b = sorted(map(tuple, curation.stratified_batches(df, 5).collect()))
    assert a == b
