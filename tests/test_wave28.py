"""Wave-28 operators: kappa agreement, count-min sketch, token TVD,
nprobe recall curve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, similarity, textops


# ---------------------------------------------------------------------------
# kappa_agreement
# ---------------------------------------------------------------------------

# stopword-bearing sentences the n-gram scorer labels deterministically
_EN = "the cat and the dog sat with a friend of the house"
_DE = "der hund und die katze sind mit das haus von hier"


def test_kappa_perfect_agreement_is_one_minus_chance_corrected(spark):
    docs = spark.createDataFrame(
        [(1, _EN, "en", "s1"), (2, _DE, "de", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    out = textops.kappa_agreement(docs).collect()
    assert len(out) == 1
    r = out[0]
    # both predicted correctly: po = 1; pe = (1*1 + 1*1)/4 = 0.5;
    # kappa = (2*2 - 2) / (4 - 2) = 1
    assert r.n_docs == 2 and r.n_agree == 2
    assert r.po_ppm == 1_000_000
    assert r.pe_ppm == 500_000
    assert r.kappa_ppm == 1_000_000


def test_kappa_skewed_marginals_beat_accuracy(spark):
    # source with 3 en docs and 1 de doc misread as en:
    # po = 3/4; rows: en 3, de 1; cols: en 4;
    # pe_num = 3*4 = 12; kappa = (4*3 - 12)/(16 - 12) = 0
    docs = spark.createDataFrame(
        [(1, _EN, "en", "s"), (2, _EN + " again", "en", "s"),
         (3, _EN + " more", "en", "s"), (4, _EN, "de", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = textops.kappa_agreement(docs).collect()[0]
    assert r.po_ppm == 750_000
    assert r.kappa_ppm == 0  # accuracy 75%, agreement all chance


# ---------------------------------------------------------------------------
# countmin_estimates
# ---------------------------------------------------------------------------


def test_countmin_lower_bound_and_exactness_without_collisions(spark):
    rows = [(k,) for k in [1] * 50 + [2] * 30 + [3] * 20 + list(range(4, 20))]
    df = spark.createDataFrame(rows, "user_id long")
    out = analytics.countmin_estimates(
        df, "user_id", depth=4, width=512, top_n=5
    ).collect()
    assert len(out) == 5
    by_key = {r.key: r for r in out}
    assert by_key["1"].true_cnt == 50
    # CMS lower bound holds for every key
    assert all(r.lower_bound_ok for r in out)
    assert all(r.est_cnt >= r.true_cnt for r in out)
    # with 19 keys in 4x512 cells, collisions are essentially impossible
    assert all(r.over_ppm == 0 for r in out)


def test_countmin_collisions_only_inflate(spark):
    # cram 200 keys into a 1x4 sketch: estimates must still bound truth
    rows = [(k,) for k in range(200) for _ in range(k % 3 + 1)]
    df = spark.createDataFrame(rows, "user_id long")
    out = analytics.countmin_estimates(
        df, "user_id", depth=1, width=4, top_n=10
    ).collect()
    assert all(r.est_cnt >= r.true_cnt for r in out)
    assert any(r.over_ppm > 0 for r in out)  # collisions are live


def test_countmin_rejects_bad_params(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        analytics.countmin_estimates(df, "user_id", depth=0)


# ---------------------------------------------------------------------------
# token_tvd
# ---------------------------------------------------------------------------


def test_token_tvd_identical_sources_have_equal_distance(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textops.token_tvd(docs).collect()}
    # each source == the mixture -> TVD 0
    assert out["s1"].tvd_ppm == 0 and out["s2"].tvd_ppm == 0
    assert out["s1"].n_tokens == 3 and out["s1"].n_types == 3


def test_token_tvd_disjoint_vocab_hand_checked(spark):
    # s1: {a:1}, s2: {b:1}; corpus {a:1, b:1}, N=2
    # TVD(s1, corpus) = (|1*2-1*1| + 1*(2-1)) / (2*1*2) = 2/4 = 0.5
    docs = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textops.token_tvd(docs).collect()}
    assert out["s1"].tvd_ppm == 500_000
    assert out["s2"].tvd_ppm == 500_000


def test_token_tvd_absent_mass_is_counted(spark):
    # s1: {a:2, b:1} N_s=3; s2: {a:1} N_s=1; corpus {a:3, b:1} N=4
    # s2: present |1*4 - 3*1| = 1; absent mass 1*(4-3) = 1
    # tvd = (1 + 1) / (2*1*4) = 0.25
    docs = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "a", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textops.token_tvd(docs).collect()}
    assert out["s2"].tvd_ppm == 250_000


# ---------------------------------------------------------------------------
# nprobe_recall
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_nprobe_full_probe_is_exhaustive_control(spark):
    rows = [(i, [float((i * 7) % 11), float((i * 5 + 1) % 13)])
            for i in range(16)]
    out = similarity.nprobe_recall(
        _emb(spark, rows), n_cells=4, iters=1, k=3, n_queries=2,
        nprobes=(1, 4),
    ).collect()
    by = {(r.nprobe, r.qid): r for r in out}
    assert len(by) == 4  # complete (nprobe, query) grid
    for qid in (0, 1):
        full = by[(4, qid)]
        # probing every cell is brute force: recall exactly 1
        assert full.recall_ppm == 1_000_000
        assert full.n_candidates == 15  # all but self
        # recall and cost are monotone in nprobe
        assert by[(1, qid)].recall_ppm <= full.recall_ppm
        assert by[(1, qid)].n_candidates <= full.n_candidates


def test_nprobe_recall_bounds_and_validation(spark):
    rows = [(i, [float(i), float(-i)]) for i in range(10)]
    out = similarity.nprobe_recall(
        _emb(spark, rows), n_cells=2, iters=1, k=2, n_queries=1,
        nprobes=(1, 2),
    ).collect()
    assert all(0 <= r.overlap <= 2 for r in out)
    assert all(r.recall_ppm == r.overlap * 1_000_000 // 2 for r in out)
    with pytest.raises(ValueError):
        similarity.nprobe_recall(_emb(spark, rows), nprobes=())


def test_token_tvd_storage_bounded_across_calls(spark):
    # q216's (source, word) persist goes through cachereg (family
    # "tvd") — repeated calls in one long session stay storage-capped
    import time

    from hbase_bulkload_service_spark import cachereg

    cachereg.release_all()

    def storage_count():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    base = storage_count()
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i}", f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    # six DISTINCT plans (a per-call filter): registration dedupes
    # same-plan frames by semanticHash, so identical calls never grow
    # the registry — the eviction assertion needs distinct frames. (The
    # old identical-call loop only passed because earlier tests in the
    # session had already bumped the CUMULATIVE tvd eviction counter —
    # an order dependency the r09 slow-tier split exposed.)
    for i in range(6):
        textops.token_tvd(docs.where(F.col("doc_id") < 20 - i)).collect()
    assert cachereg.eviction_counts().get("tvd", 0) >= 2
    for _ in range(20):
        if storage_count() - base <= 4:
            break
        time.sleep(0.25)
    assert storage_count() - base <= 4
    cachereg.release_all()
