"""Wave-21 operators: bitext mining, phrase decontamination,
temperature resampling, surprisal buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ldocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# ---------------------------------------------------------------------------
# bitext_margin_pairs
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bitext_mutual_best_and_margin(spark):
    # one cell (single centroid); A = {0, 2}, B = {1, 3}.
    # 0 and 1 are near-identical; 2 and 3 are near-identical and
    # orthogonal to the first pair -> mutual bests are (0,1) and (2,3).
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.01]),
        (2, [0.0, 1.0]),
        (3, [0.01, 0.99]),
    ]
    emb = _emb(spark, rows)
    cent = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    out = similarity.bitext_margin_pairs(emb, cent, k=2).collect()
    pairs = {(r.vec_a, r.vec_b) for r in out}
    assert pairs == {(0, 1), (2, 3)}
    for r in out:
        # cos of the pair is far above the top-2 mean -> margin > 1e6
        assert r.margin_ppm > 1_000_000
        assert r.sum_a >= r.cos_micros  # top-k sum includes the best


def test_bitext_margin_is_exact_integer_twin(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (3, [0.8, 0.6])]
    emb = _emb(spark, rows)
    cent = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    out = {(r.vec_a, r.vec_b): r for r in
           similarity.bitext_margin_pairs(emb, cent, k=2).collect()}
    r = out[(0, 1)]
    # sum_a over {cos(0,1)=1e6, cos(0,3)=800000}, sum_b = cos(0,1) only
    # candidates for b=1: a in {0} -> sum_b = 1e6... both sides fold the
    # same candidate set; verify the div identity exactly
    assert r.margin_ppm == (r.cos_micros * 4 * 1_000_000) // (
        r.sum_a + r.sum_b
    )


def test_bitext_sides_never_pair_within_side(spark):
    rows = [(i, [1.0, float(i) / 10]) for i in range(6)]
    emb = _emb(spark, rows)
    cent = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    for r in similarity.bitext_margin_pairs(emb, cent, k=3).collect():
        assert r.vec_a % 2 == 0 and r.vec_b % 2 == 1


# ---------------------------------------------------------------------------
# phrase_decontamination
# ---------------------------------------------------------------------------


def test_phrase_decontam_finds_cross_doc_and_overlaps(spark):
    rows = [
        (0, "a b a b"),          # source: phrase = "a b a" (len 3)
        (1, "x a b a b a y"),    # contains it at 1 AND overlapping at 3
        (2, "a b c"),            # shares a prefix but not the phrase
    ]
    out = {(r.phrase_doc, r.doc_id): r for r in textops.phrase_decontamination(
        _docs(spark, rows), phrase_len=3, source_mod=10**9).collect()}
    # source_mod huge -> only doc 0 qualifies (0 % mod == 0)
    assert (0, 1) in out and out[(0, 1)].n_matches == 2
    assert out[(0, 1)].first_pos == 1
    assert (0, 0) in out and out[(0, 0)].n_matches == 1  # self at 0
    assert (0, 2) not in out


def test_phrase_decontam_repeated_word_cannot_double_vote(spark):
    # phrase "a a b": doc "a a a b" matches ONLY at start 1 — start 0
    # has (a,a,a) which fails the third token; the vote count must not
    # let the duplicated 'a' fake a hit.
    rows = [(0, "a a b"), (7, "a a a b")]
    out = {(r.phrase_doc, r.doc_id): r for r in textops.phrase_decontamination(
        _docs(spark, rows), phrase_len=3, source_mod=10**9).collect()}
    assert out[(0, 7)].n_matches == 1 and out[(0, 7)].first_pos == 1


def test_phrase_decontam_short_sources_are_skipped(spark):
    rows = [(0, "a b"), (1, "a b c d")]
    out = textops.phrase_decontamination(
        _docs(spark, rows), phrase_len=3, source_mod=10**9).collect()
    assert out == []  # the only eligible source is too short
    with pytest.raises(ValueError):
        textops.phrase_decontamination(_docs(spark, rows), phrase_len=0)


def test_phrase_decontam_is_gram_hashset_plan(spark):
    # the 100 TB contract (probe-hardened twice, SCALE.md): sliding
    # P-grams probe the BROADCAST phrase set via a hash join — per-token
    # cost independent of eval-set size — and the only shuffle exchange
    # is the hits-sized rollup
    plan = (
        textops.phrase_decontamination(
            _docs(spark, [(0, "a b c d"), (1, "a b c x")]), phrase_len=3,
            source_mod=10**9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# temperature_sample
# ---------------------------------------------------------------------------


def test_temperature_sample_quotas_follow_sqrt_weights(spark):
    # 100 'big' docs vs 4 'small': weights 10 vs 2 -> of budget 12,
    # big gets 10, small gets 2 (not 100:4).
    rows = [(i, "big", "t") for i in range(100)] + [
        (1000 + i, "small", "t") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation.temperature_sample(df, budget=12).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["big"]) == 10 and len(by_lang["small"]) == 2
    assert all(r.weight == 10 for r in by_lang["big"])
    assert all(r.quota == 2 for r in by_lang["small"])


def test_temperature_sample_total_and_determinism(spark):
    rows = [(i, f"l{i % 3}", "t") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted((r.doc_id, r.lang) for r in
               curation.temperature_sample(df, budget=30).collect())
    b = sorted((r.doc_id, r.lang) for r in
               curation.temperature_sample(df, budget=30).collect())
    assert a == b and len(a) == 30
    with pytest.raises(ValueError):
        curation.temperature_sample(df, budget=0)


def test_temperature_sample_shortfall_reports_quota(spark):
    # 1-doc lang with weight 1 can draw quota > 1 only if budget skews;
    # force it: budget 10 over langs with n=1 (w=1) and n=4 (w=2) ->
    # quotas 3/7-ish; the 1-doc lang keeps 1 row but quota stays visible
    rows = [(0, "tiny", "t")] + [(10 + i, "big", "t") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation.temperature_sample(df, budget=10).collect()
    tiny = [r for r in out if r.lang == "tiny"]
    assert len(tiny) == 1 and tiny[0].quota >= 1  # shortfall visible


# ---------------------------------------------------------------------------
# surprisal_buckets
# ---------------------------------------------------------------------------


def test_surprisal_ranks_against_reference_slice(spark):
    # reference = doc 0 (mod huge): "the the the rare" -> rank(the)=1,
    # rank(rare)=2; unseen words cost cap+1
    rows = [
        (0, "en", "the the the rare"),
        (1, "en", "the the"),          # avg rank 1
        (2, "en", "unseen unseen"),    # avg rank cap+1
    ]
    out = {r.doc_id: r for r in textops.surprisal_buckets(
        _ldocs(spark, rows), rank_cap=10, ref_mod=10**9).collect()}
    assert out[1].avg_rank == 1
    assert out[2].avg_rank == 11
    # tercile over 3 docs ordered by (avg_rank, doc_id): 0 -> head,
    # 1 -> middle, 2 -> tail
    assert out[0].tier == "head" and out[1].tier == "middle"
    assert out[2].tier == "tail"


def test_surprisal_rank_cap_truncates_vocab(spark):
    # cap=1: only 'a' (most frequent) is ranked; 'b' seen in ref but
    # beyond the cap -> costs cap+1 = 2 like an unseen word
    rows = [(0, "en", "a a b"), (1, "en", "b b")]
    out = {r.doc_id: r for r in textops.surprisal_buckets(
        _ldocs(spark, rows), rank_cap=1, ref_mod=10**9).collect()}
    assert out[1].avg_rank == 2


def test_surprisal_tiles_partition_per_language(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", f"w{i}") for i in range(12)]
    out = textops.surprisal_buckets(
        _ldocs(spark, rows), rank_cap=5, ref_mod=1, n_tiles=3).collect()
    for lang in ("en", "de"):
        tiers = sorted(r.bucket for r in out if r.lang == lang)
        assert tiers == [1, 1, 2, 2, 3, 3]
