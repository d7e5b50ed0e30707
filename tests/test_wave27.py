"""Wave-27 operators: cluster-aware split, layout pruning planner,
char diversity, tokenizer fertility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import dedup, maintenance, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# cluster_split
# ---------------------------------------------------------------------------

_TWIN = (
    "the quick brown fox jumps over the lazy dog and runs far away home "
    "again tonight while the moon rises slowly over the quiet hills"
)


def test_cluster_split_keeps_near_dups_in_one_fold(spark):
    rows = [
        (1, _TWIN),
        (2, _TWIN + " extra"),
        (3, "completely different text about spark shuffles and "
            "partitions with many unrelated words in this sentence here "
            "that share nothing with the fox story at all ever"),
    ]
    out = {r.doc_id: r for r in dedup.cluster_split(
        _docs(spark, rows), n_folds=5).collect()}
    assert len(out) == 3
    # the twins share a cluster -> same fold by construction
    assert out[1].cluster_id == out[2].cluster_id == 1
    assert out[1].fold == out[2].fold
    assert out[1].cluster_size == out[2].cluster_size == 2
    # the singleton is its own cluster
    assert out[3].cluster_id == 3 and out[3].cluster_size == 1
    assert all(0 <= r.fold < 5 for r in out.values())


def test_cluster_split_no_cross_fold_leakage_property(spark):
    # every verified near-dup pair must land in one fold: join the pair
    # table back to the assignment and assert fold_a == fold_b for all
    rows = [(i, _TWIN + f" variant {i % 2}") for i in range(8)] + [
        (100 + i, f"unique doc {i} " + " ".join(
            f"tok{i}w{j}" for j in range(30))) for i in range(4)
    ]
    docs = _docs(spark, rows)
    assign = dedup.cluster_split(docs, n_folds=3)
    pairs = dedup.minhash_lsh_neardups(docs).select("doc_a", "doc_b")
    leaked = (
        pairs.join(assign.select(F.col("doc_id").alias("doc_a"),
                                 F.col("fold").alias("fold_a")), "doc_a")
        .join(assign.select(F.col("doc_id").alias("doc_b"),
                            F.col("fold").alias("fold_b")), "doc_b")
        .filter(F.col("fold_a") != F.col("fold_b"))
    )
    assert pairs.count() > 0
    assert leaked.count() == 0


def test_cluster_split_rejects_bad_folds(spark):
    with pytest.raises(ValueError):
        dedup.cluster_split(_docs(spark, [(1, "x")]), n_folds=1)


# ---------------------------------------------------------------------------
# layout_pruning_audit
# ---------------------------------------------------------------------------


def test_layout_pruning_sorted_layout_prunes_point_probe(spark):
    # key perfectly correlated with nothing: k = i*10, nat = reversed
    rows = [(i, (99 - i) * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "nat long, k long")
    out = maintenance.layout_pruning_audit(
        df, "k", "nat", probes=[(0, 0, 99), (1, 5000, 5090), (2, -5, -1)],
        n_files=10,
    )
    rows_out = {(r.layout, r.probe_id): r for r in out.collect()}
    assert len(rows_out) == 6
    # keysorted: probe 0 covers k in [0,99] -> exactly 1 of 10 files
    ks0 = rows_out[("keysorted", 0)]
    assert ks0.files_total == 10 and ks0.files_touched == 1
    assert ks0.rows_matched == 10 and ks0.rows_scanned == 10
    assert ks0.skip_ppm == 900000 and ks0.waste_ppm == 0
    # natural layout is reverse-ordered on k -> equally prunable here
    # (k and nat are perfectly anti-correlated, each file spans 10 ks)
    nat0 = rows_out[("natural", 0)]
    assert nat0.files_touched == 1 and nat0.rows_scanned == 10
    # empty probe: zero files, zero rows, full skip
    e = rows_out[("keysorted", 2)]
    assert e.files_touched == 0 and e.rows_scanned == 0
    assert e.rows_matched == 0 and e.skip_ppm == 1000000 and e.waste_ppm == 0


def test_layout_pruning_random_key_touches_all_natural_files(spark):
    # natural order uncorrelated with key -> every natural file spans the
    # full key range and a narrow probe touches all of them
    import random

    rng = random.Random(7)
    ks = list(range(0, 1000))
    rng.shuffle(ks)
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(ks)], "nat long, k long")
    out = {(r.layout, r.probe_id): r for r in maintenance.layout_pruning_audit(
        df, "k", "nat", probes=[(0, 500, 509)], n_files=8).collect()}
    assert out[("natural", 0)].files_touched == 8
    assert out[("keysorted", 0)].files_touched == 1
    # read amplification collapses under the sorted layout
    assert (out[("keysorted", 0)].rows_scanned
            < out[("natural", 0)].rows_scanned)


# ---------------------------------------------------------------------------
# char_diversity
# ---------------------------------------------------------------------------


def test_char_diversity_hand_checked(spark):
    # "aab" -> n=3, counts {a:2, b:1}, ss=5 -> (9-5)*1e6//9 = 444444
    out = {r.doc_id: r for r in textops.char_diversity(
        _docs(spark, [(1, "aab"), (2, "aaaa"), (3, "abcd")]),
        low_ppm=500000).collect()}
    assert out[1].gini_ppm == 444444
    assert out[1].n_chars_norm == 3 and out[1].distinct_chars == 2
    assert out[1].top_char_ppm == 666666
    # degenerate doc: gini 0, flagged
    assert out[2].gini_ppm == 0 and bool(out[2].low_diversity)
    # all-distinct: (16-4)*1e6//16 = 750000, not flagged
    assert out[3].gini_ppm == 750000 and not out[3].low_diversity


def test_char_diversity_normalizes_case_and_whitespace(spark):
    # "A  a" normalizes to "a a" -> counts {a:2, ' ':1} == "aab" shape
    out = textops.char_diversity(_docs(spark, [(1, "A  a")])).collect()[0]
    assert out.n_chars_norm == 3 and out.distinct_chars == 2
    assert out.gini_ppm == 444444


def test_char_diversity_drops_empty_docs(spark):
    out = textops.char_diversity(
        _docs(spark, [(1, "   "), (2, "ok")])).collect()
    assert [r.doc_id for r in out] == [2]


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_sums_and_ratios(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb", "en"), (2, "aa", "en"), (3, "cc", "de")],
        "doc_id long, text string, lang string",
    )
    merges = textops.bpe_merges(docs, n_merges=2, batch=2, exact=True)
    out = {r.lang: r for r in textops.tokenizer_fertility(
        docs, merges).collect()}
    en, de = out["en"], out["de"]
    assert en.n_docs == 2 and en.n_words == 3 and de.n_docs == 1
    # bytes: utf-8 lengths of the raw texts
    assert en.n_bytes == 5 + 2 and de.n_bytes == 2
    # ratio identities hold exactly
    assert en.tokens_per_word_ppm == en.n_tokens * 1_000_000 // en.n_words
    assert de.bytes_per_token_ppm == de.n_bytes * 1_000_000 // de.n_tokens


def test_tokenizer_fertility_more_merges_never_raise_fertility(spark):
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3, "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    m0 = textops.bpe_merges(docs, n_merges=1, batch=1, exact=True)
    m8 = textops.bpe_merges(docs, n_merges=8, batch=4, exact=True)
    f0 = textops.tokenizer_fertility(docs, m0).collect()[0]
    f8 = textops.tokenizer_fertility(docs, m8).collect()[0]
    assert f8.tokens_per_word_ppm <= f0.tokens_per_word_ppm
