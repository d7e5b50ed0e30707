"""Wave-7 operator invariants: exact substring-span dedup, SemDeDup-style
semantic dedup, the deterministic training-order shuffle, and BM25
ranked retrieval."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, dedup, similarity, textops


# ---------------------------------------------------------------------------
# span_dup_stats
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dup_planted_cross_doc(spark):
    shared = "alpha beta gamma delta"  # 4-word span, k=4
    rows = [
        (1, f"one two three {shared} four"),
        (2, f"{shared} five six seven"),
        (3, "eight nine ten eleven twelve"),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup.span_dup_stats(_docs(spark, rows), k=4).collect()
    }
    # doc 1: 8 words -> 5 spans, exactly one (the shared span) duplicated;
    # doc 2: 7 words -> 4 spans, one duplicated
    assert out[1]["n_spans"] == 5 and out[1]["dup_spans"] == 1
    assert out[2]["n_spans"] == 4 and out[2]["dup_spans"] == 1
    assert out[3]["dup_spans"] == 0
    assert out[1]["dup_span_ppm"] == 1_000_000 // 5


def test_span_dup_within_doc_repeat_counts_every_occurrence(spark):
    # the same 3-word span occurs twice INSIDE one doc -> both occurrences dup
    rows = [(1, "x y z q x y z")]
    out = dedup.span_dup_stats(_docs(spark, rows), k=3).collect()[0]
    # spans: "x y z", "y z q", "z q x", "q x y", "x y z" -> 5 spans, 2 dups
    assert out["n_spans"] == 5
    assert out["dup_spans"] == 2


def test_span_dup_short_doc_whole_text(spark):
    rows = [(1, "solo doc"), (2, "solo doc"), (3, "different entirely")]
    out = {
        r["doc_id"]: r
        for r in dedup.span_dup_stats(_docs(spark, rows), k=8).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["dup_spans"] == 1
    assert out[2]["dup_spans"] == 1
    assert out[3]["dup_spans"] == 0


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_lowest_id_wins(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid (every 50th id)
        (1, [0.99, 0.1, 0.0]),  # near-dup of 3's direction, lower id
        (3, [0.98, 0.11, 0.0]),  # dup of 1
        (7, [0.0, 1.0, 0.0]),   # different direction but see centroid note
    ]
    emb = _emb(spark, rows)
    cents = similarity.pseudo_centroids(emb, every=50)  # only vec 0
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(emb, 990_000, cents).collect()
    }
    # all assigned to the single cell; 0/1 close (cos ~ .995); 3 dups of 1
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert not out[3]["keep"] and out[3]["dup_of"] == 0 or out[3]["dup_of"] == 1
    assert out[7]["keep"]  # orthogonal to everything
    # verdict covers every input exactly once
    assert set(out) == {0, 1, 3, 7}


def test_semantic_dedup_threshold_excludes(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.1])]
    emb = _emb(spark, rows)
    out = similarity.semantic_dedup(
        emb, 900_000, similarity.pseudo_centroids(emb, every=1000)
    ).collect()
    assert all(r["keep"] for r in out)


# ---------------------------------------------------------------------------
# deterministic_shuffle
# ---------------------------------------------------------------------------

def test_shuffle_reproducible_and_complete(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = curation.deterministic_shuffle(df, seed=3, n_shards=16)
    b = curation.deterministic_shuffle(df.repartition(7), seed=3, n_shards=16)
    ra = sorted((r["doc_id"], r["shard"], r["pos"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["shard"], r["pos"]) for r in b.collect())
    assert ra == rb  # partitioning-independent, retry-safe
    assert len(ra) == 500
    # shards in range, pos dense 1..n per shard
    by_shard: dict[int, list[int]] = {}
    for _, sh, pos in ra:
        assert 0 <= sh < 16
        by_shard.setdefault(sh, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_new_seed_new_permutation(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = curation.deterministic_shuffle(df, seed=1, n_shards=8)
    b = curation.deterministic_shuffle(df, seed=2, n_shards=8)
    oa = [r["doc_id"] for r in a.orderBy("shard", "pos").collect()]
    ob = [r["doc_id"] for r in b.orderBy("shard", "pos").collect()]
    assert oa != ob
    assert sorted(oa) == sorted(ob) == list(range(300))


def test_shuffle_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    sizes = (
        curation.deterministic_shuffle(df, seed=5, n_shards=10)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(sizes) == 10
    for r in sizes:  # multinomial(2000, 1/10): ~200 +- 5 sigma
        assert 130 <= r["count"] <= 270


# ---------------------------------------------------------------------------
# bm25_scores
# ---------------------------------------------------------------------------

def _bm25_reference(docs: list[tuple[int, str]], terms: list[str], top_k: int):
    """Plain-Python ground truth of the integer-rational BM25."""
    words = {d: t.split() for d, t in docs}
    dls = {d: len(ws) for d, ws in words.items()}
    n_docs = len(docs)
    a10 = (10 * sum(dls.values())) // n_docs
    tfs = {
        (d, t): words[d].count(t)
        for d in words
        for t in terms
        if words[d].count(t) > 0
    }
    dfs = {t: sum(1 for (d2, t2) in tfs if t2 == t) for t in terms}
    scores: dict[int, int] = {}
    hits: dict[int, int] = {}
    for (d, t), tf in tfs.items():
        idf = (1_000 * (n_docs - dfs[t])) // (dfs[t] + 1)
        tfp = (1_000 * 22 * a10 * tf) // (10 * a10 * tf + 3 * a10 + 90 * dls[d])
        scores[d] = scores.get(d, 0) + idf * tfp
        hits[d] = hits.get(d, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [
        (i + 1, d, s, hits[d]) for i, (d, s) in enumerate(ranked)
    ]


def test_bm25_matches_reference(spark):
    docs = [
        (1, "spark vector vector vector stream"),
        (2, "window window stream other words here padding padding padding"),
        (3, "vector stream window"),
        (4, "nothing relevant at all"),
        (5, "vector " * 10 + "lots of other words " * 5),
    ]
    terms = ["vector", "stream", "window"]
    got = [
        (r["rank"], r["doc_id"], r["score"], r["n_terms_hit"])
        for r in textops.bm25_scores(_docs(spark, docs), terms, top_k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == _bm25_reference(docs, terms, 3)


def test_bm25_tf_saturates_short_doc_wins(spark):
    # same tf, shorter doc scores higher (length normalization)
    # (doc 3 keeps df < N: the rational idf — like the raw ln form with
    # floor at 0 — zeroes out a term present in every document)
    docs = [
        (1, "vector term " + "pad " * 50),
        (2, "vector term pad"),
        (3, "no match here"),
    ]
    out = {
        r["doc_id"]: r["score"]
        for r in textops.bm25_scores(_docs(spark, docs), ["vector"], top_k=5).collect()
    }
    assert out[2] > out[1]


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------

def test_incremental_dedup_verdicts(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated corpus content about something else entirely"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    ])
    batch = _docs(spark, [
        (101, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup -> 1
        (102, "the quick brown fox jumps over the lazy dog again and AGAIN extra"),  # near dup
        (103, "fresh new never seen text that matches nothing in the corpus"),  # keep
    ])
    out = {
        r["doc_id"]: (r["verdict"], r["match_doc"])
        for r in dedup.incremental_dedup(batch, corpus, jaccard_ppm=400_000).collect()
    }
    assert out[101] == ("exact_dup", 1)  # min corpus id wins over 3
    assert out[102][0] == "near_dup" and out[102][1] in (1, 3)
    assert out[103] == ("keep", None)
    assert set(out) == {101, 102, 103}


def test_incremental_dedup_directional(spark):
    # batch-internal duplicates are NOT flagged (self-dedup is a different op)
    corpus = _docs(spark, [(1, "corpus only text nothing like the batch")])
    batch = _docs(spark, [
        (101, "twin text repeated inside the new batch only"),
        (102, "twin text repeated inside the new batch only"),
    ])
    out = dedup.incremental_dedup(batch, corpus).collect()
    assert all(r["verdict"] == "keep" for r in out)


def test_incremental_dedup_exact_skips_near_layer(spark):
    # an exact dup must report the smallest matching corpus doc, and must
    # not be re-reported by the near layer
    corpus = _docs(spark, [(5, "same words here"), (9, "same words here")])
    batch = _docs(spark, [(100, "same words here")])
    out = dedup.incremental_dedup(batch, corpus).collect()
    assert len(out) == 1
    assert out[0]["verdict"] == "exact_dup" and out[0]["match_doc"] == 5


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_deterministic_and_monotone(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    w_lo = F.lit(200_000)
    w_hi = F.lit(400_000)
    lo1 = {r["doc_id"] for r in curation.weighted_sample(df, w_lo, seed=1).collect()}
    lo2 = {r["doc_id"] for r in curation.weighted_sample(df.repartition(5), w_lo, seed=1).collect()}
    hi = {r["doc_id"] for r in curation.weighted_sample(df, w_hi, seed=1).collect()}
    assert lo1 == lo2          # rerun/repartition keeps the identical subset
    assert lo1 <= hi           # nested rates -> nested samples
    assert 0.15 < len(lo1) / 4000 < 0.25   # ~20% +- 5sigma
    assert 0.35 < len(hi) / 4000 < 0.45    # ~40%
    other_seed = {r["doc_id"] for r in curation.weighted_sample(df, w_lo, seed=2).collect()}
    assert other_seed != lo1   # fresh seed, fresh draw


def test_weighted_sample_clamps(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    none = curation.weighted_sample(df, F.lit(-5)).count()
    everything = curation.weighted_sample(df, F.lit(2_000_000)).count()
    assert none == 0
    assert everything == 100


# ---------------------------------------------------------------------------
# fuzzy_self_join_k1
# ---------------------------------------------------------------------------

def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_bruteforce(spark):
    names = [
        (1, "Customer#001"), (2, "Customer#002"), (3, "Customer#011"),
        (4, "Xustomer#001"), (5, "totally different"), (6, "Customer#0011"),
        (7, "Customer#001"),  # exact dup of 1 -> dist 0
        (8, "ab"), (9, "b"), (10, "a"),
    ]
    df = spark.createDataFrame(names, "ck long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.fuzzy_self_join_k1(df, "ck", "name").collect()
    )
    want = sorted(
        (a, b, _levenshtein(sa, sb))
        for (a, sa) in names
        for (b, sb) in names
        if a < b and _levenshtein(sa, sb) <= 1
    )
    assert got == want


def test_fuzzy_join_no_distance2_leak(spark):
    # delete+insert at different positions collides in the neighborhood
    # ("abc" -> "bc" <- "bbc"? no;  "abcd" vs "bcda" shares "bcd") — the
    # levenshtein verify must drop such distance-2 pairs
    df = spark.createDataFrame([(1, "abcd"), (2, "bcda")], "ck long, name string")
    assert dedup.fuzzy_self_join_k1(df, "ck", "name").count() == 0


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------

def test_event_transitions_counts_and_shares(spark):
    from hbase_bulkload_service_spark.operators import analytics
    rows = [
        # user 1: a -> b -> a   user 2: a -> a    user 3: b (no transition)
        (1, 1, "a", 100), (2, 1, "b", 200), (3, 1, "a", 300),
        (4, 2, "a", 100), (5, 2, "a", 150),
        (6, 3, "b", 100),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts_ms long")
    out = {
        (r["from_type"], r["to_type"]): (r["cnt"], r["share_ppm"])
        for r in analytics.event_transitions(ev).collect()
    }
    assert out == {
        ("a", "b"): (1, 500_000),
        ("a", "a"): (1, 500_000),
        ("b", "a"): (1, 1_000_000),
    }


def test_event_transitions_tiebreak_deterministic(spark):
    from hbase_bulkload_service_spark.operators import analytics
    # same ts: event_id orders them -> a(1) then b(2)
    rows = [(1, 1, "a", 100), (2, 1, "b", 100)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts_ms long")
    out = analytics.event_transitions(ev).collect()
    assert len(out) == 1 and out[0]["from_type"] == "a" and out[0]["to_type"] == "b"


# ---------------------------------------------------------------------------
# perceptual-hash near-dups
# ---------------------------------------------------------------------------

def test_phash_deterministic_and_close_payloads_close_hashes(spark):
    from hbase_bulkload_service_spark.operators import multimodal as mm
    base = "x" * 64 + "A" * 64  # strong contrast: half low, half high bytes
    tweaked = "x" * 64 + "A" * 63 + "B"  # one byte changed
    df = spark.createDataFrame(
        [(1, base), (2, tweaked), (3, base)], "doc_id long, text string"
    )
    media = mm.attach_media(df)
    sigs = {r["doc_id"]: r["bands"] for r in mm.phash_signature(media).collect()}
    assert sigs[1] == sigs[3]                      # deterministic
    # 3 docs -> derived band width floors at 15 (kernel default = 60 cells)
    assert mm.phash_band_bits_for(3) == 15
    assert sigs[1] == mm._phash_bands(base.encode(), 15)  # matches the kernel
    drift = sum(bin(x ^ y).count("1") for x, y in zip(sigs[1], sigs[2]))
    assert drift <= 2                                # 1-byte tweak: tiny drift


def test_phash_neardups_pigeonhole_recall(spark):
    from hbase_bulkload_service_spark.operators import multimodal as mm
    import itertools, random
    rng = random.Random(5)
    texts = [
        "".join(rng.choice("abcXYZ") for _ in range(48)) for _ in range(30)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in mm.phash_neardups(mm.attach_media(df), max_hamming=3).collect()
    }
    # ground truth: brute-force over the stub kernel
    sigs = [mm._phash_stub(t.encode()) for t in texts]
    want = {
        (a, b)
        for a, b in itertools.combinations(range(30), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == want  # blocking is EXACT for hamming <= bands-1


def test_phash_rejects_unblockable_radius(spark):
    from hbase_bulkload_service_spark.operators import multimodal as mm
    import pytest as pt
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pt.raises(ValueError):
        mm.phash_neardups(mm.attach_media(df), max_hamming=4)


# ---------------------------------------------------------------------------
# bpe_merges
# ---------------------------------------------------------------------------

def _bpe_reference(word_counts: dict[str, int], n_merges: int):
    """Plain-Python BPE ground truth (Sennrich-style)."""
    seqs = {w: list(w) + ["</w>"] for w in word_counts}
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        counts = {p: c for p, c in counts.items() if c >= 2}
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, c))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


def test_bpe_matches_reference(spark):
    corpus = "low low low low low lower lower newest newest newest newest newest newest widest widest widest"
    counts = {}
    for w in corpus.split():
        counts[w] = counts.get(w, 0) + 1
    docs = _docs(spark, [(1, corpus)])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in textops.bpe_merges(docs, n_merges=6).orderBy("rank").collect()
    ]
    assert got == _bpe_reference(counts, 6)


def test_bpe_overlapping_run_merges_left_to_right(spark):
    # "aaaa": merge (a,a) counts 3 overlapping pairs but applies as [aa, aa]
    docs = _docs(spark, [(1, "aaaa aaaa aaaa")])
    got = [
        (r["rank"], r["left"], r["right"])
        for r in textops.bpe_merges(docs, n_merges=2).orderBy("rank").collect()
    ]
    counts = {"aaaa": 3}
    want = [(r, l, rr) for r, l, rr, _ in _bpe_reference(counts, 2)]
    assert got == want


def test_bpe_stops_when_dry(spark):
    docs = _docs(spark, [(1, "ab cd ef")])  # no pair repeats (all cnt 1)
    assert textops.bpe_merges(docs, n_merges=5).count() == 0


def test_bpe_encode_matches_reference_token_counts(spark):
    corpus = "low low lower newest newest newest widest"
    docs = _docs(spark, [(1, corpus), (2, "low newest")])
    merges = textops.bpe_merges(docs, n_merges=4)
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in textops.bpe_encode(docs, merges).collect()
    }
    # python reference: re-learn on the same corpus, apply to each doc
    wc: dict[str, int] = {}
    for d in (corpus, "low newest"):
        for w in d.split():
            wc[w] = wc.get(w, 0) + 1
    learned = _bpe_reference(wc, 4)
    def encode(word: str) -> int:
        syms = list(word) + ["</w>"]
        for _, l, r, _c in learned:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r); i += 2
                else:
                    merged.append(syms[i]); i += 1
            syms = merged
        return len(syms)
    for doc_id, text in ((1, corpus), (2, "low newest")):
        ws = text.split()
        assert out[doc_id] == (len(ws), sum(encode(w) for w in ws))


def test_bpe_batched_exact_equals_sequential(spark):
    # chain-heavy corpus (the worst case for batching): the exact guard
    # must stop batches whenever a freshly created pair could out-rank a
    # later accepted one — output must still equal the sequential walk.
    corpus = (
        "low low low low low lower lower newest newest newest newest "
        "newest newest widest widest widest the the the the there there"
    )
    counts: dict[str, int] = {}
    for w in corpus.split():
        counts[w] = counts.get(w, 0) + 1
    docs = _docs(spark, [(1, corpus)])
    want = _bpe_reference(counts, 40)
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in textops.bpe_merges(docs, n_merges=40, batch=16)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    # batching must actually shorten the walk vs one merge per round
    assert textops._LAST_BPE_ROUNDS < len(want)


def test_bpe_skip_scan_batches_fill(spark):
    # diverse vocabulary: the non-exact skip-scan should pack many
    # disjoint merges per round (bounded by symbol sharing, not by 1).
    import random

    rng = random.Random(7)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
        for _ in range(300)
    ]
    text = " ".join(vocab[rng.randrange(len(vocab))] for _ in range(4000))
    docs = _docs(spark, [(1, text)])
    out = textops.bpe_merges(docs, n_merges=60, batch=32, exact=False)
    rows = out.orderBy("rank").collect()
    assert len(rows) == 60
    assert [r["rank"] for r in rows] == list(range(1, 61))
    assert all(r["pair_count"] >= 2 for r in rows)
    # >= 4 merges per round on average for this corpus shape
    assert textops._LAST_BPE_ROUNDS <= 15


def test_bpe_pandas_apply_path_matches_jvm_fold(spark):
    # force the Arrow-batched apply (len(batch) > _JVM_CHAIN_MAX) and pin
    # it against the chained JVM fold on the same merge list.
    from pyspark.sql import functions as F

    merges = [
        ("a", "b", 9), ("c", "d", 9), ("e", "f", 9), ("g", "h", 9),
        ("i", "j", 9), ("k", "l", 9), ("m", "n", 9), ("o", "p", 9),
        ("ab", "cd", 9), ("ef", "gh", 9),
    ]
    assert len(merges) > textops._JVM_CHAIN_MAX
    df = spark.createDataFrame(
        [(list("abcdefgh"),), (list("abab"),), (["x", "a", "b", "c", "d"],), ([],)],
        "syms array<string>",
    )
    jvm = df.select(
        F.col("syms"),
        textops._apply_merges_col(F.col("syms"), merges[: textops._JVM_CHAIN_MAX])
        .alias("out"),
    )
    # apply remaining merges via a second JVM chain for the ground truth
    jvm = jvm.select(
        "syms",
        textops._apply_merges_col(
            F.col("out"), merges[textops._JVM_CHAIN_MAX:]
        ).alias("out"),
    )
    pdu = df.select(
        "syms", textops._apply_merges_col(F.col("syms"), merges).alias("out")
    )
    want = {tuple(r["syms"]): r["out"] for r in jvm.collect()}
    got = {tuple(r["syms"]): r["out"] for r in pdu.collect()}
    assert got == want


def test_bpe_encode_no_merges_is_chars_plus_marker(spark):
    docs = _docs(spark, [(1, "ab c")])
    empty = textops.bpe_merges(_docs(spark, [(9, "q w e")]), n_merges=3)  # dry
    out = textops.bpe_encode(docs, empty).collect()[0]
    assert (out["n_words"], out["n_tokens"]) == (2, 3 + 2)  # "ab</w>","c</w>" -> 3+2 symbols


# ---------------------------------------------------------------------------
# collect_file_stats
# ---------------------------------------------------------------------------

def test_collect_file_stats_per_file_truth(spark, tmp_path):
    from hbase_bulkload_service_spark.operators import maintenance
    d = str(tmp_path / "zm")
    spark.createDataFrame([(1, 10), (2, 20)], "k long, v long").coalesce(1)\
        .write.mode("overwrite").parquet(d + "/part=a")
    spark.createDataFrame([(7, 70), (9, 90)], "k long, v long").coalesce(1)\
        .write.mode("append").parquet(d + "/part=b")
    out = maintenance.collect_file_stats(spark, d, ["k", "v"]).collect()
    assert len(out) == 2  # one manifest row per file
    by_part = {("part=a" in r["file"]): r for r in out}
    a, b = by_part[True], by_part[False]
    assert (a["n_rows"], a["min_k"], a["max_k"], a["min_v"], a["max_v"]) == (2, 1, 2, 10, 20)
    assert (b["n_rows"], b["min_k"], b["max_k"], b["min_v"], b["max_v"]) == (2, 7, 9, 70, 90)


def test_incremental_dedup_overlapping_id_spaces(spark):
    # batch doc 1 shares its id with an unrelated corpus doc 1 — the near
    # layer must compare BATCH text against CORPUS text, never cross-wire
    corpus = _docs(spark, [
        (1, "corpus text one about databases and storage engines"),
        (2, "the shared near duplicate text lives here in the corpus today"),
    ])
    batch = _docs(spark, [
        (1, "the shared near duplicate text lives here in the corpus now"),
    ])
    out = dedup.incremental_dedup(batch, corpus, jaccard_ppm=400_000).collect()
    assert len(out) == 1
    assert out[0]["verdict"] == "near_dup" and out[0]["match_doc"] == 2


# ---------------------------------------------------------------------------
# graph: degrees / triangle_counts
# ---------------------------------------------------------------------------

def test_triangle_counts_known_graphs(spark):
    from hbase_bulkload_service_spark.operators import graph
    # K4 + pendant: every K4 node in C(3,2)=3 triangles, pendant in none
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted(
        (r["node"], r["triangles"]) for r in graph.triangle_counts(df).collect()
    )
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]
    # triangle-free star: no output rows
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    assert graph.triangle_counts(star).count() == 0


def test_triangle_counts_random_vs_bruteforce(spark):
    from hbase_bulkload_service_spark.operators import graph
    import itertools, random
    rng = random.Random(11)
    nodes = list(range(12))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)}
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["triangles"] for r in graph.triangle_counts(df).collect()
    }
    es = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_degrees(spark):
    from hbase_bulkload_service_spark.operators import graph
    df = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    got = {r["node"]: r["degree"] for r in graph.degrees(df).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def _pagerank_reference(edges: list[tuple[int, int]], iters: int):
    """Integer-exact Python twin of graph.pagerank."""
    from hbase_bulkload_service_spark.operators.graph import PR_MASS
    adj: dict[int, list[int]] = {}
    for x, y in edges:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    n = len(adj)
    tele = (15 * PR_MASS // 100) // n
    r = {v: PR_MASS // n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(r[u] // len(adj[u]) for u in adj[v])
            nxt[v] = tele + (85 * s) // 100
        r = nxt
    return r


def test_pagerank_matches_integer_reference(spark):
    from hbase_bulkload_service_spark.operators import graph
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (1, 6)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["rank_ppb"] for r in graph.pagerank(df, iters=4).collect()}
    assert got == _pagerank_reference(edges, 4)
    # hub 3 (degree 4) outranks the pendant 6
    assert got[3] > got[6]


def test_pagerank_symmetric_graph_uniform(spark):
    from hbase_bulkload_service_spark.operators import graph
    # a 4-cycle is vertex-transitive: all ranks identical
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ranks = {r["rank_ppb"] for r in graph.pagerank(df, iters=3).collect()}
    assert len(ranks) == 1
