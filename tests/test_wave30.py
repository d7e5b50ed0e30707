"""Wave-30 operators: winnowing fingerprints, majority-vote label
aggregation, vocabulary concentration (the SNAPPY container gate is
covered by test_hfilev3's codec matrix + q221)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import quality, textops


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------

def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _reference_winnow(words, k, w):
    """Straight-from-the-paper reference: k-gram hashes, window minima,
    rightmost tie-break, distinct (pos, hash) set."""
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)] if len(words) >= k else []
    hs = [_h32(g) for g in grams]
    if not hs:
        return 0, 0, set()
    nwin = 1 if len(hs) < w else len(hs) - w + 1
    sel = set()
    for start in range(nwin):
        win = hs[start : start + w]
        m = min(win)
        # rightmost occurrence of the minimum
        pos = start + max(j for j, v in enumerate(win) if v == m)
        sel.add(f"{pos}:{m}")
    return len(hs), nwin, sel


@pytest.mark.parametrize(
    "text",
    [
        "a b c d e f g h i j",
        "x x x x x x x x",                      # all-equal hashes: tie-breaks
        "one two three four",                    # exactly k words -> 1 gram
        "too short",                             # < k words -> zeros
        "repeat me repeat me repeat me repeat me please",
    ],
)
def test_winnowing_matches_reference_implementation(spark, text):
    k, w = 4, 3
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = textops.winnowing_fingerprints(docs, k=k, window=w).collect()[0]
    n_g, nwin, ref = _reference_winnow(text.split(), k, w)
    assert r.n_grams == n_g
    assert r.n_windows == (nwin if n_g else 0)
    assert r.n_fingerprints == len(ref)
    want = hashlib.md5(",".join(sorted(ref)).encode()).hexdigest()
    assert r.fp_digest == want


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee: two docs sharing >= k + window - 1
    consecutive words share at least one fingerprint hash."""
    k, w = 4, 3
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = k + w - 1 words
    docs = spark.createDataFrame(
        [(1, "xx yy " + shared + " zz"), (2, shared + " aa bb cc")],
        "doc_id long, text string",
    )
    out = textops.winnowing_fingerprints(docs, k=k, window=w).collect()
    # digests differ (positions differ) but the HASH sets must intersect
    sets = []
    for r in sorted(out, key=lambda x: x.doc_id):
        n_g, nwin, ref = _reference_winnow(
            (("xx yy " + shared + " zz") if r.doc_id == 1 else (shared + " aa bb cc")).split(), k, w
        )
        assert r.n_fingerprints == len(ref)
        sets.append({s.split(":")[1] for s in ref})
    assert sets[0] & sets[1], "shared substring produced no shared fingerprint"


def test_winnowing_is_fully_map_side(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f") for i in range(20)],
        "doc_id long, text string",
    )
    plan = textops.winnowing_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # arrays only, never an explode


# ---------------------------------------------------------------------------
# label_majority
# ---------------------------------------------------------------------------

def test_label_majority_basic_and_tie_break(spark):
    votes = spark.createDataFrame(
        [
            (1, 0, "en"), (1, 1, "en"), (1, 2, "de"),            # majority en
            (2, 0, "fr"), (2, 1, "es"),                          # tie -> es (lexicographic)
            (3, 0, "zh"), (3, 1, "zh"), (3, 2, "zh"),            # unanimous
        ],
        "doc_id long, annotator long, label string",
    )
    out = {r.doc_id: r for r in quality.label_majority(votes).collect()}
    assert out[1].maj_label == "en" and out[1].maj_votes == 2 and not out[1].unanimous
    assert out[2].maj_label == "es" and out[2].maj_votes == 1
    assert out[3].unanimous and out[3].n_votes == 3


def test_label_majority_single_pass_no_join(spark):
    votes = spark.createDataFrame(
        [(1, 0, "en")], "doc_id long, annotator long, label string"
    )
    plan = quality.label_majority(votes)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------------------
# vocab_concentration
# ---------------------------------------------------------------------------

def test_vocab_concentration_hand_checked(spark):
    # counts: a=4, b=2, c=1, d=1 -> total 8, vocab 4
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "a d")],
        "doc_id long, text string",
    )
    out = {r.k: r for r in textops.vocab_concentration(docs, ks=(1, 2, 100)).collect()}
    assert out[1].cum_cnt == 4 and out[1].share_ppm == 500_000
    assert out[2].cum_cnt == 6 and out[2].share_ppm == 750_000
    assert out[100].cum_cnt == 8 and out[100].share_ppm == 1_000_000  # saturates
    assert out[1].n_vocab == 4 and out[1].n_tokens == 8


def test_vocab_concentration_tie_order_is_deterministic(spark):
    # b and c tie at 2; k=2 must take a(3) then b (lexicographic)
    docs = spark.createDataFrame(
        [(1, "a a a b b c c")], "doc_id long, text string"
    )
    out = {r.k: r for r in textops.vocab_concentration(docs, ks=(2,)).collect()}
    assert out[2].cum_cnt == 5


def test_vocab_concentration_empty_corpus_matches_oracle_shape(spark):
    """Zero-token corpus emits ZERO rows (the oracle's ks CROSS JOIN top
    over an empty top) — not len(ks) NULL-filled rows (ADVICE r07)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert textops.vocab_concentration(empty, ks=(1, 10)).count() == 0
    blank = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    assert textops.vocab_concentration(blank, ks=(1, 10)).count() == 0


def test_vocab_concentration_topk_is_take_ordered(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textops.vocab_concentration(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_winnowing_hypothesis_vs_reference(spark):
    """Randomized word sequences (small alphabet -> heavy hash ties and
    repeated grams) must match the straight-from-the-paper reference on
    counts AND the digest-pinned selected set."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "ab", "zz"])
    cases = []

    @settings(max_examples=30, deadline=None)
    @given(st.lists(word, min_size=0, max_size=24))
    def collect(ws):
        cases.append(" ".join(ws))

    collect()
    k, w = 3, 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.winnowing_fingerprints(docs, k=k, window=w).collect()}
    for i, t in enumerate(cases):
        words = [x for x in t.split() if x]
        n_g, nwin, ref = _reference_winnow(words, k, w)
        r = out[i]
        assert r.n_grams == n_g, (t, r)
        assert r.n_windows == (nwin if n_g else 0), (t, r)
        assert r.n_fingerprints == len(ref), (t, r)
        want = hashlib.md5(",".join(sorted(ref)).encode()).hexdigest()
        assert r.fp_digest == want, (t, r)


def test_label_majority_invariant_under_vote_permutation(spark):
    """The verdict is a pure function of the multiset of votes — row
    order and annotator ids must not matter."""
    votes = [
        (1, 0, "en"), (1, 1, "de"), (1, 2, "en"), (1, 3, "fr"), (1, 4, "en"),
        (2, 0, "zz"), (2, 1, "aa"),
    ]
    import random

    rng = random.Random(13)
    outs = []
    for _ in range(3):
        perm = votes[:]
        rng.shuffle(perm)
        perm = [(d, 99 - a, l) for d, a, l in perm]  # relabel annotators
        df = spark.createDataFrame(
            perm, "doc_id long, annotator long, label string"
        )
        outs.append(
            sorted(
                (r.doc_id, r.maj_label, r.n_votes, r.maj_votes, r.unanimous)
                for r in quality.label_majority(df).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert outs[0][0] == (1, "en", 5, 3, False)
    assert outs[0][1] == (2, "aa", 2, 1, False)  # tie -> smallest label


def test_vocab_concentration_monotone_and_saturating(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common common w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    out = {r.k: r for r in textops.vocab_concentration(docs, ks=(1, 2, 5, 50)).collect()}
    ks = sorted(out)
    # cumulative share is nondecreasing in k and saturates at 1e6 ppm
    for a, b in zip(ks, ks[1:]):
        assert out[a].cum_cnt <= out[b].cum_cnt
        assert out[a].share_ppm <= out[b].share_ppm
    assert out[50].cum_cnt == out[50].n_tokens
    assert out[50].share_ppm == 1_000_000
    # all rows agree on the corpus totals
    assert len({(r.n_vocab, r.n_tokens) for r in out.values()}) == 1
