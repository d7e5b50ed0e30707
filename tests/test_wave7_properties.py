"""Property-based invariants for the wave-7 operators: span-dedup
against a plain-Python ground truth, fuzzy-join completeness vs
brute-force Levenshtein, and deterministic-shuffle permutation laws —
hypothesis-generated inputs, one small DataFrame per example (same
batching strategy as test_analytics_properties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_bulkload_service_spark.operators import curation, dedup

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _span_truth(docs: list[tuple[int, str]], k: int):
    """Python ground truth of span_dup_stats."""
    spans: dict[int, list[str]] = {}
    for d, t in docs:
        ws = t.split()
        spans[d] = (
            [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
            if len(ws) >= k
            else [t]
        )
    from collections import Counter

    tot = Counter(s for ss in spans.values() for s in ss)
    out = {}
    for d, ss in spans.items():
        dup = sum(1 for s in ss if tot[s] >= 2)
        out[d] = (len(ss), dup, dup * 1_000_000 // len(ss))
    return out


@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_span_dup_stats_matches_python_truth(spark, texts, k):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_span_ppm"])
        for r in dedup.span_dup_stats(df, k=k).collect()
    }
    assert got == _span_truth(docs, k)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_fuzzy_join_complete_and_sound(spark, names):
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "ck long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dedup.fuzzy_self_join_k1(df, "ck", "name").collect()
    }
    want = {
        (a, b): _lev(na, nb)
        for a, na in rows
        for b, nb in rows
        if a < b and _lev(na, nb) <= 1
    }
    assert got == want


@given(
    n=st.integers(1, 120),
    seed=st.integers(0, 5),
    shards=st.integers(1, 9),
)
@settings(**_SETTINGS)
def test_shuffle_is_a_permutation(spark, n, seed, shards):
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    rows = curation.deterministic_shuffle(
        df, seed=seed, n_shards=shards
    ).collect()
    assert len(rows) == n
    assert sorted(r["doc_id"] for r in rows) == list(range(n))
    seen = {}
    for r in rows:
        assert 0 <= r["shard"] < shards
        seen.setdefault(r["shard"], []).append(r["pos"])
    for poss in seen.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
