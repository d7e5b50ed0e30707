"""Property-based invariants for the wave-13 operators: grid fill vs a
Python forward-fill simulation, MAD outliers vs exact Python rank
selection, trend moments vs Python bigints, balanced oversample's exact
per-class budget, RRF vs a Python fusion, and k-core vs a Python peel —
hypothesis-generated inputs, one small DataFrame per example (the
test_codec_properties batching strategy)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from hbase_bulkload_service_spark.operators import (
    analytics,
    curation,
    graph,
    similarity,
    tsdb,
)

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    samples=st.lists(
        st.tuples(st.integers(0, 500), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    ),
    step=st.integers(1, 50),
)
@settings(**_SETTINGS)
def test_grid_fill_matches_python_simulation(spark, samples, step):
    rows = [("s", ts, v, i) for i, (ts, v) in enumerate(samples)]
    df = spark.createDataFrame(rows, "k string, ts long, v long, id long")
    out = {
        r["bucket"]: (r["filled"], r["is_observed"])
        for r in tsdb.grid_fill(df, "k", "ts", "v", "id", step).collect()
    }
    # python truth: last sample per bucket by (ts, id), then hold forward
    obs = {}
    for i, (ts, v) in enumerate(samples):
        b = ts // step
        if b not in obs or (ts, i) > obs[b][0]:
            obs[b] = ((ts, i), v)
    lo, hi = min(obs), max(obs)
    truth, held = {}, None
    for b in range(lo, hi + 1):
        if b in obs:
            held = obs[b][1]
            truth[b] = (held, True)
        else:
            truth[b] = (held, False)
    assert out == truth


@given(
    values=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    k=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_mad_matches_python_rank_selection(spark, values, k):
    df = spark.createDataFrame([("g", v) for v in values], "k string, v long")
    r = analytics.mad_outliers(df, "k", "v", k=k).collect()[0]
    n = len(values)
    med = sorted(values)[(n + 1) // 2 - 1]
    devs = sorted(abs(v - med) for v in values)
    mad = devs[(n + 1) // 2 - 1]
    n_out = sum(1 for v in values if abs(v - med) > k * mad)
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (n, med, mad, n_out)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10**4), st.integers(-10**4, 10**4)),
        min_size=1,
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_trend_moments_match_python_bigints(spark, pts):
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "k string, x long, y long"
    )
    r = analytics.group_trend(df, "k", "x", "y").collect()[0]
    xmin = min(x for x, _ in pts)
    xs = [x - xmin for x, _ in pts]
    ys = [y for _, y in pts]
    n = len(pts)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(a * a for a in xs) - sum(xs) ** 2
    assert (r["num"], r["den"]) == (num, den)
    assert den >= 0  # Cauchy-Schwarz: the denominator is never negative


@given(
    n_small=st.integers(1, 15),
    target=st.integers(1, 40),
    seed=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_oversample_budget_and_balance(spark, n_small, target, seed):
    df = spark.createDataFrame(
        [(i, "c") for i in range(n_small)], "doc_id long, cls string"
    )
    out = curation.balanced_oversample(
        df, "cls", "doc_id", target=target, seed=seed
    ).collect()
    assert len(out) == target  # exact budget, both directions
    per_key = {}
    for r in out:
        per_key[r["doc_id"]] = per_key.get(r["doc_id"], 0) + 1
    # every key's replica count is floor or ceil of target/n
    lo, hi = target // n_small, -(-target // n_small)
    assert all(c in (lo, hi) or (lo == 0 and c == 1) for c in per_key.values())
    assert len(per_key) == min(n_small, target)
    # rep ids are 1..count per key (a true multiset encoding)
    reps = {}
    for r in out:
        reps.setdefault(r["doc_id"], []).append(r["rep"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in reps.values())


@given(
    ranks_a=st.permutations(list(range(1, 7))),
    ranks_b=st.permutations(list(range(1, 7))),
    k_rrf=st.integers(0, 100),
)
@settings(**_SETTINGS)
def test_rrf_matches_python_fusion(spark, ranks_a, ranks_b, k_rrf):
    # candidates 0..5 ranked by two permutations
    a = spark.createDataFrame(
        [(1, r, c) for c, r in enumerate(ranks_a)],
        "query_id long, rank long, neighbor_id long",
    )
    b = spark.createDataFrame(
        [(1, r, c) for c, r in enumerate(ranks_b)],
        "query_id long, rank long, neighbor_id long",
    )
    out = similarity.rank_fusion([a, b], k_rrf=k_rrf, k_out=6).collect()
    scores = {}
    for perm in (ranks_a, ranks_b):
        for c, r in enumerate(perm):
            scores[c] = scores.get(c, 0) + 10**9 // (k_rrf + r)
    order = sorted(scores, key=lambda c: (-scores[c], c))
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == order
    assert all(r["rrf_score"] == scores[r["neighbor_id"]] for r in out)


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 4),
    rounds=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_kcore_matches_python_peel(spark, edges, k, rounds):
    pairs = spark.createDataFrame(list(edges), "doc_a long, doc_b long")
    out = {r["node"]: r["degree"] for r in
           graph.kcore_rounds(pairs, k=k, rounds=rounds).collect()}
    cur = set(edges)
    for _ in range(rounds):
        deg = {}
        for x, y in cur:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(x, y) for x, y in cur if x in keep and y in keep}
    truth = {}
    for x, y in cur:
        truth[x] = truth.get(x, 0) + 1
        truth[y] = truth.get(y, 0) + 1
    assert out == truth


@given(
    a_events=st.lists(st.integers(0, 50), min_size=0, max_size=15),
    b_events=st.lists(st.integers(0, 50), min_size=0, max_size=15),
)
@settings(**_SETTINGS)
def test_cogroup_merge_matches_python(spark, a_events, b_events):
    if not a_events and not b_events:
        return
    # unique ids across both streams make the merged order total
    ra = [(1, ts, i) for i, ts in enumerate(a_events)]
    rb = [(1, ts, 1000 + i) for i, ts in enumerate(b_events)]
    schema = "k long, ts long, id long"
    a = spark.createDataFrame(ra, schema) if ra else spark.createDataFrame([], schema)
    b = spark.createDataFrame(rb, schema) if rb else spark.createDataFrame([], schema)
    r = analytics.cogroup_merge_stats(a, b, "k", "ts", "id").collect()[0]
    merged = sorted(
        [(ts, i, "a") for _, ts, i in ra] + [(ts, i, "b") for _, ts, i in rb]
    )
    seq = "".join(s for _, _, s in merged)
    switches = sum(1 for x, y in zip(seq, seq[1:]) if x != y)
    assert (r["n_a"], r["n_b"], r["n_switches"]) == (
        len(a_events), len(b_events), switches
    )
    assert r["seq_md5"] == hashlib.md5(seq.encode()).hexdigest()
