"""Property-based invariants for the wave-32/33 feature operators:
KS drift vs a pure-Python reference + axioms, funnel_path vs a
sequential per-key replay, behavior_bitmask vs Python sets, top_dims vs
a numpy-free argsort reference, and LOO encoding's exact formula.
Batched (one small DataFrame per example), mirroring
test_analytics_properties' strategy."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_bulkload_service_spark.operators import analytics, similarity
import pytest

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _ks_reference(a: list[int], b: list[int]) -> tuple[int, int]:
    """Exact D numerator max|cum_a*n_b - cum_b*n_a| over distinct values."""
    na, nb = len(a), len(b)
    best = 0
    for x in sorted(set(a) | set(b)):
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * nb - cb * na))
    return best, na * nb


@given(
    a=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    b=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_ks_drift_matches_reference_and_axioms(spark, a, b):
    rows = [("k", "a", v) for v in a] + [("k", "b", v) for v in b]
    df = spark.createDataFrame(rows, "k string, cohort string, v long")
    r = analytics.ks_drift(df, "k", "cohort", "v").collect()[0]
    d_num, denom = _ks_reference(a, b)
    assert (r["n_a"], r["n_b"], r["d_num"]) == (len(a), len(b), d_num)
    assert r["d_ppm"] == d_num * 1_000_000 // denom
    assert 0 <= r["d_ppm"] <= 1_000_000
    # symmetry: swapping cohorts leaves D unchanged
    swapped = [("k", "b", v) for v in a] + [("k", "a", v) for v in b]
    df2 = spark.createDataFrame(swapped, "k string, cohort string, v long")
    r2 = analytics.ks_drift(df2, "k", "cohort", "v").collect()[0]
    assert r2["d_num"] == r["d_num"]


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),               # user
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(0, 100),             # ts
        ),
        min_size=1,
        max_size=40,
    ),
    within=st.integers(1, 120),
)
@settings(**_SETTINGS)
def test_funnel_path_matches_sequential_replay(spark, events, within):
    df = spark.createDataFrame(events, "u long, t string, ts long")
    got = {
        r["u"]: (r["ts_0"], r["ts_1"], r["ts_2"], r["converted"])
        for r in analytics.funnel_path(
            df, "u", "t", "ts", ("s1", "s2", "s3"), within_ms=within
        ).collect()
    }
    # reference: per user, earliest s1; earliest s2 strictly after; ...
    users = {u for u, _, _ in events}
    for u in users:
        mine = [(t, ts) for uu, t, ts in events if uu == u]
        t0 = min((ts for t, ts in mine if t == "s1"), default=None)
        if t0 is None:
            assert u not in got  # never entered the funnel
            continue
        t1 = min((ts for t, ts in mine if t == "s2" and ts > t0), default=None)
        t2 = (
            min((ts for t, ts in mine if t == "s3" and ts > t1), default=None)
            if t1 is not None
            else None
        )
        conv = t2 is not None and (t2 - t0) <= within
        assert got[u] == (t0, t1, t2, conv)


@given(
    events=st.lists(
        st.tuples(st.integers(1, 5), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_behavior_bitmask_matches_sets(spark, events):
    bits = {"x": 1, "y": 2, "z": 4}
    df = spark.createDataFrame(events, "u long, t string")
    got = {
        r["mask"]: r["n_keys"]
        for r in analytics.behavior_bitmask(df, "u", "t", bits).collect()
    }
    import collections

    per_user: dict[int, int] = collections.defaultdict(int)
    for u, t in events:
        per_user[u] |= bits[t]
    truth = collections.Counter(per_user.values())
    assert got == dict(truth)


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=20
    ),
    k=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_top_dims_matches_argsort_reference(spark, vec, k):
    import math

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    got = [
        (r["rnk"], r["dim_idx"], r["micro"])
        for r in similarity.top_dims(df, "vec_id", "embedding", k=k).collect()
    ]
    micros = [math.floor(float(x) * 1_000_000) for x in vec]
    order = sorted(range(len(vec)), key=lambda i: (-abs(micros[i]), i))[:k]
    want = [(r + 1, i, micros[i]) for r, i in enumerate(order)]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 1)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_loo_encoding_formula(spark, rows):
    data = [(i, c, t) for i, (c, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, cat string, t long")
    got = {
        r["id"]: r["loo_ppm"]
        for r in analytics.loo_target_encoding(df, "cat", "t", ("id",)).collect()
    }
    for i, (c, t) in enumerate(rows):
        n = sum(1 for cc, _ in rows if cc == c)
        s = sum(tt for cc, tt in rows if cc == c)
        want = None if n == 1 else (s - t) * 1_000_000 // (n - 1)
        assert got[i] == want


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000), st.integers(0, 50)),
        min_size=1,
        max_size=30,
    ),
    horizons=st.lists(st.integers(1, 500), min_size=1, max_size=3, unique=True),
)
@settings(**_SETTINGS)
def test_trailing_features_matches_reference(spark, rows, horizons):
    df = spark.createDataFrame(rows, "k long, ts long, v long")
    got = {
        r["k"]: r
        for r in analytics.trailing_features(df, "k", "ts", "v", horizons).collect()
    }
    ref = max(ts for _, ts, _ in rows)
    keys = {k for k, _, _ in rows}
    for k in keys:
        mine = [(ts, v) for kk, ts, v in rows if kk == k]
        assert got[k]["n_total"] == len(mine)
        assert got[k]["sum_total"] == sum(v for _, v in mine)
        for h in horizons:
            inside = [(ts, v) for ts, v in mine if ts > ref - h]
            assert got[k][f"n_{h}"] == len(inside)
            assert got[k][f"sum_{h}"] == sum(v for _, v in inside)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["g", "h"]), st.integers(-100, 100),
                  st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_moment_profile_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r["k"]: r for r in analytics.moment_profile(df, "k", "x", "y").collect()
    }
    for k in {k for k, _, _ in rows}:
        xs = [(x, y) for kk, x, y in rows if kk == k]
        assert got[k]["n"] == len(xs)
        assert got[k]["sum_x"] == sum(x for x, _ in xs)
        assert got[k]["sum_y"] == sum(y for _, y in xs)
        assert got[k]["sum_xx"] == sum(x * x for x, _ in xs)
        assert got[k]["sum_yy"] == sum(y * y for _, y in xs)
        assert got[k]["sum_xy"] == sum(x * y for x, y in xs)


@given(
    feed_a=st.dictionaries(st.integers(1, 8), st.text("ab", min_size=1, max_size=3),
                           max_size=6),
    feed_b=st.dictionaries(st.integers(1, 8), st.text("cd", min_size=1, max_size=3),
                           max_size=6),
    feed_c=st.dictionaries(st.integers(1, 8), st.integers(0, 99), max_size=6),
)
@settings(**_SETTINGS)
def test_golden_record_matches_dict_merge(spark, feed_a, feed_b, feed_c):
    from hbase_bulkload_service_spark.operators import curation

    if not (feed_a or feed_b or feed_c):
        return  # at least one feed must carry rows for a frame schema
    a = spark.createDataFrame(
        list(feed_a.items()) or [(None, None)], "k long, name string"
    ).filter("k IS NOT NULL")
    b = spark.createDataFrame(
        list(feed_b.items()) or [(None, None)], "k long, name string"
    ).filter("k IS NOT NULL")
    c = spark.createDataFrame(
        list(feed_c.items()) or [(None, None)], "k long, extra long"
    ).filter("k IS NOT NULL")
    out = {
        r["k"]: (r["name"], r["extra"])
        for r in curation.golden_record_merge(
            "k", [(a, ["name"]), (b, ["name"]), (c, ["extra"])]
        ).collect()
    }
    keys = set(feed_a) | set(feed_b) | set(feed_c)
    want = {
        k: (feed_a.get(k, feed_b.get(k)), feed_c.get(k)) for k in keys
    }
    assert out == want  # priority coalesce + full-outer key survival
