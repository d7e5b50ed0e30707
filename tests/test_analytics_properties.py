"""Property-based invariants for the q94-q100 operator wave: histogram
totals/bounds, retention keep-counts, and counter-delta telescoping over
hypothesis-generated inputs (batched — one small DataFrame per example,
mirroring test_codec_properties' strategy)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, maintenance
import pytest

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    lo=st.integers(-1000, 1000),
    width=st.integers(1, 5000),
    nb=st.integers(1, 20),
)
@settings(**_SETTINGS)
def test_histogram_partitions_every_row(spark, values, lo, width, nb):
    hi = lo + width * nb  # any hi > lo; w = ceil((hi-lo)/nb) = width
    df = spark.createDataFrame([("k", v) for v in values], "key string, v long")
    rows = analytics.fixed_width_histogram(df, "key", "v", lo, hi, nb).collect()
    assert sum(r["cnt"] for r in rows) == len(values)  # no drops, ever
    for r in rows:
        assert 0 <= r["bucket"] < nb
        assert r["bucket_hi"] - r["bucket_lo"] == width
        assert r["bucket_lo"] == lo + r["bucket"] * width
    # python ground truth for the bucket of each value
    import collections

    truth = collections.Counter(
        min(nb - 1, max(0, (v - lo) // width)) for v in values
    )
    assert {r["bucket"]: r["cnt"] for r in rows} == dict(truth)


@given(
    n_versions=st.integers(1, 12),
    max_versions=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_retention_keeps_min_of_n_and_cap(spark, n_versions, max_versions):
    rows = [("k", "q", 1000 + i, float(i), i) for i in range(n_versions)]
    df = spark.createDataFrame(
        rows,
        "rowkey string, qualifier string, version_ts long, dvalue double, event_id long",
    )
    out = maintenance.retention_flags(
        df, max_versions=max_versions, tiebreak_cols=("event_id",)
    ).collect()
    kept = [r for r in out if r["retain_state"] == "kept"]
    assert len(kept) == min(n_versions, max_versions)
    # kept versions are exactly the newest ones
    assert {r["version_ts"] for r in kept} == set(
        sorted((r["version_ts"] for r in out), reverse=True)[
            : min(n_versions, max_versions)
        ]
    )
    # ranks are a permutation of 1..n
    assert sorted(r["version_rank"] for r in out) == list(range(1, n_versions + 1))


def test_counter_deltas_telescope_random(spark):
    import random

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(2, 50)
        ts = rng.sample(range(10**6), n)
        rows = [
            ("m", 1, i, t, rng.randint(-10**4, 10**4))
            for i, t in enumerate(ts)
        ]
        df = spark.createDataFrame(
            rows, "event_type string, user_id long, event_id long, ts_ms long, cents long"
        )
        from hbase_bulkload_service_spark.operators import tsdb

        d = tsdb.counter_deltas(df).collect()
        assert len(d) == n - 1
        ordered = sorted(rows, key=lambda r: (r[3], r[2]))
        assert sum(r["delta_cents"] for r in d) == ordered[-1][4] - ordered[0][4]
        assert all(r["dt_ms"] > 0 for r in d)  # unique ts in this fixture


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),            # id (dedup'd below)
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(-(10**9), 10**9),     # value (negatives legal)
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    n_shards=st.integers(1, 9),
    grouped=st.booleans(),
)
@settings(**_SETTINGS)
def test_prefix_sum_equals_window_truth(spark, rows, n_shards, grouped):
    """prefix_sum must agree with the naive running total for ANY input,
    shard count, and grouping — including negative values, single-row
    groups, and n_shards larger than the row count."""
    df = spark.createDataFrame(rows, "id long, g string, v long")
    part = ["g"] if grouped else []
    out = {
        r["id"]: r["cum"]
        for r in analytics.prefix_sum(
            df, "v", ["id"], part_cols=part, n_shards=n_shards
        ).collect()
    }
    run: dict[str, int] = {}
    for i, g, v in sorted(rows):
        k = g if grouped else ""
        run[k] = run.get(k, 0) + v
        assert out[i] == run[k]
