"""Wave-16 operators: user-journey path mining, cross-source overlap."""

from __future__ import annotations

import pytest

from hbase_bulkload_service_spark.operators import analytics, curation


# ---------------------------------------------------------------------------
# user_journeys
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long, event_id long"
    )


def test_user_journeys_paths_and_ranks(spark):
    rows = [
        # two users do a>b, one does b>a
        (1, "a", 10, 1), (1, "b", 20, 2),
        (2, "a", 10, 3), (2, "b", 20, 4),
        (3, "b", 10, 5), (3, "a", 20, 6),
    ]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=10
    ).collect()
    got = {(r.path, r.n_users, r.rank) for r in out}
    assert got == {("a>b", 2, 1), ("b>a", 1, 2)}


def test_user_journeys_truncates_to_max_steps(spark):
    rows = [(1, t, i * 10, i) for i, t in enumerate("abcde")]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=3, top_k=5
    ).collect()
    assert out[0].path == "a>b>c"


def test_user_journeys_duplicate_ts_resolved_by_id(spark):
    rows = [(1, "x", 10, 2), (1, "y", 10, 1)]  # same ts: id order wins
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=5
    ).collect()
    assert out[0].path == "y>x"


def test_user_journeys_tie_rank_deterministic(spark):
    rows = [(1, "a", 10, 1), (2, "b", 10, 2)]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=5, top_k=5
    ).collect()
    # equal counts: path ascending breaks the tie
    assert [(r.path, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        ("a", 1), ("b", 2)
    ]


def test_user_journeys_top_k_bounds_output(spark):
    rows = [(u, f"t{u}", 10, u) for u in range(10)]
    out = analytics.user_journeys(
        _events(spark, rows), max_steps=2, top_k=3
    ).collect()
    assert len(out) == 3


def test_user_journeys_validates(spark):
    df = _events(spark, [(1, "a", 10, 1)])
    with pytest.raises(ValueError, match="max_steps"):
        analytics.user_journeys(df, max_steps=0)


def test_user_journeys_topk_is_take_ordered(spark):
    df = _events(spark, [(1, "a", 10, 1)])
    plan = (
        analytics.user_journeys(df, max_steps=2, top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# source_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_counts(spark):
    rows = [
        ("s1", "shared one"), ("s1", "shared one"),  # 2 copies in s1
        ("s1", "only s1"),
        ("s2", "shared one"),
        ("s2", "shared two"),
        ("s3", "shared two"), ("s3", "no match"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.source_a, r.source_b): (r.shared_digests, r.docs_a, r.docs_b)
        for r in curation.source_overlap(df).collect()
    }
    # s1-s2 share "shared one" (2 docs on the s1 side), s2-s3 share
    # "shared two"; s1-s3 share nothing -> no row
    assert out == {("s1", "s2"): (1, 2, 1), ("s2", "s3"): (1, 1, 1)}


def test_source_overlap_null_text_is_empty(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", "")], "source string, text string"
    )
    out = curation.source_overlap(df).collect()
    assert len(out) == 1 and out[0].shared_digests == 1


def test_source_overlap_unordered_pairs_once(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "source string, text string"
    )
    out = curation.source_overlap(df).collect()
    assert len(out) == 1 and (out[0].source_a, out[0].source_b) == ("a", "b")
