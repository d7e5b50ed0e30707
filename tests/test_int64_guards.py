"""Loud int64-overflow guards on the ppm operators (ADVICE r06).

kappa_agreement / token_tvd / char_diversity document int64 bounds on
their exact-rational ppm arithmetic; past them, non-ANSI Spark would
wrap silently and emit corrupted ppm values. int64_bound_guard turns
that into a job failure. The bounds are module constants so these tests
can lower them and exercise the firing path on tiny data; the
pass-through path is pinned by asserting outputs are unchanged with the
guard present (the wave-28/29 value tests keep covering exact values).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import textops

_EN = "the cat and the dog sat with a friend of the house"


def _collect_raises(df):
    with pytest.raises(Exception) as exc:
        df.collect()
    return str(exc.value)


def test_guard_passes_all_rows_when_bound_holds(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, n long")
    out = textops.int64_bound_guard(
        df, F.col("n") <= 100, F.lit("never")
    ).collect()
    assert sorted(r.id for r in out) == [1, 2]


def test_guard_fails_loudly_on_violation(spark):
    df = spark.createDataFrame([(1, 10), (2, 200)], "id long, n long")
    msg = _collect_raises(
        textops.int64_bound_guard(
            df,
            F.col("n") <= 100,
            F.format_string("boom id=%s", F.col("id").cast("string")),
        )
    )
    assert "boom id=2" in msg


def test_kappa_guard_fires_past_doc_bound(spark, monkeypatch):
    monkeypatch.setattr(textops, "INT64_SQ_PPM_BOUND", 3)
    docs = spark.createDataFrame(
        [(i, _EN, "en", "s") for i in range(5)],
        "doc_id long, text string, lang string, source string",
    )
    msg = _collect_raises(textops.kappa_agreement(docs))
    assert "kappa_agreement int64 bound exceeded" in msg
    assert "source s has 5 docs" in msg


def test_kappa_unchanged_below_bound(spark):
    docs = spark.createDataFrame(
        [(1, _EN, "en", "s1"), (2, _EN, "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    r = textops.kappa_agreement(docs).collect()[0]
    assert r.n_docs == 2 and r.po_ppm == 1_000_000


def test_token_tvd_guard_fires_past_product_bound(spark, monkeypatch):
    # 2 sources x 3 tokens each: n_s=3, n_corpus=6 -> n_s*n_corpus=18
    monkeypatch.setattr(textops, "INT64_TVD_PRODUCT_BOUND", 17)
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b d", "s2")],
        "doc_id long, text string, source string",
    )
    msg = _collect_raises(textops.token_tvd(docs))
    assert "token_tvd int64 bound exceeded" in msg


def test_token_tvd_unchanged_below_bound(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r.tvd_ppm for r in textops.token_tvd(docs).collect()}
    assert out == {"s1": 0, "s2": 0}


def test_char_diversity_guard_fires_past_char_bound(spark, monkeypatch):
    monkeypatch.setattr(textops, "INT64_SQ_PPM_BOUND", 4)
    docs = spark.createDataFrame(
        [(1, "abcdefgh")], "doc_id long, text string"
    )
    msg = _collect_raises(textops.char_diversity(docs))
    assert "char_diversity int64 bound exceeded" in msg
    assert "doc 1 has 8 normalized chars" in msg


def test_char_diversity_unchanged_below_bound(spark):
    docs = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    r = textops.char_diversity(docs).collect()[0]
    # n=4, counts {a:2,b:2}, ss=8 -> (16-8)*1e6 // 16 = 500000
    assert r.gini_ppm == 500_000 and r.distinct_chars == 2


def test_ks_drift_guard_fires_past_bound(spark, monkeypatch):
    from hbase_bulkload_service_spark.operators import analytics

    monkeypatch.setattr(analytics, "KS_INT64_BOUND", 3)
    df = spark.createDataFrame(
        [("k", "a", 1), ("k", "a", 2), ("k", "b", 3), ("k", "b", 4)],
        "k string, cohort string, v long",
    )
    msg = _collect_raises(analytics.ks_drift(df, "k", "cohort", "v"))
    assert "ks_drift int64 bound exceeded" in msg
    assert "n_a*n_b=4" in msg


def test_ks_drift_unchanged_below_bound(spark):
    from hbase_bulkload_service_spark.operators import analytics

    df = spark.createDataFrame(
        [("k", "a", 1), ("k", "b", 2)], "k string, cohort string, v long"
    )
    r = analytics.ks_drift(df, "k", "cohort", "v").collect()[0]
    assert r["d_ppm"] == 1_000_000  # guard present, values untouched


def test_loo_guard_fires_past_bound(spark, monkeypatch):
    from hbase_bulkload_service_spark.operators import analytics

    monkeypatch.setattr(analytics, "LOO_INT64_BOUND", 2)
    df = spark.createDataFrame(
        [(1, "c", 1), (2, "c", 1), (3, "c", 1)], "id long, cat string, t long"
    )
    msg = _collect_raises(
        analytics.loo_target_encoding(df, "cat", "t", ("id",))
    )
    assert "loo_target_encoding int64 bound exceeded" in msg
    assert "sum_t=3" in msg
