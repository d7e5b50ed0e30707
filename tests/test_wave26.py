"""Wave-26 operators: Holt-Winters seasonal chart, lang confusion,
A/B guardrail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, textops


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, value double"
    )


def test_holt_winters_hand_checked_recurrence(spark):
    # period 2, one series, x = [100, 200, 300] cents
    rows = [(1, 1, 10, 1.0), (1, 2, 20, 2.0), (1, 3, 30, 3.0)]
    out = {r.rn: r for r in analytics.holt_winters_forecast(
        _events(spark, rows), period=2).collect()}
    # t1: l=100 b=0 s=[0,0], phase 0
    r1 = out[1]
    assert (r1.level_cents, r1.trend_cents, r1.seasonal_cents) == (100, 0, 0)
    assert r1.forecast_cents is None and r1.phase == 0
    # t2 (phase 1, s[1]=0): f=100, e=100; l=(200-0+100+0)/2=150;
    # b=(150-100+0)/2=25; s[1]=(200-150+0)/2=25
    r2 = out[2]
    assert r2.forecast_cents == 100 and r2.err_cents == 100
    assert (r2.level_cents, r2.trend_cents, r2.seasonal_cents) == (150, 25, 25)
    # t3 (phase 0, s[0]=0): f=150+25+0=175, e=125;
    # l=(300-0+150+25)/2=237; b=(237-150+25)/2=56; s[0]=(300-237+0)/2=31
    r3 = out[3]
    assert r3.forecast_cents == 175 and r3.err_cents == 125
    assert (r3.level_cents, r3.trend_cents, r3.seasonal_cents) == (237, 56, 31)


def test_holt_winters_negative_registers_truncate(spark):
    # falling series drives trend negative where flooring // would
    # diverge from truncating div by one
    rows = [(1, i, i * 10, float(100 - 30 * i)) for i in range(1, 6)]
    out = {r.rn: r for r in analytics.holt_winters_forecast(
        _events(spark, rows), period=2).collect()}
    assert any(out[t].trend_cents < 0 for t in out)
    # replay in python with explicit truncation
    from hbase_bulkload_service_spark.operators.analytics import _tdiv
    xs = [7000, 4000, 1000, -2000, -5000]
    lv, tr, seas = xs[0], 0, [0, 0]
    for t in range(1, 5):
        p = t % 2
        prev = lv
        lv = _tdiv(xs[t] - seas[p] + lv + tr, 2)
        tr = _tdiv(lv - prev + tr, 2)
        seas[p] = _tdiv(xs[t] - lv + seas[p], 2)
        r = out[t + 1]
        assert (r.level_cents, r.trend_cents, r.seasonal_cents) == (
            lv, tr, seas[p]
        )
    with pytest.raises(ValueError):
        analytics.holt_winters_forecast(_events(spark, rows), period=1)


def test_lang_confusion_counts_and_shares(spark):
    rows = [
        (1, "en", "the cat"),      # en markers -> pred en
        (2, "en", "der hund nicht"),  # de markers -> pred de (confusion)
        (3, "de", "der und"),      # pred de
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r.lang, r.pred_lang): r for r in
           textops.lang_confusion(docs).collect()}
    assert out[("en", "en")].n == 1 and out[("en", "de")].n == 1
    assert out[("en", "en")].share_ppm == 500_000
    assert out[("de", "de")].share_ppm == 1_000_000


def test_ab_guardrail_cross_multiplication(spark):
    # arms by md5(user_id) % 2; find two users in different arms, give
    # arm b a strictly worse hit rate and check the exact verdict
    from hbase_bulkload_service_spark.operators.curation import hash_bucket
    probe = spark.createDataFrame(
        [(i,) for i in range(10)], "user_id long"
    ).withColumn("armb", hash_bucket(F.col("user_id"), 2) == 0).collect()
    a_user = next(r.user_id for r in probe if not r.armb)
    b_user = next(r.user_id for r in probe if r.armb)
    rows = (
        [(a_user, "t", 10.0)] * 3 + [(a_user, "t", 90.0)]      # A: 1/4 hit
        + [(b_user, "t", 90.0)] * 3 + [(b_user, "t", 10.0)]    # B: 3/4 hit
    )
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )
    r = analytics.ab_guardrail(ev, F.col("value") > 75).collect()[0]
    assert (r.n_a, r.hits_a, r.n_b, r.hits_b) == (4, 1, 4, 3)
    assert bool(r.b_worse) is True
    assert r.lift_ppm == (3 * 4 * 1_000_000) // (1 * 4)


def test_ab_guardrail_zero_hits_null_lift(spark):
    ev = spark.createDataFrame(
        [(i, "t", 1.0) for i in range(8)],
        "user_id long, event_type string, value double",
    )
    r = analytics.ab_guardrail(ev, F.col("value") > 75).collect()[0]
    assert r.hits_a == 0 and r.hits_b == 0
    assert r.lift_ppm is None and bool(r.b_worse) is False
