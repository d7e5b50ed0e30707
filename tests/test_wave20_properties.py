"""Property-based invariants for the wave-19/20 operators: packing
conservation, novelty accounting, EWMA/Holt recurrence bounds, and
vocabulary-coverage totals over hypothesis-generated inputs (batched —
one small DataFrame per example, the test_codec_properties strategy)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_bulkload_service_spark.operators import analytics, textops
import pytest

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORD = st.integers(0, 30).map(lambda i: f"w{i}")
_TEXT = st.lists(_WORD, min_size=1, max_size=40).map(" ".join)


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=25),
    seq_len=st.integers(4, 64),
    n_shards=st.integers(1, 5),
    seed=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_concat_pack_conservation_properties(spark, texts, seq_len, n_shards, seed):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = textops.concat_pack_stats(
        docs, seq_len=seq_len, seed=seed, n_shards=n_shards
    ).collect()
    total_tokens = sum(len(t.split()) for t in texts)
    # every token lands in exactly one window; every doc starts once
    assert sum(r.n_tokens for r in rows) == total_tokens
    assert sum(r.n_starts for r in rows) == len(texts)
    last = {}
    for r in rows:
        last[r.shard] = max(last.get(r.shard, -1), r.seq_id)
    for r in rows:
        assert 1 <= r.n_tokens <= seq_len
        assert r.n_docs >= max(r.n_starts, 1)
        if r.seq_id != last[r.shard]:  # interior windows are exactly full
            assert r.n_tokens == seq_len


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=20),
    k=st.integers(1, 4),
    batch_docs=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_novelty_accounting_properties(spark, texts, k, batch_docs):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = textops.ngram_novelty(docs, k=k, batch_docs=batch_docs).collect()
    grams = set()
    occ = 0
    for t in texts:
        ws = t.split()
        occ += max(0, len(ws) - k + 1)
        grams |= {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}
    # every gram is new in exactly one batch; occurrences all accounted
    assert sum(r.n_new for r in rows) == len(grams)
    assert sum(r.n_occ for r in rows) == occ
    for r in rows:
        assert 0 <= r.n_new <= r.n_distinct <= r.n_occ
        assert 0 <= r.novelty_ppm <= 1_000_000


@given(
    series=st.lists(
        st.lists(st.floats(0.0, 1000.0, allow_nan=False), min_size=1, max_size=20),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_ewma_stays_within_series_bounds(spark, series):
    rows = [
        (u, i, i, float(round(v, 2)))
        for u, vs in enumerate(series)
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, value double"
    )
    out = analytics.ewma_control(df).collect()
    by_u = {}
    for r in out:
        by_u.setdefault(r.user_id, []).append(r)
    for u, rs in by_u.items():
        xs = [r.x_cents for r in rs]
        for r in rs:
            # the truncating mean of two in-range values stays in range
            # (truncation can undershoot the float EWMA by at most 1)
            assert min(xs) - 1 <= r.ewma_cents <= max(xs)
        assert sum(1 for r in rs if r.rn == 1) == 1


@given(
    vals=st.lists(st.floats(0.0, 500.0, allow_nan=False), min_size=2, max_size=25)
)
@settings(**_SETTINGS)
def test_holt_forecast_identity_property(spark, vals):
    rows = [(1, i, i, float(round(v, 2))) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, value double"
    )
    out = sorted(analytics.holt_forecast(df).collect(), key=lambda r: r.rn)
    assert out[0].forecast_cents is None and out[0].trend_cents == 0
    for prev, cur in zip(out, out[1:]):
        assert cur.forecast_cents == prev.level_cents + prev.trend_cents
        assert cur.err_cents == cur.x_cents - cur.forecast_cents
        # recurrence replay (truncating division, as the engines do)
        lv = _tdiv(cur.x_cents + prev.level_cents + prev.trend_cents, 2)
        assert cur.level_cents == lv
        assert cur.trend_cents == _tdiv(
            lv - prev.level_cents + prev.trend_cents, 2
        )


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=15),
    v=st.integers(1, 40),
)
@settings(**_SETTINGS)
def test_vocab_coverage_totals(spark, texts, v):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = textops.vocab_coverage(docs, vocab_size=v).collect()
    assert len(rows) == len(texts)
    vocab_full = len({w for t in texts for w in t.split()}) <= v
    for r in rows:
        assert 0 <= r.oov <= r.n_tok
        assert r.oov_ppm == r.oov * 1_000_000 // r.n_tok
        if vocab_full:
            assert r.oov == 0  # V covers the whole vocabulary
