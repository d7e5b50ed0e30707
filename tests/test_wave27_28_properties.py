"""Property-based invariants for the wave-27/28 operators: Gini
diversity vs a Python reference, TVD axioms (range, zero-distance,
absent-mass accounting), count-min lower-bound universality, kappa
range/identities, layout-pruning conservation, and fold atomicity."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from hbase_bulkload_service_spark.operators import (
    analytics,
    maintenance,
    textops,
)

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORD = st.integers(0, 6).map(lambda i: f"w{i}")
_TEXT = st.lists(_WORD, min_size=1, max_size=25).map(" ".join)


@given(texts=st.lists(_TEXT, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_char_diversity_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in textops.char_diversity(docs).collect()}
    for i, t in enumerate(texts):
        norm = " ".join(t.split())
        c = Counter(norm)
        n = sum(c.values())
        ss = sum(v * v for v in c.values())
        r = got[i]
        assert r.n_chars_norm == n
        assert r.distinct_chars == len(c)
        assert r.gini_ppm == (n * n - ss) * 1_000_000 // (n * n)
        assert r.top_char_ppm == max(c.values()) * 1_000_000 // n


@given(
    texts=st.lists(_TEXT, min_size=2, max_size=12),
    nsrc=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_token_tvd_matches_python_reference_and_axioms(spark, texts, nsrc):
    rows = [(i, t, f"s{i % nsrc}") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in textops.token_tvd(docs).collect()}
    # python reference over the same normalization
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for _i, t, s in rows:
        words = [w for w in t.split() if w]
        per_src.setdefault(s, Counter()).update(words)
        corpus.update(words)
    n = sum(corpus.values())
    for s, cs in per_src.items():
        ns = sum(cs.values())
        num = sum(abs(cs.get(w, 0) * n - cw * ns) for w, cw in corpus.items())
        want = num * 1_000_000 // (2 * ns * n)
        assert got[s].tvd_ppm == want
        assert 0 <= got[s].tvd_ppm < 1_000_000  # TVD in [0, 1)
        assert got[s].n_tokens == ns and got[s].n_types == len(cs)
    if nsrc == 1:
        # single source IS the mixture
        assert next(iter(got.values())).tvd_ppm == 0


@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    depth=st.integers(1, 3),
    width=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_countmin_never_underestimates(spark, keys, depth, width):
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    out = analytics.countmin_estimates(
        df, "user_id", depth=depth, width=width, top_n=10
    ).collect()
    truth = Counter(str(k) for k in keys)
    assert out  # top-n of a non-empty input is non-empty
    for r in out:
        assert r.true_cnt == truth[r.key]
        assert r.est_cnt >= r.true_cnt  # the CMS lower bound, always
        assert bool(r.lower_bound_ok)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.sampled_from(["en", "de"])),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_kappa_identities_from_cells(spark, rows):
    # drive kappa's algebra directly through the cells contract by
    # synthesizing docs whose prediction is forced via text choice
    texts = {"en": "the and with that have", "de": "der und die das ist"}
    docs = spark.createDataFrame(
        [(i, texts[p], lab, "s") for i, (lab, p) in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )
    r = textops.kappa_agreement(docs).collect()[0]
    n = len(rows)
    agree = sum(1 for lab, p in rows if lab == p)
    assert r.n_docs == n and r.n_agree == agree
    assert r.po_ppm == agree * 1_000_000 // n
    # kappa <= po (chance correction never inflates) and kappa <= 1
    if r.kappa_ppm is not None:
        assert r.kappa_ppm <= 1_000_000
        assert r.kappa_ppm <= r.po_ppm + 1  # truncation slack


@given(
    ks=st.lists(st.integers(0, 1000), min_size=5, max_size=80, unique=True),
    n_files=st.sampled_from([4, 8]),
)
@settings(**_SETTINGS)
def test_layout_pruning_conservation(spark, ks, n_files):
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(ks)], "nat long, k long"
    )
    lo, hi = min(ks), max(ks)
    out = maintenance.layout_pruning_audit(
        df, "k", "nat", probes=[(0, lo, hi)], n_files=n_files
    ).collect()
    for r in out:
        # the full-range probe touches every file and scans every row
        assert r.files_touched == r.files_total
        assert r.rows_scanned == len(ks) and r.rows_matched == len(ks)
        assert r.skip_ppm == 0 and r.waste_ppm == 0
        assert r.files_total <= n_files
