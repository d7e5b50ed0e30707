"""Property-based invariants for the wave-21/22/23 operators: phrase
matching vs a naive Python matcher, temperature-quota conservation,
DoReMi ppm invariants, blocklist score accounting, column-profile vs a
pandas reference, and audio-trim span identities."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from hbase_bulkload_service_spark.operators import (
    curation,
    multimodal,
    quality,
    textops,
)

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORD = st.integers(0, 6).map(lambda i: f"w{i}")  # tiny vocab -> collisions
_TEXT = st.lists(_WORD, min_size=1, max_size=30).map(" ".join)


@given(
    texts=st.lists(_TEXT, min_size=2, max_size=15),
    plen=st.integers(1, 4),
    mod=st.integers(2, 5),
)
@settings(**_SETTINGS)
def test_phrase_decontam_matches_naive_matcher(spark, texts, plen, mod):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.phrase_doc, r.doc_id): (r.n_matches, r.first_pos)
        for r in textops.phrase_decontamination(
            docs, phrase_len=plen, source_mod=mod
        ).collect()
    }
    # naive reference: all alignments, all phrase sources
    want = {}
    toks = {i: t.split() for i, t in enumerate(texts)}
    for pid, pt in toks.items():
        if pid % mod != 0 or len(pt) < plen:
            continue
        phrase = pt[:plen]
        for did, dt in toks.items():
            starts = [
                s
                for s in range(len(dt) - plen + 1)
                if dt[s : s + plen] == phrase
            ]
            if starts:
                want[(pid, did)] = (len(starts), min(starts))
    assert got == want


@given(
    langs=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    budget=st.integers(1, 60),
)
@settings(**_SETTINGS)
def test_temperature_sample_quota_conservation(spark, langs, budget):
    rows = [
        (li * 1000 + i, f"l{li}", "t")
        for li, n in enumerate(langs)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation.temperature_sample(df, budget=budget).collect()
    # quotas sum EXACTLY to budget; each lang keeps min(quota, n) rows,
    # ranks are 1..kept with no gaps
    quotas = {}
    for r in out:
        quotas[r.lang] = r.quota
        assert 1 <= r.rnk <= r.quota
    per_lang = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r.rnk)
    for lang, rnks in per_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        n = langs[int(lang[1:])]
        assert len(rnks) == min(quotas[lang], n)
    # langs missing from the output entirely had quota 0 or... never:
    # every lang has weight >= 1, but quota can still be 0 on tiny
    # budgets — conservation is over the quota table, checked via sum
    # of kept <= budget and (if no shortfall anywhere) == budget
    assert sum(quotas.get(f"l{li}", 0) for li in range(len(langs))) <= budget


@given(
    doms=st.lists(st.tuples(st.integers(1, 8), st.integers(0, 3)),
                  min_size=2, max_size=6),
    rounds=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_doremi_ppm_invariants(spark, doms, rounds):
    # domain i has doms[i][0] docs of text drawn from a vocab slice
    rows = [
        (di * 100 + i, f"s{di}", " ".join(f"w{di}_{j % (v + 1)}" for j in range(4)))
        for di, (n, v) in enumerate(doms)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation.doremi_weights(df, rounds=rounds, vocab_size=2).collect()
    assert len(out) == len(doms)
    for t in range(rounds + 1):
        assert sum(r[f"w{t}_ppm"] for r in out) == 1_000_000
        assert all(r[f"w{t}_ppm"] >= 0 for r in out)


@given(
    texts=st.lists(_TEXT, min_size=1, max_size=12),
    sev=st.integers(1, 5),
    thresh=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_blocklist_score_accounting(spark, texts, sev, thresh):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    out = textops.blocklist_audit(
        docs, {"w0": sev, "w1": 1}, flag_threshold=thresh
    ).collect()
    total = sum(r.total_score for r in out)
    want = sum(
        sev * t.split().count("w0") + t.split().count("w1") for t in texts
    )
    assert total == want
    assert sum(r.n_docs for r in out) == len(texts)
    for r in out:
        assert 0 <= r.flagged_docs <= r.n_docs
        assert r.flagged_ppm == r.flagged_docs * 1_000_000 // r.n_docs


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_column_profile_matches_python_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    r = quality.column_profile(df, {"v": F.col("v")}).collect()[0]
    nn = [v for v in vals if v is not None]
    assert r.n_rows == len(vals)
    assert r.n_nulls == len(vals) - len(nn)
    assert r.n_distinct == len(set(nn))
    if nn:
        # lexicographic over the canonical STRING form
        assert r.min_val == min(map(str, nn))
        assert r.max_val == max(map(str, nn))
    else:
        assert r.min_val is None and r.max_val is None
    assert r.null_ppm == r.n_nulls * 1_000_000 // r.n_rows


@given(
    frames=st.lists(st.integers(0, 255), min_size=1, max_size=20),
    thresh=st.integers(1, 255),
)
@settings(**_SETTINGS)
def test_audio_trim_span_identity(spark, frames, thresh):
    # one byte per frame (frame_bytes=1): energies == bytes
    payload = bytes(frames)
    m = spark.createDataFrame(
        [(1, "audio", bytearray(payload))],
        "doc_id long, media_type string, payload binary",
    )
    r = multimodal.audio_trim_plan(m, frame_bytes=1, threshold=thresh).collect()[0]
    active = [i for i, b in enumerate(frames) if b >= thresh]
    assert r.n_frames == len(frames)
    assert r.lead_trim + r.tail_trim + r.kept_frames == r.n_frames
    if active:
        assert r.lead_trim == active[0]
        assert r.tail_trim == len(frames) - 1 - active[-1]
        assert r.kept_frames == active[-1] - active[0] + 1
    else:
        assert r.kept_frames == 0 and r.lead_trim == len(frames)
    assert r.max_energy == max(frames)
