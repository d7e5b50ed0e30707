"""Wave-29 operators: readability, calibrated length floor, soft
quality sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, textops


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------


def test_readability_hand_checked(spark):
    # "the cat sat." -> words 3, sentences 1, syllables: e/a/a = 3
    # wps=3000, spw=1000; flesch = 206835 - 3045 - 84600 = 119190
    out = textops.readability_scores(
        _docs(spark, [(1, "the cat sat.")])).collect()[0]
    assert (out.n_words, out.n_sentences, out.n_syllables) == (3, 1, 3)
    assert out.wps_milli == 3000 and out.spw_milli == 1000
    assert out.flesch_milli == 119190 and not out.hard_to_read


def test_readability_long_words_read_harder(spark):
    easy = textops.readability_scores(
        _docs(spark, [(1, "the cat sat. the dog ran.")])).collect()[0]
    hard = textops.readability_scores(
        _docs(spark, [(1, "antidisestablishmentarianism "
                          "electroencephalographically.")])).collect()[0]
    assert hard.flesch_milli < easy.flesch_milli
    assert hard.spw_milli > easy.spw_milli


def test_readability_clamps_and_drops_empty(spark):
    out = {r.doc_id: r for r in textops.readability_scores(
        _docs(spark, [(1, "word"), (2, "   "), (3, "xxx")])).collect()}
    assert 2 not in out                      # empty normalizes away
    assert out[1].n_sentences == 1           # no punctuation -> floor 1
    assert out[3].n_syllables == 1           # vowel-less -> floor 1


# ---------------------------------------------------------------------------
# calibrated_length_floor
# ---------------------------------------------------------------------------


def test_length_floor_exact_percentile_by_rank(spark):
    # en: word counts 1..8 -> p250 = value at ceil(0.25*8)=rank 2 -> 2
    rows = [(i, " ".join(["w"] * i), "en") for i in range(1, 9)]
    rows += [(100 + i, " ".join(["x"] * (10 * i)), "de") for i in range(1, 5)]
    out = {r.lang: r for r in textops.calibrated_length_floor(
        _docs(spark, rows, "doc_id long, text string, lang string"),
        q_permille=250).collect()}
    en = out["en"]
    assert en.n_docs == 8 and en.p_words == 2
    assert en.n_flagged == 1  # only the 1-word doc sits under the floor
    assert en.flagged_ppm == 125000
    # de: counts 10,20,30,40 -> rank ceil(1)=1 -> floor 10, none below
    de = out["de"]
    assert de.p_words == 10 and de.n_flagged == 0


def test_length_floor_is_per_stratum_not_global(spark):
    # a global p25 would flag every short-lang doc; per-stratum flags none
    rows = [(i, "a b", "short") for i in range(4)]
    rows += [(10 + i, " ".join(["w"] * 50), "long") for i in range(4)]
    out = {r.lang: r for r in textops.calibrated_length_floor(
        _docs(spark, rows, "doc_id long, text string, lang string")
    ).collect()}
    assert out["short"].n_flagged == 0 and out["long"].n_flagged == 0


def test_length_floor_rejects_bad_quantile(spark):
    with pytest.raises(ValueError):
        textops.calibrated_length_floor(
            _docs(spark, [(1, "x", "en")],
                  "doc_id long, text string, lang string"), q_permille=0)


# ---------------------------------------------------------------------------
# soft_quality_sample
# ---------------------------------------------------------------------------


def test_soft_sampling_extremes_and_accounting(spark):
    # degenerate docs (gini 0) can never be kept; the keep decision is
    # deterministic, so two runs agree row-for-row
    rows = [(i, "aaaa aaaa aaaa", "junk") for i in range(10)]
    rows += [(100 + i, f"the quick brown fox {i} jumps over lazy dogs",
              "good") for i in range(10)]
    docs = _docs(spark, rows, "doc_id long, text string, source string")
    out1 = {r.source: r for r in curation.soft_quality_sample(docs).collect()}
    out2 = {r.source: r for r in curation.soft_quality_sample(docs).collect()}
    junk, good = out1["junk"], out1["good"]
    # 'aaaa aaaa aaaa' has chars {a, ' '}: low but nonzero gini; the
    # high-diversity source must keep at a higher rate
    assert good.n_kept / good.n_docs > junk.n_kept / junk.n_docs
    assert junk.mean_quality_ppm < good.mean_quality_ppm
    assert 0 <= good.kept_ppm <= 1_000_000
    # determinism: identical accounting across runs
    assert out1 == out2


def test_soft_sampling_kept_tracks_quality_in_expectation(spark):
    # many docs at uniform quality q: kept_ppm converges near q
    rows = [(i, f"abcdefg hij {i} klmnop qrstu vwxyz", "s")
            for i in range(200)]
    r = curation.soft_quality_sample(
        _docs(spark, rows, "doc_id long, text string, source string")
    ).collect()[0]
    assert abs(r.kept_ppm - r.mean_quality_ppm) < 120_000  # ~3 sigma
