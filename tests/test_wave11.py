"""Wave-11 operators: exact k-per-stratum sampling, containment
(near-superset) pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hbase_bulkload_service_spark.operators import curation, dedup


# ---------------------------------------------------------------------------
# capped_stratum_sample
# ---------------------------------------------------------------------------


def _mk_docs(spark, n=400, strata=("en", "de", "fr")):
    return spark.createDataFrame(
        [(i, strata[i % len(strata)]) for i in range(n)],
        "doc_id long, lang string",
    )


def _naive_topk(spark, docs, cap, seed):
    w = Window.partitionBy("lang").orderBy(F.col("__o"), F.col("doc_id"))
    return (
        docs.withColumn(
            "__o",
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .select("doc_id", "lang")
    )


def test_capped_sample_matches_naive_window(spark):
    docs = _mk_docs(spark)
    got = curation.capped_stratum_sample(
        docs, cap=20, strata_col="lang", seed=3
    ).select("doc_id", "lang")
    want = _naive_topk(spark, docs, 20, 3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"en": 20, "de": 20, "fr": 20}


def test_capped_sample_prefilter_is_lossless(spark):
    """With a generous prefilter, output must be IDENTICAL to the naive
    full-window draw (losslessness of the map-side cut)."""
    docs = _mk_docs(spark)
    got = curation.capped_stratum_sample(
        docs, cap=15, strata_col="lang", seed=5, prefilter_ppm=700_000
    ).select("doc_id", "lang")
    want = _naive_topk(spark, docs, 15, 5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_capped_sample_prefilter_guard_fires_loudly(spark):
    """A prefilter too aggressive for the cap must raise (with guidance),
    never silently under-sample."""
    docs = _mk_docs(spark, n=300)
    out = curation.capped_stratum_sample(
        docs, cap=80, strata_col="lang", seed=1, prefilter_ppm=2_000
    )
    with pytest.raises(Exception, match="raise prefilter_ppm"):
        out.collect()


def test_capped_sample_small_stratum_kept_whole(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 100 else "tiny") for i in range(105)],
        "doc_id long, lang string",
    )
    got = curation.capped_stratum_sample(docs, cap=50, strata_col="lang")
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"en": 50, "tiny": 5}


def test_capped_sample_seeds_are_independent_draws(spark):
    docs = _mk_docs(spark)
    a = {r["doc_id"] for r in curation.capped_stratum_sample(
        docs, cap=10, seed=1).collect()}
    b = {r["doc_id"] for r in curation.capped_stratum_sample(
        docs, cap=10, seed=2).collect()}
    assert a != b  # 30-of-400 twice colliding exactly is ~impossible
    # same seed reproduces exactly
    a2 = {r["doc_id"] for r in curation.capped_stratum_sample(
        docs, cap=10, seed=1).collect()}
    assert a == a2


def test_capped_sample_arg_guards(spark):
    docs = _mk_docs(spark, n=10)
    with pytest.raises(ValueError, match="cap"):
        curation.capped_stratum_sample(docs, cap=0)
    with pytest.raises(ValueError, match="prefilter_ppm"):
        curation.capped_stratum_sample(docs, cap=1, prefilter_ppm=0)


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long doc: containment ~1e6
    one way, far below threshold the other way — and symmetric Jaccard
    (q36 semantics) does NOT flag the pair at its 0.4 threshold."""
    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"filler{i} token{i} body{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_inner"], r["doc_outer"]): r
    for r in dedup.containment_pairs(docs, threshold_ppm=900_000).collect()}
    assert (1, 2) in rows and (2, 1) not in rows
    assert rows[(1, 2)]["containment_ppm"] == 1_000_000  # verbatim subset
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.4).collect()
    assert jac == []  # the symmetric detector structurally misses it


def test_containment_symmetric_dup_yields_both_directions(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, t), (2, t + " extra")], "doc_id long, text string"
    )
    got = {
        (r["doc_inner"], r["doc_outer"])
        for r in dedup.containment_pairs(docs, threshold_ppm=800_000).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_containment_ppm_is_truncating_integer(spark):
    """ppm must be the truncating integer quotient (matches the oracle's
    `//`), not a rounded float."""
    base = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, base + " uniq1a uniq1b"), (2, base + " uniq2a uniq2b")],
        "doc_id long, text string",
    )
    for r in dedup.containment_pairs(docs, threshold_ppm=100_000).collect():
        assert r["containment_ppm"] == r["inter"] * 1_000_000 // r["n_inner"]


def test_containment_threshold_guard(spark):
    docs = spark.createDataFrame([(1, "abcdefg")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold_ppm"):
        dedup.containment_pairs(docs, threshold_ppm=0)
    with pytest.raises(ValueError, match="threshold_ppm"):
        dedup.containment_pairs(docs, threshold_ppm=1_000_001)


def test_capped_sample_null_stratum_guard_is_null_safe(spark):
    """A NULL stratum is a legal group: the prefilter guard must track
    it (null-safe join) — and sampling must still draw from it."""
    docs = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(200)],
        "doc_id long, lang string",
    )
    out = curation.capped_stratum_sample(
        docs, cap=10, strata_col="lang", seed=2, prefilter_ppm=800_000
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"en": 10, None: 10}


def test_capped_sample_rejects_reserved_columns(spark):
    import pytest as _pt

    docs = spark.createDataFrame([(1, "en", "x")],
                                 "doc_id long, lang string, __ord string")
    with _pt.raises(ValueError, match="reserved column"):
        curation.capped_stratum_sample(docs, cap=1, strata_col="lang")


def test_capped_sample_null_key_raises_loudly(spark):
    """NULL draw keys must raise in-plan (every path — Spark NULLS FIRST
    rank, prefilter NULL-comparison drop, cross-engine order — silently
    breaks determinism otherwise)."""
    docs = spark.createDataFrame(
        [(1, "en"), (None, "en"), (3, "en")], "doc_id long, lang string"
    )
    out = curation.capped_stratum_sample(docs, cap=2, strata_col="lang")
    with pytest.raises(Exception, match="unique non-null id"):
        out.collect()
