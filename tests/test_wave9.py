"""Wave-9 operators: scalable prefix sum, token-budget mix, boilerplate
line removal, inverted-index postings."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation, textops


# ---------------------------------------------------------------------------
# prefix_sum
# ---------------------------------------------------------------------------

def test_prefix_sum_matches_window_global_and_grouped(spark):
    rng = random.Random(5)
    rows = [(i, rng.choice("xyz"), rng.randrange(100)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(9)

    out = {r["id"]: r["cum"]
           for r in analytics.prefix_sum(df, "v", ["id"], n_shards=6).collect()}
    run = 0
    for i, _, v in sorted(rows):
        run += v
        assert out[i] == run

    got = {r["id"]: r["cum"]
           for r in analytics.prefix_sum(
               df, "v", [F.col("id").desc()], part_cols=["g"], n_shards=5
           ).collect()}
    runs: dict[str, int] = {}
    for i, g, v in sorted(rows, key=lambda t: -t[0]):
        runs[g] = runs.get(g, 0) + v
        assert got[i] == runs[g]


def test_prefix_sum_plan_has_no_single_partition_exchange(spark):
    """The whole point of the operator: a global running total WITHOUT
    collapsing onto one task. The naive window plans Exchange
    SinglePartition; prefix_sum must never. checkpoint=False keeps the
    lineage visible (the default eager localCheckpoint replaces the
    upstream plan with the materialized RDD scan)."""
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    plan = analytics.prefix_sum(
        df, "v", ["id"], n_shards=8, checkpoint=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_prefix_sum_null_group_keys_form_one_group(spark):
    """NULL part keys must behave like one group (null-safe offset join +
    None-normalized pandas grouping), not crash or fragment per-row."""
    rows = [(i, None if i % 2 else "g", 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {(r["g"], r["id"]): r["cum"]
           for r in analytics.prefix_sum(
               df, "v", ["id"], part_cols=["g"], n_shards=4
           ).collect()}
    runs = {None: 0, "g": 0}
    for i, g, v in sorted(rows):
        runs[g] += v
        assert out[(g, i)] == runs[g]


def test_prefix_sum_input_validation(spark):
    df = spark.range(10).withColumn("v", F.lit(1))
    with pytest.raises(ValueError):
        analytics.prefix_sum(df, "v", [])
    with pytest.raises(ValueError):
        analytics.prefix_sum(df, "v", ["id"], n_shards=0)


# ---------------------------------------------------------------------------
# token_budget_mix
# ---------------------------------------------------------------------------

def test_token_budget_mix_largest_remainder_is_exact(spark):
    rows = [(i, s, 10) for i, s in enumerate(["a"] * 30 + ["b"] * 30 + ["c"] * 30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = curation.token_budget_mix(
        df, 1000, weights={"a": 3, "b": 2, "c": 2}, n_shards=3
    )
    alloc = {r["source"]: r["alloc_tokens"]
             for r in out.select("source", "alloc_tokens").distinct().collect()}
    # W=7: base a=428 (rem 4), b=285 (rem 5), c=285 (rem 5); extra=2 ->
    # largest remainders b, c get +1
    assert alloc == {"a": 428, "b": 286, "c": 286}
    assert sum(alloc.values()) == 1000
    kept = {r["source"]: r["n"]
            for r in out.filter("keep").groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    # docs are 10 tokens each: floor(alloc/10) whole docs fit, capped by
    # availability (source a has only 30 docs = 300 tokens < its 428)
    assert kept == {"a": 30, "b": 28, "c": 28}


def test_token_budget_mix_unweighted_source_gets_nothing(spark):
    rows = [(1, "a", 5), (2, "b", 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = curation.token_budget_mix(df, 100, weights={"a": 1}).collect()
    assert {r["source"] for r in out} == {"a"}  # b filtered out entirely
    with pytest.raises(ValueError):
        curation.token_budget_mix(df, 0)
    with pytest.raises(ValueError):
        curation.token_budget_mix(df, 10, weights={"a": 0})


# ---------------------------------------------------------------------------
# strip_boilerplate
# ---------------------------------------------------------------------------

def test_strip_boilerplate_drops_repeated_lines_preserves_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "s", "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "s", "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "s", "unique doc\nCOOKIE BANNER"),
            (4, "t", "COOKIE BANNER\nother source keeps it"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in textops.strip_boilerplate(
        docs, min_df=2).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "real content one"
    assert out[3]["clean_text"] == "unique doc"
    # source-scoped: 'COOKIE BANNER' appears once in source t -> kept
    assert out[4]["clean_text"] == "COOKIE BANNER\nother source keeps it"


def test_strip_boilerplate_all_boiler_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "s", "dup"), (2, "s", "dup")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in textops.strip_boilerplate(
        docs, min_df=2).collect()}
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""
    with pytest.raises(ValueError):
        textops.strip_boilerplate(docs, min_df=0)


# ---------------------------------------------------------------------------
# build_postings
# ---------------------------------------------------------------------------

def test_build_postings_stats_sorted_lists_and_stopword_cap(spark):
    docs = spark.createDataFrame(
        [
            (3, "the cat sat"),
            (1, "the the dog"),
            (2, "the cat"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in textops.build_postings(
        docs, max_df=2).collect()}
    assert out["the"]["df"] == 3 and out["the"]["cf"] == 4
    assert out["the"]["postings"] is None  # df > max_df -> elided
    cat = out["cat"]
    assert cat["df"] == 2 and cat["cf"] == 2
    assert [(p["doc_id"], p["tf"]) for p in cat["postings"]] == [(2, 1), (3, 1)]
    assert [(p["doc_id"], p["tf"]) for p in out["dog"]["postings"]] == [(1, 1)]
    with pytest.raises(ValueError):
        textops.build_postings(docs, max_df=0)


def test_prefix_sum_rejects_reserved_column_collisions(spark):
    df = spark.range(5).withColumn("v", F.lit(1)).withColumn("cum", F.lit(0))
    with pytest.raises(ValueError, match="collision"):
        analytics.prefix_sum(df, "v", ["id"])  # out_col 'cum' already present
    df2 = spark.range(5).withColumn("v", F.lit(1)).withColumn("_shard", F.lit(0))
    with pytest.raises(ValueError, match="collision"):
        analytics.prefix_sum(df2, "v", ["id"])


def test_strip_boilerplate_separator_is_literal_not_regex(spark):
    """A '.' separator must split on literal dots, not regex-any-char."""
    docs = spark.createDataFrame(
        [(1, "s", "a.b"), (2, "s", "a.c")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in textops.strip_boilerplate(
        docs, min_df=2, sep=".").collect()}
    # 'a' repeats in both docs -> dropped; 'b'/'c' unique -> kept
    assert out[1]["n_lines"] == 2 and out[1]["clean_text"] == "b"
    assert out[2]["clean_text"] == "c"


def test_strip_boilerplate_null_text_doc_is_not_dropped(spark):
    """NULL text must yield a row (treated as empty text), not vanish
    through a null-unsafe digest join."""
    docs = spark.createDataFrame(
        [(1, "s", None), (2, "s", "real line")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in textops.strip_boilerplate(
        docs, min_df=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_lines"] == 1 and out[1]["clean_text"] == ""  # [''] kept
    assert out[2]["clean_text"] == "real line"
