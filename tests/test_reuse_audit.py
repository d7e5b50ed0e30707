"""Exchange-reuse sweep invariant (VERDICT r06 item 2) + pinned single
evaluation for the operators fixed by it.

The q214/q216 class: an expensive frame fans into >= 2 consumers that
prune different columns, Catalyst/AQE cannot reuse the exchanges, and
the subtree silently evaluates once per consumer. tools/reuse_audit.py
finds every such frame at the source level; every finding must be
either protected (persist/localCheckpoint/cachereg) or explicitly
adjudicated in its ALLOWLIST (reuse-covered / recompute-by-design /
derived-from-cache — each verified against the AQE-off plan probe and,
for the fixed ones, A/B-measured at sf0.1: q92 0.71x, q155 0.64x,
q161 0.62x, q171 0.78x, q119 0.73x, q204 0.75x, q216 0.83x, q195
0.84x, q213 0.77x; the collapsed-count variants of bpe_encode and
vocab_coverage measured 5.5x/1.0x and were REVERTED — recompute beats
materialize for corpus-sized frames with only small exchanges above).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from reuse_audit import ALLOWLIST, sweep  # noqa: E402

from hbase_bulkload_service_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_no_unadjudicated_multi_consumer_frames():
    """Every multi-consumer expensive frame in the operator modules is
    protected or carries an explicit adjudication. A new operator that
    fans an aggregate/explode into two differently-pruned consumers
    must either persist it or add an ALLOWLIST entry with the probe
    evidence."""
    new, _allowed, _stale = sweep(REPO)
    assert not new, (
        "unadjudicated multi-consumer expensive frames (protect with "
        f"persist+cachereg or adjudicate in reuse_audit.ALLOWLIST): {new}"
    )


def test_allowlist_has_no_dead_entries():
    """Every ALLOWLIST entry still matches a live finding — a fixed or
    deleted operator must drop its entry, keeping the adjudications
    honest."""
    _new, allowed, _stale = sweep(REPO)
    live = {(r["function"], r["frame"]) for r in allowed}
    dead = set(ALLOWLIST) - live
    assert not dead, f"stale ALLOWLIST entries: {sorted(dead)}"


def test_allowlist_adjudications_match_current_code():
    """Round-8 re-validation hook (VERDICT r07 item 6): each ALLOWLIST
    entry stores the content hash of the function it adjudicates; when
    the function changes, this test fails until the entry is re-probed
    and its hash + note refreshed — an old probe note can never silently
    keep vouching for new code."""
    _new, _allowed, stale = sweep(REPO)
    assert not stale, (
        "ALLOWLIST adjudications older than the code they vouch for — "
        "re-run the duplicate-scan probe and refresh fn_sha + note: "
        + str([
            (r["function"], r["frame"], r["adjudicated_sha"], r["fn_sha"])
            for r in stale
        ])
    )


# single-evaluation pins for the operators fixed by the r07 sweep: the
# persisted frame shows up as InMemoryTableScan (or the restructure
# removes the duplicate subtree) in the physical plan.
@pytest.mark.parametrize(
    "query",
    [
        "q92_funnel_conversion",
        "q155_source_reputation",
        "q161_source_overlap",
        "q171_dsir_importance",
        "q195_doremi_mix",
        "q215_countmin_sketch",
        "q119_lm_quality",
        "q104_bm25_topk",
        "q128_boilerplate_lines",
        "q204_rollup_reconcile",
    ],
)
def test_fixed_operator_plans_pin_single_evaluation(spark, query):
    plan = formatted_plan(registry.QUERIES[query](spark, SF_DIR))
    assert "InMemoryTableScan" in plan, (
        f"{query}: expected the r07 exchange-reuse persist in the plan"
    )


def test_token_tvd_corpus_total_derives_from_sources_not_vocab(spark):
    """q216's n_corpus comes from the sources-bounded totals, not a
    second vocab-wide pass: the plan has exactly one wtot-style
    (word-keyed) aggregate above the cached sw."""
    plan = formatted_plan(registry.QUERIES["q216_token_tvd"](spark, SF_DIR))
    assert "InMemoryTableScan" in plan
    # the vocab-keyed aggregate (groupBy w) feeds ONLY the join now; a
    # regression reintroducing the second pass shows up as two
    # hash-aggregates keyed on w alone
    import re

    w_aggs = re.findall(r"Keys \[1\]: \[w#\d+\]", plan)
    assert len(w_aggs) <= 2, plan  # partial+final of the single wtot agg


def test_cachereg_same_plan_reregistration_keeps_cache(spark):
    """Round-7 cachereg fix: Spark caches by ANALYZED PLAN, so evicting
    an old registration whose plan equals a newer one must NOT uncache
    the newer frame. Re-registering the same plan refreshes recency
    instead of growing the list, and eviction skips unpersist while any
    live registration shares the plan."""
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark import cachereg

    cachereg.release_all()
    base = spark.range(0, 100).groupBy((F.col("id") % 5).alias("k")).count()

    def build():
        df = spark.range(0, 100).groupBy((F.col("id") % 5).alias("k")).count().persist()
        cachereg.register(df, family="_test_sameplan")
        df.count()  # materialize
        return df

    first = build()
    assert "InMemoryRelation" in first._jdf.queryExecution().optimizedPlan().toString()
    # re-register the same plan 6x (past the keep bound of 4): with the
    # old behavior the evictions would unpersist the shared cache entry
    frames = [build() for _ in range(6)]
    last = frames[-1]
    assert "InMemoryRelation" in last._jdf.queryExecution().optimizedPlan().toString(), (
        "same-plan eviction uncached the live frame"
    )
    # and the family holds ONE entry for the one distinct plan
    with cachereg._LOCK:
        assert len(cachereg._CACHES["_test_sameplan"]) == 1
    cachereg.release_all()
    del base
