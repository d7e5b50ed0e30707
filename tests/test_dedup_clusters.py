"""Cluster-resolution semantics: verified pairs → connected components →
canonical representative (operators/dedup.py:neardup_clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import dedup


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = dedup.neardup_clusters(df)
    return {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in out.collect()
    }


def test_transitive_chain_collapses_to_one_cluster(spark):
    # A~B, B~C, C~D: one cluster of 4, min id canonical — a pairwise
    # "drop right side" policy would wrongly delete B, C AND D's matches
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got[1] == (1, 4, True)
    assert got[2] == (1, 4, False)
    assert got[3] == (1, 4, False)
    assert got[4] == (1, 4, False)
    assert got[10] == (10, 2, True)
    assert got[11] == (10, 2, False)


def test_pair_order_does_not_matter(spark):
    # edges given in both orientations and shuffled order converge the same
    got = _clusters(spark, [(5, 2), (2, 9), (9, 5), (7, 2)])
    assert {k: v[0] for k, v in got.items()} == {2: 2, 5: 2, 7: 2, 9: 2}
    assert all(size == 4 for _, size, _ in got.values())


def test_long_path_needs_multiple_rounds(spark):
    # a 9-node path has diameter 8 — exercises the iteration loop past the
    # near-clique fast case and the convergence probe
    path = [(i, i + 1) for i in range(1, 9)]
    got = _clusters(spark, path)
    assert {k: v[0] for k, v in got.items()} == {i: 1 for i in range(1, 10)}
    canonical = [k for k, (_, _, c) in got.items() if c]
    assert canonical == [1]
