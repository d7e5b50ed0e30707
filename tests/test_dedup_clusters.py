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


# ---------------------------------------------------------------------------
# round-3 training-data ops: chunking + benchmark contamination
# ---------------------------------------------------------------------------

def test_chunk_documents_covers_every_token_with_overlap(spark):
    from hbase_bulkload_service_spark.operators.textops import chunk_documents
    from pyspark.sql import functions as F

    text = " ".join(f"tok{i}" for i in range(95))
    docs = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=50, stride=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 95 tokens → ceil((95-10)/40) = 3 chunks: [0:50], [40:90], [80:95]
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tok"] for r in c1] == [50, 50, 15]
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    # short doc → exactly one whole-doc chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tok"] == 2
    # md5 matches an independent recomputation of the window
    import hashlib
    toks = text.split(" ")
    want = hashlib.md5(" ".join(toks[40:90]).encode()).hexdigest()
    assert c1[1]["chunk_md5"] == want


def test_chunk_documents_rejects_bad_geometry(spark):
    from hbase_bulkload_service_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, stride=20)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, stride=0)


def test_benchmark_contamination_detects_planted_overlap(spark):
    from hbase_bulkload_service_spark.operators.dedup import benchmark_contamination

    bench_text = " ".join(f"b{i}" for i in range(20))       # 20 tokens
    clean_text = " ".join(f"c{i}" for i in range(30))       # disjoint
    # dirty doc embeds the benchmark verbatim inside its own text
    dirty_text = " ".join(f"d{i}" for i in range(10)) + " " + bench_text
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, clean_text), (2, dirty_text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in benchmark_contamination(corpus, bench, k=8).collect()}
    assert out[1]["n_contaminated"] == 0 and out[1]["contamination_ppm"] == 0
    # dirty doc: 30 tokens → 23 shingles; the benchmark's 13 8-gram
    # shingles all appear inside it
    assert out[2]["n_shingles"] == 23
    assert out[2]["n_contaminated"] == 13
    assert out[2]["contamination_ppm"] == (13 * 1_000_000) // 23
