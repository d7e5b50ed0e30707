"""Wave 31 — sequence packing (concat-then-chunk LM training layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation


def _pack(spark, rows, L, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in curation.pack_sequences(docs, L, **kw).collect()
    }


def test_pack_sequences_hand_checked(spark):
    # tokens: d1=3, d2=2, d3=4, L=4
    # stream: [d1 d1 d1 d2 | d2 d3 d3 d3 | d3]
    out = _pack(
        spark,
        [(1, "a b c"), (2, "d e"), (3, "f g h i")],
        4,
    )
    assert (out[1].start_tok, out[1].end_tok) == (0, 3)
    assert (out[1].first_bin, out[1].last_bin, out[1].n_bins) == (0, 0, 1)
    assert (out[2].start_tok, out[2].end_tok) == (3, 5)
    assert (out[2].first_bin, out[2].last_bin, out[2].n_bins) == (0, 1, 2)  # straddles
    assert (out[3].start_tok, out[3].end_tok) == (5, 9)
    assert (out[3].first_bin, out[3].last_bin, out[3].n_bins) == (1, 2, 2)


def test_pack_sequences_empty_doc_occupies_no_space(spark):
    out = _pack(spark, [(1, "a b"), (2, "   "), (3, "c")], 4)
    assert out[2].n_tokens == 0 and out[2].n_bins == 0
    assert out[2].start_tok == out[2].end_tok == 2
    assert out[2].first_bin is None and out[2].last_bin is None
    # the empty doc does not shift its successor
    assert (out[3].start_tok, out[3].end_tok) == (2, 3)


def test_pack_sequences_spans_are_contiguous_and_partition_invariant(spark):
    rows = [(i, " ".join(["w"] * (1 + i % 7))) for i in range(200)]
    a = _pack(spark, rows, 32, n_parts=1)
    b = _pack(spark, rows, 32, n_parts=13)
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k].start_tok, a[k].end_tok, a[k].first_bin, a[k].last_bin) == (
            b[k].start_tok, b[k].end_tok, b[k].first_bin, b[k].last_bin,
        )
    # contiguity: each doc starts exactly where its predecessor ended
    ordered = [a[k] for k in sorted(a)]
    pos = 0
    for r in ordered:
        assert r.start_tok == pos
        pos = r.end_tok
    total = pos

    # derived bins: every bin holds exactly L tokens except the last
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = curation.pack_sequences(docs, 32).filter("n_tokens > 0")
    seg = spans.select(
        F.explode(F.expr("sequence(first_bin, last_bin)")).alias("bin"),
        "start_tok", "end_tok",
    )
    bins = {
        r.bin: r.n
        for r in seg.groupBy("bin").agg(
            F.sum(
                F.least(F.col("end_tok"), (F.col("bin") + 1) * 32)
                - F.greatest(F.col("start_tok"), F.col("bin") * 32)
            ).alias("n")
        ).collect()
    }
    last = max(bins)
    assert set(bins) == set(range(last + 1))  # no bin gaps
    for b_id, n in bins.items():
        assert n == (32 if b_id < last else total - 32 * last)


def test_pack_sequences_sparse_skewed_keys_still_exact(spark):
    # key space far wider than n_parts, heavily clustered: the value-
    # derived part id must still produce an exact global prefix sum
    rows = [(k, "x y z") for k in [1, 2, 3, 1_000_000, 1_000_001, 50_000_000]]
    out = _pack(spark, rows, 4, n_parts=8)
    ordered = [out[k] for k in sorted(out)]
    pos = 0
    for r in ordered:
        assert (r.start_tok, r.end_tok) == (pos, pos + 3)
        pos += 3


def test_pack_sequences_no_global_single_task_window(spark):
    """The prefix sum must not serialize through one window partition:
    the physical plan's window spec is keyed on __part, never an
    empty-partition global window."""
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        curation.pack_sequences(docs, 16, n_parts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    window_line = next(
        ln for ln in plan.splitlines() if "Window" in ln and "__lsum" in ln
    )
    assert "__part" in window_line, window_line
