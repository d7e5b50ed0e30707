"""Edge semantics of the event-time as-of join and session windows.

The oracle parity test covers bulk behavior on real fixtures; these pin the
boundary rules: tie inclusivity, unmatched probes, same-(key, ts) build
collapse, and the exact-gap session boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators.table import asof_join
from hbase_bulkload_service_spark.operators.tsdb import sessionize


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_tie_is_inclusive_and_unmatched_is_null(spark):
    probe = spark.createDataFrame(
        [(1, 10, "p10"), (1, 5, "p5"), (1, 3, "p3"), (2, 7, "q7")],
        "k int, ts int, tag string",
    )
    build = spark.createDataFrame(
        [(1, 5, 50), (1, 10, 100), (3, 1, 999)], "k int, ts int, v int"
    )
    out = asof_join(probe, build, key="k", ts="ts")
    # ts=10 matches build ts=10 (inclusive), ts=5 matches 5, ts=3 and key=2
    # match nothing (left semantics)
    assert _rows(out, "k", "ts", "asof_ts", "asof_v") == [
        (1, 3, None, None),
        (1, 5, 5, 50),
        (1, 10, 10, 100),
        (2, 7, None, None),
    ]


def test_asof_collapses_duplicate_build_ts_deterministically(spark):
    probe = spark.createDataFrame([(1, 9)], "k int, ts int")
    build = spark.createDataFrame(
        [(1, 9, 1), (1, 9, 7), (1, 9, 3)], "k int, ts int, v int"
    )
    out = asof_join(probe, build, key="k", ts="ts")
    # same-(key, ts) build rows collapse to the struct max → max v wins
    assert _rows(out, "asof_ts", "asof_v") == [(9, 7)]


def test_asof_probe_columns_pass_through(spark):
    probe = spark.createDataFrame([(1, 4, "keepme")], "k int, ts int, extra string")
    build = spark.createDataFrame([(1, 2, 5)], "k int, ts int, v int")
    out = asof_join(probe, build, key="k", ts="ts")
    assert set(out.columns) == {"k", "ts", "extra", "asof_ts", "asof_v"}
    assert _rows(out, "extra", "asof_v") == [("keepme", 5)]


def test_asof_plan_has_single_shuffle(spark):
    probe = spark.createDataFrame([(1, 4)], "k int, ts int")
    build = spark.createDataFrame([(1, 2, 5)], "k int, ts int, v int")
    plan = asof_join(probe, build, key="k", ts="ts")._jdf.queryExecution().executedPlan().toString()
    # union + running last_value: the probe side is never range-joined, and
    # the tie collapse rides the window sort — exactly ONE keyed exchange
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("hashpartitioning(k") == 1


def test_sessionize_gap_boundary(spark):
    gap = 100
    ev = spark.createDataFrame(
        [
            # exactly gap apart → SAME session (≤ gap rule)
            (1, 0, 1.0),
            (1, 100, 1.0),
            # gap+1 → new session
            (1, 201, 2.0),
            # second key independent
            (2, 50, 3.0),
        ],
        "user_id int, ts_ms long, value double",
    )
    out = sessionize(ev, gap_ms=gap)
    assert _rows(
        out, "user_id", "session_seq", "session_start_ms", "session_end_ms", "n_events"
    ) == [
        (1, 1, 0, 100, 2),
        (1, 2, 201, 201, 1),
        (2, 1, 50, 50, 1),
    ]


def test_sessionize_single_shuffle(spark):
    ev = spark.createDataFrame([(1, 0, 1.0)], "user_id int, ts_ms long, value double")
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # lag, running sum, and the final agg all share partitionBy(user_id):
    # exactly one hashpartitioning exchange on user_id
    assert plan.count("hashpartitioning(user_id") <= 1


# ---------------------------------------------------------------------------
# KMeans-backed IVF (the ANN scale path)
# ---------------------------------------------------------------------------

def _emb_queries(spark):
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return emb, queries


def test_kmeans_ivf_exhaustive_probe_equals_brute_force(spark):
    """Probing every cell makes IVF search exact — same rows, same ranks
    as brute force (identical tie-breaking by construction)."""
    from hbase_bulkload_service_spark.operators import similarity as sim

    emb, queries = _emb_queries(spark)
    cents = sim.kmeans_centroids(emb, k=8, seed=7)
    bf = sorted(map(tuple, sim.brute_force_topk(emb, queries, k=5).collect()))
    ivf = sorted(
        map(tuple, sim.ivf_topk(emb, queries, cents, k=5, nprobe=8).collect())
    )
    assert ivf == bf


def test_kmeans_ivf_partial_probe_recall(spark):
    """nprobe=2 of 8 cells keeps most true neighbors (seeded k-means on
    fixed data ⇒ deterministic recall; bound set well under it)."""
    from hbase_bulkload_service_spark.operators import similarity as sim

    emb, queries = _emb_queries(spark)
    cents = sim.kmeans_centroids(emb, k=8, seed=7)
    bf = {(r.query_id, r.neighbor_id) for r in sim.brute_force_topk(emb, queries, k=5).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(emb, queries, cents, k=5, nprobe=2).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, recall


def test_interval_join_matches_brute_force(spark):
    """Bucketed rewrite == naive range predicate on deterministic data,
    including intervals that span many buckets, empty intervals (none),
    probes outside every interval, and overlapping intervals."""
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.operators.table import interval_join

    probe = spark.range(0, 500).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 1000).alias("ts")
    )
    # 20 intervals, widths 1..400, some overlapping
    iv = spark.range(0, 20).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 53) % 700).alias("lo"),
        (((F.col("id") * 53) % 700) + 1 + (F.col("id") * 21) % 400).alias("hi"),
    )
    fast = interval_join(probe, "ts", iv, "lo", "hi", bucket_width=64)
    brute = probe.crossJoin(iv).filter(
        (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))
    )
    cols = ["pid", "ts", "iid", "lo", "hi"]
    assert sorted(map(tuple, fast.select(cols).collect())) == sorted(
        map(tuple, brute.select(cols).collect())
    )
    assert fast.count() > 0
