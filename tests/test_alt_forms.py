"""Equivalence pins for documented alternate operator forms: each
superseded-but-kept variant must produce the SAME results as its
preferred twin (the docstrings claim it; these tests enforce it), and
the generic operators the registry inlines (lookup_join, load_all,
legacy timestamp aliases) get direct coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

from hbase_bulkload_service_spark.operators import dedup
from hbase_bulkload_service_spark.operators import table as tbl
from hbase_bulkload_service_spark.functions import codec
from hbase_bulkload_service_spark.sources.tables import load, load_all

SF_DIR = "/root/testdata/sf0.001"


def test_minhash_signature_forms_agree(spark):
    """explode+groupBy signatures == map-side array_min signatures."""
    docs = load(spark, SF_DIR, "documents").limit(50)
    long_form = dedup.minhash_signatures(dedup.word_shingles(docs))
    arr_form = dedup.minhash_signatures_arr(dedup.shingle_arrays(docs))
    cols = sorted(long_form.columns)
    a = sorted(map(tuple, long_form.select(cols).collect()))
    b = sorted(map(tuple, arr_form.select(cols).collect()))
    assert a == b and len(a) == 50


def test_pair_jaccard_forms_agree(spark):
    docs = load(spark, SF_DIR, "documents").limit(80)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in zip(ids[0::2], ids[1::2])], "doc_a long, doc_b long"
    )
    cols = ["doc_a", "doc_b", "inter", "jaccard"]
    via_index = dedup.pair_jaccard(pairs, dedup.word_shingles(docs))
    via_arrays = dedup.pair_jaccard_arrays(pairs, dedup.shingle_arrays(docs))
    a = sorted(map(tuple, via_index.select(cols).collect()))
    b = sorted(
        map(
            tuple,
            via_arrays.select(cols).filter(F.col("inter") > 0).collect(),
        )
    )
    # the inverted-index form only materializes pairs with >=1 shared
    # shingle; the array form scores every candidate — restrict to the
    # common support and require identical numbers there
    assert a == b


def test_lookup_join_semantics(spark):
    htable = spark.createDataFrame(
        [("k1", 10), ("k2", 20)], "rowkey string, v int"
    )
    probe = spark.createDataFrame(
        [("k1",), ("k3",)], "pk string"
    )
    inner = tbl.lookup_join(probe, "pk", htable, how="inner")
    assert [(r.pk, r.v) for r in inner.collect()] == [("k1", 10)]
    left = tbl.lookup_join(probe, "pk", htable, how="left")
    got = sorted((r.pk, r.v) for r in left.collect())
    assert got == [("k1", 10), ("k3", None)]
    with pytest.raises(ValueError):
        tbl.lookup_join(probe, "pk", htable, how="full")


def test_legacy_timestamp_alias_matches_canonical(spark):
    df = spark.createDataFrame(
        [("2024-01-10 06:30:00",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    out = df.select(
        codec.encode_timestamp_legacy(F.col("ts")).alias("leg"),
        codec.encode_timestamp_ms(F.col("ts")).alias("canon"),
    ).collect()[0]
    assert bytes(out.leg) == bytes(out.canon) and len(bytes(out.leg)) == 8
    back = df.select(
        codec.decode_timestamp_legacy(
            codec.encode_timestamp_legacy(F.col("ts"))
        ).alias("rt"),
        "ts",
    ).collect()[0]
    assert back.rt == back.ts


def test_load_all_returns_every_table(spark):
    tables = load_all(spark, SF_DIR)
    assert set(tables) >= {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert all(df.count() > 0 for df in tables.values())
