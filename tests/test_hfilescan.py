"""DSv2 scan source over the HFile-layout sink: per-region split planning,
rowkey-range split elision, and exact agreement with a plain parquet read."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import tsdb
from hbase_bulkload_service_spark.sources import hfile, hfilescan
from hbase_bulkload_service_spark.sources.tables import load_events


@pytest.fixture(scope="module")
def sink_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hflscan") / "sink")
    kv = tsdb.bulkload_kv(
        tsdb.derive_tsdb_cells(load_events(spark, "/root/testdata/sf0.001"))
    )
    hfile.write_hfiles(kv, out)
    hfilescan.register(spark)
    return out


def _manifest(sink_dir):
    with open(os.path.join(sink_dir, "_manifest.json")) as fh:
        return json.load(fh)


def test_full_scan_matches_parquet(spark, sink_dir):
    dsv2 = spark.read.format("hfilescan").option("path", sink_dir).load()
    plain = spark.read.parquet(sink_dir)
    assert dsv2.count() == plain.count() > 0
    a = sorted(
        (r.region, r.key_hex, r.qualifier_hex, bytes(r.value).hex())
        for r in dsv2.collect()
    )
    b = sorted(
        (r.region, r.key_hex, r.qualifier_hex, bytes(r.value).hex())
        for r in plain.collect()
    )
    assert a == b


def test_range_filter_elides_region_splits(spark, sink_dir):
    man = _manifest(sink_dir)
    n_regions = len(man["regions"])
    mids = sorted(i["min_key_hex"] for i in man["regions"].values())
    mid = mids[n_regions // 2]
    dsv2 = spark.read.format("hfilescan").option("path", sink_dir).load()
    filtered = dsv2.filter(F.col("key_hex") >= mid)
    # split planning sees the pushed bound: regions entirely below the
    # range are never planned (AbstractTableInputFormat.java:248-273)
    assert filtered.rdd.getNumPartitions() < n_regions
    plain = (
        spark.read.parquet(sink_dir).filter(F.col("key_hex") >= mid).count()
    )
    assert filtered.count() == plain > 0


def test_point_get_prunes_to_one_split(spark, sink_dir):
    dsv2 = spark.read.format("hfilescan").option("path", sink_dir).load()
    some_key = dsv2.select("key_hex").limit(1).collect()[0][0]
    got = dsv2.filter(F.col("key_hex") == some_key)
    assert got.rdd.getNumPartitions() == 1  # split ∩ point range
    assert got.count() >= 1
