"""End-to-end bulkload pipeline + HFile-layout invariants (SURVEY.md §5
test strategy items 3 & 4)."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import tsdb
from hbase_bulkload_service_spark.sources import hfile
from hbase_bulkload_service_spark.sources.tables import load_events


@pytest.fixture(scope="module")
def kv(spark, sf_dir):
    cells = tsdb.derive_tsdb_cells(load_events(spark, sf_dir))
    return tsdb.bulkload_kv(cells, num_partitions=8).cache()


def test_kv_is_deduped(kv):
    dup = kv.groupBy("key", "qualifier").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_salt_prefix_matches_bucket(kv):
    from hbase_bulkload_service_spark.functions.codec import key_bucket

    bad = kv.filter(key_bucket(F.col("key")) != F.col("bucket")).count()
    assert bad == 0
    assert kv.select("bucket").distinct().filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= 512)
    ).count() == 0


def test_parquet_hfile_layout(spark, kv, tmp_path):
    path = str(tmp_path / "hfiles")
    manifest = hfile.write_hfiles(kv, path, num_partitions=8)
    assert os.path.exists(os.path.join(path, "_manifest.json"))
    assert manifest["regions"]
    hfile.validate_layout(spark, path)  # sorted, non-overlapping, capped


def test_rollup_region_step(spark, kv, tmp_path):
    path = str(tmp_path / "hfiles_rollup")
    hfile.write_hfiles(kv, path, rollup=True, num_partitions=8)
    df = spark.read.parquet(path)
    bad = df.filter(F.expr("bucket div 8") != F.col("region")).count()
    assert bad == 0
    hfile.validate_layout(spark, path, rollup=True)


def test_hfl1_binary_container(kv, tmp_path):
    path = str(tmp_path / "hfl1")
    manifest = hfile.write_hfl1_files(kv, path)
    assert manifest
    total = 0
    for entry in manifest:
        fpath = os.path.join(path, entry["file"])
        with open(fpath, "rb") as f:
            data = f.read()
        assert data[:4] == hfile.HFL1_MAGIC
        # layout: MAGIC | records | trailer_len(4B) | trailer
        pos, last_key, n = 4, None, 0
        for _ in range(entry["rows"]):
            klen, flen, qlen, vlen = struct.unpack(">IIII", data[pos : pos + 16])
            pos += 16
            key = data[pos : pos + klen]
            pos += klen + flen + qlen + vlen
            if last_key is not None:
                assert key >= last_key
            last_key = key
            n += 1
        # after all records comes the trailer length prefix
        (trailer_len,) = struct.unpack(">I", data[pos : pos + 4])
        assert pos + 4 + trailer_len == len(data)
        trailer = data[pos + 4 :]
        (count,) = struct.unpack(">I", trailer[:4])
        assert count == entry["rows"]
        assert n == entry["rows"]
        total += n
    assert total == kv.count()
    with open(os.path.join(path, "_manifest.json")) as f:
        assert json.load(f) == manifest
