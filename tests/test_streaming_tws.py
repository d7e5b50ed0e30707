"""transformWithState twin of the latest-version upsert stream: the
Spark-4 stateful API (RocksDB provider) must reproduce the
applyInPandasWithState operator bit-for-bit on the same finite replay."""

from __future__ import annotations

import importlib.util

import pytest

from hbase_bulkload_service_spark.streaming import ops as st

try:  # find_spec raises if the parent 'google' namespace is absent
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False


@pytest.fixture()
def cells_dir(spark, tmp_path):
    d = str(tmp_path / "cells_tws")
    rows1 = [
        ("k1", "q1", 100, 1.0),
        ("k1", "q1", 200, 2.0),
        ("k2", "q1", 100, 5.0),
    ]
    rows2 = [
        ("k1", "q1", 150, 9.0),  # older than current latest — no-op
        ("k2", "q1", 300, 7.0),  # newer — upsert
    ]
    spark.createDataFrame(rows1, st.CELL_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(rows2, st.CELL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d


def _snapshot(spark, table):
    return {
        (r.key, r.qualifier): (r.version_ts, r.value)
        for r in spark.sql(
            f"SELECT key, qualifier, max_by(version_ts, version_ts) version_ts,"
            f" max_by(value, version_ts) value FROM {table}"
            f" GROUP BY key, qualifier"
        ).collect()
    }


def _run(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    st.await_finite(q, 120)


def test_tws_raises_loudly_without_protobuf(spark, cells_dir):
    """Without protobuf the raw API crashes the TWS driver worker with
    an opaque XXKST mid-query; the operator must fail up front with the
    real reason instead."""
    if _HAS_PROTOBUF:
        pytest.skip("protobuf present — the guard path is unreachable")
    stream = spark.readStream.schema(st.CELL_SCHEMA).parquet(cells_dir)
    with pytest.raises(ImportError, match="protobuf"):
        st.streaming_latest_version_tws(stream)


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState's Python state client needs protobuf "
    "(absent in this container); the operator guards loudly — see "
    "test_tws_raises_loudly_without_protobuf",
)
def test_tws_equals_applyinpandaswithstate(spark, cells_dir):
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(st.CELL_SCHEMA).parquet(cells_dir)
        _run(st.streaming_latest_version_tws(stream), "tws_cells")
        stream2 = spark.readStream.schema(st.CELL_SCHEMA).parquet(cells_dir)
        _run(st.streaming_latest_version(stream2), "aip_cells")
    finally:
        if old is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old)
    tws = _snapshot(spark, "tws_cells")
    aip = _snapshot(spark, "aip_cells")
    assert tws == aip  # migration contract: bit-equal on the same replay
    assert tws[("k1", "q1")] == (200, 2.0)
    assert tws[("k2", "q1")] == (300, 7.0)
