"""Z-order layout: key correctness vs an independent Python interleave and
the locality property that justifies it — per-file bounding boxes stay
compact in BOTH dimensions, unlike a lexicographic sort."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.sources.layout import write_zordered, zorder_key


def _py_z(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 1023) for b in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 10).alias("z")).collect()
    for r in out:
        assert r["z"] == _py_z(r["a"], r["b"], 10), (r["a"], r["b"])


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """With (x, y) uniform on a 64×64 grid, z-ordered files cover compact
    rectangles: the mean per-file extent of Y is FAR below the full range,
    while an x-sorted layout leaves Y unconstrained (~full range per
    file). This is exactly what parquet min/max stats prune on."""
    n = 64 * 64 * 8
    df = spark.range(n).select(
        (F.col("id") % 64).cast("int").alias("x"),
        ((F.col("id") / 64) % 64).cast("int").alias("y"),
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "x")
    write_zordered(df, zpath, "x", "y", bits=6, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def mean_y_extent(path):
        back = spark.read.parquet(path).withColumn("f", F.input_file_name())
        ext = back.groupBy("f").agg(
            (F.max("y") - F.min("y")).alias("ey"), F.count("*").alias("n")
        )
        rows = [r for r in ext.collect() if r["n"] > 50]  # skip slivers
        return sum(r["ey"] for r in rows) / len(rows)

    z_ext = mean_y_extent(zpath)
    x_ext = mean_y_extent(xpath)
    assert len(glob.glob(f"{zpath}/*.parquet")) > 4
    assert z_ext < x_ext / 2, (z_ext, x_ext)
    assert z_ext <= 32, z_ext  # compact rectangles, not full-range stripes


def test_zorder_key_rejects_out_of_budget_values(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from hbase_bulkload_service_spark.sources import layout

    df = spark.createDataFrame([(1 << 20, 3)], "a long, b long")
    out = df.select(layout.zorder_key(F.col("a"), F.col("b"), bits=16).alias("z"))
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="bit budget"):
        out.collect()
