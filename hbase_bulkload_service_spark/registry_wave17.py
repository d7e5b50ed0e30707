"""Registry wave 17 (round 5): the REAL Apache HFile v3 container gate.

q167 drives the q56/q116 flagship bulkload pipeline through
sources/hfilev3.py — the actual HBase on-disk v3 byte format (33-byte
checksummed block headers, root index, PBUF file info, 4096-byte
protobuf trailer) that ``LoadIncrementalHFiles`` adopts (reference
``controller/HBaseController.java:232-254``, ``HFileOutputUtil.java``)
— and verifies it against the same container-agnostic first-principles
oracle as q116 (the oracle recomputes from source data; only the bytes
on disk differ between the two gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.functions.codec import decode_double_be
from hbase_bulkload_service_spark.operators import tsdb
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_wave8 import HFL_CONTAINER_ORACLE
from hbase_bulkload_service_spark.sources import hfile, hfilev3
from hbase_bulkload_service_spark.sources.tables import load_events

# ===========================================================================
# q167 — bulkload e2e through the REAL HFile v3 byte format
# ===========================================================================


@register("q167_hfilev3_container", HFL_CONTAINER_ORACLE)
def q167_hfilev3_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q56's flagship pipeline emitted as REAL HFile v3 bytes: salt →
    dedup → range-partition+sort → one HFile per region per task
    (sources/hfilev3.py: DATA blocks with the 33-byte v2/v3 header and
    CRC chunk checksums, single-level root index, PBUF-framed file
    info, 4096-byte protobuf fixed trailer with the v3 version word),
    then read BACK by opening each file exactly as HBase's HFile.Reader
    does — trailer magic/version, load-on-open walk, index→block
    agreement, per-block CRC verify, global cell order, entry-count and
    LASTKEY agreement — one task per file, plus the manifest-level
    layout checks adoption requires. Summarized per region against the
    SAME container-agnostic oracle as q116: a bug anywhere in the block
    framing, index arithmetic, protobuf encoding, or trailer breaks the
    readback and the row (reference HBaseController.java:232-254,
    HFileOutputUtil.java:17-39)."""
    cells = tsdb.derive_tsdb_cells(load_events(spark, sf_dir, spread=True))
    c1 = cells.withColumn("value", tsdb.encode_double_be(F.col("dvalue")))
    kv = tsdb.bulkload_kv(c1, num_partitions=16, tie_col="dvalue")

    from hbase_bulkload_service_spark.registry_wave4 import _scratch

    d = _scratch("q167hfilev3")
    import shutil

    shutil.rmtree(d, ignore_errors=True)  # fresh layout on re-run
    hfilev3.write_hfilev3_files(kv, d, rollup=True, num_partitions=16)
    # manifest-level layout checks in the driver (container-agnostic:
    # bucket-prefix spans, file caps, region disjointness); the per-file
    # container invariants run inside the distributed reading tasks
    summary = hfile.validate_hfl2_layout(d, rollup=True, deep=False)
    assert not summary["per_record_validated"] and summary["pending"]
    back = hfilev3.read_hfilev3_dir(spark, d)
    return back.groupBy("region").agg(
        F.count("*").alias("n_cells"),
        F.countDistinct("key_hex").alias("n_keys"),
        F.min("key_hex").alias("min_key_hex"),
        F.max("key_hex").alias("max_key_hex"),
        F.sum(
            F.floor(decode_double_be(F.col("value")) * 100).cast("long")
        ).alias("sum_value_cents"),
    )


# ===========================================================================
# q168 — same e2e gate under the GZ codec (compressed-block framing path)
# ===========================================================================


@register("q168_hfilev3_gz", HFL_CONTAINER_ORACLE)
def q168_hfilev3_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q167 under ``Compression.Algorithm.GZ``: every block's payload is
    a gzip member, so onDiskSizeWithoutHeader and
    uncompressedSizeWithoutHeader genuinely diverge — the compressed-
    block arithmetic (checksums over compressed bytes, index sizes in
    on-disk terms, trailer codec ordinal 1) is exercised end-to-end and
    must reproduce the same per-region summary as the uncompressed gate
    and the shared container-agnostic oracle. GZ stands in for the
    reference DDL's SNAPPY (HBaseManager.java:381 — same framing, codec
    library not present in this container; both are one-ordinal swaps)."""
    cells = tsdb.derive_tsdb_cells(load_events(spark, sf_dir, spread=True))
    c1 = cells.withColumn("value", tsdb.encode_double_be(F.col("dvalue")))
    kv = tsdb.bulkload_kv(c1, num_partitions=16, tie_col="dvalue")

    from hbase_bulkload_service_spark.registry_wave4 import _scratch

    d = _scratch("q168hfilev3gz")
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    hfilev3.write_hfilev3_files(
        kv, d, rollup=True, num_partitions=16, compression="GZ"
    )
    hfile.validate_hfl2_layout(d, rollup=True, deep=False)
    back = hfilev3.read_hfilev3_dir(spark, d)
    return back.groupBy("region").agg(
        F.count("*").alias("n_cells"),
        F.countDistinct("key_hex").alias("n_keys"),
        F.min("key_hex").alias("min_key_hex"),
        F.max("key_hex").alias("max_key_hex"),
        F.sum(
            F.floor(decode_double_be(F.col("value")) * 100).cast("long")
        ).alias("sum_value_cents"),
    )
