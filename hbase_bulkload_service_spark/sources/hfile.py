"""HFile-layout sink (SURVEY.md §2.H H1-H3) — sorted, per-region,
non-overlapping KV files + manifest, with a pluggable binary container.

Reference writers:
- H1 stock `HFileOutputFormat2` config (bulkload/HFileOutputUtil.java:17-39:
  snappy, replication 1, ≤2048 files/region/family);
- H2 rolling writer, one file per 2-byte salt prefix
  (bulkload/HadoopOutputFormat2.java:85-160 — roll on prefix change in the
  sorted stream);
- H3 same with 8 buckets per file (HadoopOutputFormat3.java:87-104, step 8
  — the rollup table's 64-region layout, HBaseManager.java:360-368).

Spark-first design (SURVEY.md §4.2): instead of relying on each task's
stream being sorted and hoping partitions don't overlap (the reference's
contract), the requirement is declared once —
``repartitionByRange(region, key) + sortWithinPartitions`` — giving
globally non-overlapping, internally sorted files per region. The default
container is sorted parquet (snappy) per region directory; `HFL1` is a
minimal pure-Python binary KV container for jar-less HFile-shaped output
(PySpark cannot instantiate HFileOutputFormat2 without HBase jars; the
sorted/partitioned layout is the tested contract, the container is
pluggable — SURVEY.md §4.2 point 2).

The adoption step (LoadIncrementalHFiles, HBaseController.java:232-254, H7)
is an external contract: `validate_layout` is the no-op load stub that
checks exactly what adoption requires — ordering, non-overlap, file caps.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FILES_PER_REGION = 2048  # HFileOutputUtil.java:20
ROLLUP_BUCKETS_PER_REGION = 8  # HadoopOutputFormat3.java:24,97

HFL1_MAGIC = b"HFL1"


def assign_region(kv: DataFrame, rollup: bool = False) -> DataFrame:
    """region id = bucket (raw table: 512 regions) or bucket div 8 (rollup:
    64 regions) — mirrors the two writers' roll keys."""
    step = ROLLUP_BUCKETS_PER_REGION if rollup else 1
    return kv.withColumn("region", F.expr(f"bucket div {step}").cast("int"))


def write_hfiles(
    kv: DataFrame,
    path: str,
    rollup: bool = False,
    num_partitions: int | None = None,
    manifest: bool = True,
) -> dict | None:
    """Write the KV stream as one sorted parquet directory per region +
    manifest.json. Input: columns (bucket, key, key_hex, family, qualifier,
    qualifier_hex, value) — e.g. from operators.tsdb.bulkload_kv.

    Scale: range partitioning on (region, key_hex) keeps each region's data
    in contiguous partitions; the dynamic-partition writer rolls files on
    region change exactly like HadoopOutputFormat2.writeRecord.

    ``manifest=False`` skips the readback pass; a caller that re-reads the
    output anyway can derive the same stats from its own scan and persist
    them with :func:`write_manifest` (avoids scanning the data twice).
    """
    regions = assign_region(kv, rollup)
    n = num_partitions or 64
    (
        regions.repartitionByRange(n, "region", "key_hex", "qualifier_hex")
        .sortWithinPartitions("region", "key_hex", "qualifier_hex")
        .write.partitionBy("region")
        .option("compression", "snappy")
        .mode("overwrite")
        .parquet(path)
    )
    if not manifest:
        return None
    m = build_manifest(kv.sparkSession, path)
    write_manifest(path, m)
    return m


def write_manifest(path: str, manifest: dict) -> None:
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


def manifest_from_region_stats(rows) -> dict:
    """Build the manifest dict from per-region stats rows carrying
    ``region``, ``n_cells`` (or ``rows``), ``min_key_hex``, ``max_key_hex``
    — lets a caller that already aggregated a readback persist the manifest
    without a second scan."""
    return {
        "regions": {
            str(r["region"]): {
                "rows": r["n_cells"] if "n_cells" in r else r["rows"],
                "min_key_hex": r["min_key_hex"],
                "max_key_hex": r["max_key_hex"],
            }
            for r in rows
        }
    }


def build_manifest(spark, path: str) -> dict:
    df = spark.read.parquet(path)
    rows = (
        df.groupBy("region")
        .agg(
            F.count("*").alias("rows"),
            F.min("key_hex").alias("min_key_hex"),
            F.max("key_hex").alias("max_key_hex"),
        )
        .orderBy("region")
        .collect()
    )
    return {
        "regions": {
            str(r["region"]): {
                "rows": r["rows"],
                "min_key_hex": r["min_key_hex"],
                "max_key_hex": r["max_key_hex"],
            }
            for r in rows
        }
    }


def validate_layout(spark, path: str, rollup: bool = False) -> None:
    """No-op `load` stub (H7): assert what LoadIncrementalHFiles needs —
    per-region files internally sorted, regions non-overlapping in key
    space, region == its keys' bucket prefix, ≤2048 files per region."""
    df = spark.read.parquet(path)
    step = ROLLUP_BUCKETS_PER_REGION if rollup else 1

    bad_bucket = df.filter(F.expr(f"bucket div {step}") != F.col("region")).count()
    if bad_bucket:
        raise AssertionError(f"{bad_bucket} rows landed in the wrong region")

    bounds = (
        df.groupBy("region")
        .agg(F.min("key_hex").alias("lo"), F.max("key_hex").alias("hi"))
        .orderBy("region")
        .collect()
    )
    prev_hi, prev_region = None, None
    for r in bounds:
        if prev_hi is not None and r["lo"] < prev_hi:
            raise AssertionError(
                f"regions {prev_region} and {r['region']} overlap in key space"
            )
        prev_hi, prev_region = r["hi"], r["region"]

    for region_dir in sorted(os.listdir(path)):
        if not region_dir.startswith("region="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(path, region_dir))
            if f.endswith(".parquet")
        ]
        if len(files) > MAX_FILES_PER_REGION:
            raise AssertionError(
                f"{region_dir}: {len(files)} files > {MAX_FILES_PER_REGION}"
            )


# ---------------------------------------------------------------------------
# HFL1 — minimal binary sorted-KV container (jar-less HFile stand-in)
# ---------------------------------------------------------------------------

def _hfl1_encode_records(rows) -> tuple[bytes, int, bytes | None, bytes | None]:
    body = bytearray()
    count = 0
    first = last = None
    for row in rows:
        key, fam, qual, val = row["key"], row["family"], row["qualifier"], row["value"]
        if last is not None and bytes(key) < bytes(last):
            raise AssertionError("HFL1 input not sorted by key")
        rec = bytes(key), bytes(fam), bytes(qual), bytes(val)
        body.extend(struct.pack(">IIII", *(len(p) for p in rec)))
        for p in rec:
            body.extend(p)
        first = first if first is not None else bytes(key)
        last = bytes(key)
        count += 1
    return bytes(body), count, first, last


def write_hfl1_files(kv: DataFrame, path: str, rollup: bool = False) -> list[dict]:
    """Binary-container variant of the H2/H3 writer: each task writes one
    HFL1 file per region it holds, rolling on region change exactly like
    HadoopOutputFormat2.writeRecord (:85-100). Input must already be range
    partitioned + sorted (use through `operators.tsdb.bulkload_kv`)."""
    os.makedirs(path, exist_ok=True)
    regions = assign_region(kv, rollup)
    sorted_kv = regions.repartitionByRange(
        16, "region", "key_hex", "qualifier_hex"
    ).sortWithinPartitions("region", "key_hex", "qualifier_hex")

    def write_partition(pid: int, it):
        out = []
        current_region, buf = None, []

        def flush():
            if current_region is None or not buf:
                return
            body, count, first, last = _hfl1_encode_records(buf)
            fname = os.path.join(path, f"region_{current_region:05d}_p{pid:05d}.hfl1")
            trailer = struct.pack(">I", count) + first + last
            with open(fname, "wb") as f:
                f.write(HFL1_MAGIC)
                f.write(body)
                f.write(struct.pack(">I", len(trailer)))
                f.write(trailer)
            out.append(
                {
                    "file": os.path.basename(fname),
                    "region": current_region,
                    "rows": count,
                    "min_key_hex": first.hex().upper(),
                    "max_key_hex": last.hex().upper(),
                }
            )

        for row in it:
            if row["region"] != current_region:
                flush()
                current_region, buf = row["region"], []
            buf.append(row)
        flush()
        return out

    results = sorted_kv.rdd.mapPartitionsWithIndex(
        lambda pid, it: iter(write_partition(pid, it))
    ).collect()
    manifest = sorted(results, key=lambda r: (r["region"], r["file"]))
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
