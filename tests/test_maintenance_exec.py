"""K3-K5 execution lifecycle over the HFile-layout partition tree:
backup (copy out) → removal (partition drop) → restore (bucket-matched
graft) must round-trip the table's contents exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import maintenance as mnt
from hbase_bulkload_service_spark.operators import tsdb
from hbase_bulkload_service_spark.sources import hfile
from hbase_bulkload_service_spark.sources.tables import load_events


@pytest.fixture(scope="module")
def table(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("maint") / "table")
    cells = tsdb.derive_tsdb_cells(load_events(spark, sf_dir))
    kv = tsdb.bulkload_kv(cells, num_partitions=8)
    hfile.write_hfiles(kv, path, num_partitions=8)
    return path


def _rows(spark, path):
    return sorted(
        (r.region, r.key_hex, r.qualifier_hex, bytes(r.value).hex())
        for r in spark.read.parquet(path).select(
            "region", "key_hex", "qualifier_hex", "value"
        ).collect()
    )


def test_backup_remove_restore_roundtrip(spark, table, tmp_path):
    backup = str(tmp_path / "backup")
    before = _rows(spark, table)
    regions = sorted(
        int(d.split("=")[1]) for d in os.listdir(table) if d.startswith("region=")
    )[:3]

    manifest = mnt.execute_backup(table, regions, backup)
    assert [m["region"] for m in manifest] == regions
    assert all(m["n_files"] > 0 and m["size_bytes"] > 0 for m in manifest)

    dropped = mnt.execute_removal(table, regions)
    assert dropped == regions
    remaining = _rows(spark, table)
    assert 0 < len(remaining) < len(before)
    assert not any(r[0] in regions for r in remaining)

    grafted = mnt.execute_restore(backup, table, regions)
    assert all(g["n_files"] > 0 for g in grafted)
    assert _rows(spark, table) == before


def test_restore_is_additive_not_clobbering(spark, table, tmp_path):
    # grafting into a live region keeps its existing files (the reference
    # copies recovered HFiles INTO the region dir, it does not replace it)
    backup = str(tmp_path / "backup2")
    regions = sorted(
        int(d.split("=")[1]) for d in os.listdir(table) if d.startswith("region=")
    )[:1]
    region_dir = os.path.join(table, f"region={regions[0]}")
    mnt.execute_backup(table, regions, backup)
    files_before = set(os.listdir(region_dir))
    mnt.execute_restore(backup, table, regions)
    assert files_before <= set(os.listdir(region_dir))


def test_backup_recovers_from_crash_orphaned_old(spark, table, tmp_path):
    """ADVICE round 2: a crash between rename(dst, old) and rename(tmp, dst)
    leaves only region=N.old; the next execute_backup run must recover it
    (rename back) for ALL regions in the backup root, then proceed."""
    backup = str(tmp_path / "bk")
    regions = sorted(
        int(d.split("=")[1]) for d in os.listdir(table) if d.startswith("region=")
    )[:2]
    ra, rb = regions
    manifest = mnt.execute_backup(table, regions, backup)
    assert {m["region"] for m in manifest} == set(regions)
    # simulate mid-swap crash for rb: dst gone, .old holds the backup
    db = os.path.join(backup, f"region={rb}")
    os.rename(db, db + ".old")
    # recovery sweep runs even when rb is NOT in this call's list
    mnt.execute_backup(table, [ra], backup)
    assert os.path.isdir(db), ".old orphan was not recovered"
    assert not os.path.isdir(db + ".old")
    # and a subsequent restore sees it
    restored = mnt.execute_restore(backup, table, [rb])
    assert restored[0]["n_files"] >= 1
