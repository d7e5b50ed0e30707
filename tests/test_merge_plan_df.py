"""plan_merges_df (distributed transfer-function scan) must equal the
sequential plan_merges walk exactly — including cross-partition pending
carry, cross-bucket resets, and early termination — for any partitioning."""

from __future__ import annotations

import random

import pytest

from hbase_bulkload_service_spark.operators import maintenance as mnt

NOW_MS = 1_600_000_000_000


def _random_catalog(rng: random.Random, n: int) -> list[mnt.Region]:
    regions = []
    t_new = (NOW_MS - mnt.SHORT_INTERVAL_MS) // 1000
    t_old = (NOW_MS - mnt.LONG_INTERVAL_MS) // 1000
    for i in range(n):
        roll = rng.random()
        size = rng.choice(
            [mnt.LOWER_SIZE // 2, mnt.LOWER_SIZE * 2, mnt.UPPER_SIZE + 1]
        )
        # time window: mostly inside the mergeable band, some outside
        if rng.random() < 0.7:
            start = t_old + 1000
            end = t_new - 1000
        elif rng.random() < 0.5:
            start, end = t_old - 2000, t_old - 1000  # too old
        else:
            start, end = t_new + 1000, t_new + 2000  # too new
        bucket = i
        end_bucket: int | None = bucket
        if roll < 0.12:
            end_bucket = bucket + 1  # cross-bucket → reset
        elif roll < 0.15:
            end_bucket = None  # dirty end key → reset
        end_time: int | None = end
        if rng.random() < 0.02:
            end_time = None  # short end key → walk terminates
        regions.append(
            mnt.Region(f"r{i:04d}", bucket, end_bucket, start, end_time, size)
        )
    return regions


def _as_df(spark, regions):
    return spark.createDataFrame(
        [(r.name, r.start_bucket, r.end_bucket, r.start_time_sec,
          r.end_time_sec, r.size_bytes) for r in regions],
        "region_name string, start_bucket int, end_bucket int, "
        "start_time_sec long, end_time_sec long, size_bytes long",
    )


@pytest.mark.parametrize("seed,n,parts", [
    (1, 60, 1), (2, 60, 3), (3, 200, 7), (4, 200, 16), (5, 37, 5),
    (6, 500, 11), (7, 3, 8),
])
def test_plan_merges_df_equals_sequential(spark, seed, n, parts):
    rng = random.Random(seed)
    regions = _random_catalog(rng, n)
    expected = mnt.plan_merges(regions, NOW_MS)
    got = [
        (r["region_a"], r["region_b"])
        for r in mnt.plan_merges_df(
            _as_df(spark, regions), NOW_MS,
            order_cols=("region_name",), num_partitions=parts,
        ).collect()
    ]
    assert sorted(got) == sorted(expected), (
        f"seed={seed} parts={parts}: {got} vs {expected}"
    )


def test_plan_merges_df_all_small_pairs_up(spark):
    """Adjacent small regions pair (0,1),(2,3),... — the canonical case."""
    t = (NOW_MS - mnt.SHORT_INTERVAL_MS) // 1000
    regions = [
        mnt.Region(f"r{i}", i, i, t - 10_000, t - 5_000, mnt.LOWER_SIZE // 2)
        for i in range(10)
    ]
    got = [
        (r["region_a"], r["region_b"])
        for r in mnt.plan_merges_df(
            _as_df(spark, regions), NOW_MS,
            order_cols=("region_name",), num_partitions=3,
        ).collect()
    ]
    assert got == [(f"r{i}", f"r{i+1}") for i in range(0, 10, 2)]
    assert got == mnt.plan_merges(regions, NOW_MS)
