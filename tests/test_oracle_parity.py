"""Mirror of the driver's correctness gate: run every registered Spark query
and its DuckDB oracle side-by-side at sf0.001 and compare row count, column
names, and canonicalized values (order-insensitive)."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from hbase_bulkload_service_spark import registry
from hbase_bulkload_service_spark.sources.tables import TABLES

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

SF_DIR = "/root/testdata/sf0.001"


def _canon(v):
    # stringify everything so mixed-type tuples (nullable columns ->
    # None beside ints) stay sortable, mirroring tools/selfcheck.py
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{round(v, 9)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return "s:" + str(v)


def _duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def duck():
    con = _duck_con()
    yield con
    con.close()


ORACLE_QUERIES = sorted(registry.ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    )

    res = duck.execute(registry.ORACLE[name])
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = sorted(
        tuple(_canon(r[i]) for i in order) for r in duck_rows_raw
    )

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert spark_rows == duck_rows, f"{name}: value mismatch (first diff: "  \
        f"{next(((a, b) for a, b in zip(spark_rows, duck_rows) if a != b), None)})"


def test_all_queries_run(spark):
    """Queries without an oracle must still run and return a stable schema."""
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()


def test_timestamp_queries_are_session_timezone_proof(spark):
    """Lock in the TZ-probe: timestamp-heavy queries must return identical
    results under a non-UTC session timezone (all epoch arithmetic is
    wall-clock-as-UTC by convention; q19's to_utc_timestamp regression is
    the canonical failure this guards)."""
    from hbase_bulkload_service_spark import registry

    names = ["q12_hour_range_filter", "q13_rollup_5m", "q19_streaming_rollup"]
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        utc = {
            n: sorted(map(tuple, registry.QUERIES[n](spark, SF_DIR).collect()))
            for n in names
        }
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for n in names:
            ny = sorted(map(tuple, registry.QUERIES[n](spark, SF_DIR).collect()))
            assert ny == utc[n], f"{n} drifts with session timezone"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
