"""session.local_frame: metadata local relations as JVM LocalTableScans.

Optimization r08 swapped ~36 ``spark.createDataFrame(<python list>)``
sites to ``local_frame`` — these pins hold the contract the sweep relies
on: identical values AND schema vs the classic path, a pure-JVM plan
(no Python-pickled ExistingRDD) for the fast-path types, and a silent
fallback (still-correct, classic plan) for types excluded from the fast
path (timestamps/decimals).
"""

from __future__ import annotations

import datetime

import pytest

from hbase_bulkload_service_spark.session import local_frame

CASES = [
    ([(1, [1, 2, 3]), (2, None)], "cid int, cvec array<long>"),
    ([(0, b"\x00k", "006b", 1.5)], "b int, key binary, hexs string, v double"),
    ([], "a long, b string"),
    ([(None, "x")], "a long, b string"),
    ([(1, {"k": 2})], "a int, m map<string,long>"),
    ([((1, "s"),)], "s struct<a:int,b:string>"),
    ([(1.5,)], "f float"),
    ([(True, bytearray(b"zz"))], "b boolean, r binary"),
    ([(datetime.date(2020, 1, 2),)], "d date"),
]


@pytest.mark.parametrize("rows,schema", CASES, ids=[c[1] for c in CASES])
def test_values_and_schema_match_classic_path(spark, rows, schema):
    fast = local_frame(spark, rows, schema)
    classic = spark.createDataFrame(rows, schema)
    assert fast.schema == classic.schema
    assert fast.collect() == classic.collect()


def test_fast_path_plans_a_jvm_local_relation(spark):
    df = local_frame(spark, [(1, [1, 2])], "cid int, cvec array<long>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan  # the Python-pickled path


def test_timestamp_falls_back_to_classic_path_correctly(spark):
    rows = [(datetime.datetime(2020, 1, 2, 3, 4, 5),)]
    fast = local_frame(spark, rows, "t timestamp")
    classic = spark.createDataFrame(rows, "t timestamp")
    assert fast.collect() == classic.collect()
    # excluded from the fast path by design (session-timezone coercion)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan


def test_row_objects_from_collect_roundtrip(spark):
    src = spark.range(3).selectExpr("id", "cast(id * 2 as long) AS v")
    rows = src.collect()
    df = local_frame(spark, rows, "id long, v long")
    assert df.collect() == rows
    assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()


def test_structtype_schema_accepted(spark):
    st = spark.range(1).select("id").schema
    df = local_frame(spark, [(5,)], st)
    assert df.schema == st and df.collect()[0][0] == 5


def test_dict_rows_map_by_name_like_classic_path(spark):
    # ADVICE r08 (medium): the fast path used to zip dict KEYS into the
    # columns — [{'a':'x','b':'y'}] became Row(a='a', b='b'). Mappings must
    # take the classic path, which maps by field name.
    rows = [{"a": "x", "b": "y"}]
    fast = local_frame(spark, rows, "a string, b string")
    classic = spark.createDataFrame(rows, "a string, b string")
    assert fast.collect() == classic.collect()
    assert fast.collect()[0].asDict() == {"a": "x", "b": "y"}


def test_overlong_rows_raise_like_classic_path(spark):
    # ADVICE r08 (low): rows longer than the schema were silently
    # truncated by the fast path; classic createDataFrame raises.
    with pytest.raises(Exception):
        local_frame(spark, [(1, 2, 3)], "a int, b int").collect()


def test_short_rows_raise_like_classic_path(spark):
    with pytest.raises(Exception):
        local_frame(spark, [(1,)], "a int, b int").collect()
