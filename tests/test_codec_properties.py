"""Property-based codec tests (SURVEY.md §5 item 2): encode→decode identity
and byte-image equality against the independent `struct`/`int.to_bytes`
ground truth, across the whole value domain — not just the golden vectors.

Strategy: hypothesis generates the value sets driver-side; each batch is
pushed through the Spark expression chain in ONE small DataFrame (per-value
Spark jobs would be prohibitively slow), so shrinking still works on the
value lists."""

from __future__ import annotations

import math
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.functions import codec
import pytest

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _roundtrip(spark, rows, in_type, enc, dec):
    df = spark.createDataFrame([(v,) for v in rows], f"v {in_type}")
    out = df.select(
        F.col("v"),
        enc(F.col("v")).alias("b"),
        dec(enc(F.col("v"))).alias("rt"),
    ).collect()
    return out


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=50))
def test_int4_bytes_and_roundtrip(spark, vs):
    for r in _roundtrip(
        spark, vs, "int", lambda c: codec.encode_int_be(c, 4), lambda c: codec.decode_int_be(c, 4)
    ):
        assert bytes(r["b"]) == struct.pack(">i", r["v"])
        assert r["rt"] == r["v"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50))
def test_int8_bytes_and_roundtrip(spark, vs):
    for r in _roundtrip(
        spark, vs, "long", lambda c: codec.encode_int_be(c, 8), lambda c: codec.decode_int_be(c, 8)
    ):
        assert bytes(r["b"]) == struct.pack(">q", r["v"])
        assert r["rt"] == r["v"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**15), 2**15 - 1), min_size=1, max_size=50))
def test_int2_bytes_and_roundtrip(spark, vs):
    for r in _roundtrip(
        spark, vs, "int", lambda c: codec.encode_int_be(c, 2), lambda c: codec.decode_int_be(c, 2)
    ):
        assert bytes(r["b"]) == struct.pack(">h", r["v"])
        assert r["rt"] == r["v"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(allow_nan=False, width=64),  # NaN folds to the null image
        min_size=1,
        max_size=50,
    )
)
def test_double_bytes_and_roundtrip(spark, vs):
    for r in _roundtrip(
        spark, vs, "double", codec.encode_double_be, codec.decode_double_be
    ):
        assert bytes(r["b"]) == struct.pack(">d", r["v"])
        if math.isinf(r["v"]) or r["v"] == r["v"]:
            assert r["rt"] == r["v"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=40)),
        min_size=1,
        max_size=50,
    )
)
def test_string_null_literal_roundtrip(spark, vs):
    rows = _roundtrip(spark, vs, "string", codec.encode_string, codec.decode_string)
    for r in rows:
        if r["v"] is None or r["v"] == codec.NULL_STRING_LITERAL:
            # null and the literal itself share one byte image (by design:
            # HBaseSerde.java:251-260) and both decode to SQL NULL
            assert bytes(r["b"]) == codec.NULL_STRING_LITERAL.encode()
            assert r["rt"] is None
        else:
            assert bytes(r["b"]) == r["v"].encode("utf-8")
            assert r["rt"] == r["v"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**23), 2**23 - 1), min_size=1, max_size=50))
def test_int3_metric_uid_width(spark, vs):
    # the 3-byte TSDB metric-uid width has no struct format; ground truth
    # via int.to_bytes two's complement
    for r in _roundtrip(
        spark, vs, "int", lambda c: codec.encode_int_be(c, 3), lambda c: codec.decode_int_be(c, 3)
    ):
        assert bytes(r["b"]) == (r["v"] & 0xFFFFFF).to_bytes(3, "big")
        assert r["rt"] == r["v"]
