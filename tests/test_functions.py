"""Unit tests for the byte-codec kernel and Java hash fidelity
(SURVEY.md §2.I; golden values computed from the Java specs, not from our
own encoder)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.functions import codec, hashes


def java_arrays_hashcode_py(bs: list[int]) -> int:
    """Pure-python spec implementation of java.util.Arrays.hashCode(byte[])."""
    h = 1
    for b in bs:
        assert -128 <= b <= 127
        h = (31 * h + b) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


@pytest.mark.parametrize(
    "bs,expected",
    [
        ([], 1),
        ([1, 2, 3], 30817),
        ([0], 31),
        ([-128, 127, -1], java_arrays_hashcode_py([-128, 127, -1])),
    ],
)
def test_java_arrays_hashcode_golden(spark, bs, expected):
    df = spark.createDataFrame([(bs,)], "bs array<long>")
    got = df.select(hashes.java_arrays_hashcode(F.col("bs")).alias("h")).first()["h"]
    assert got == expected


def test_java_hashcode_overflow_wraps(spark):
    # long ASCII string forces repeated 32-bit overflow
    s = "user=1234567890" * 5
    bs = [ord(c) for c in s]
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(
        hashes.java_arrays_hashcode(hashes.ascii_byte_ints(F.col("s"))).alias("h")
    ).first()["h"]
    assert got == java_arrays_hashcode_py([1 * 0 + b for b in bs])  # ascii == byte here


def test_salt_bucket_matches_reference_semantics(spark):
    # bucket = abs(h % 512) (negate after mod) — NOT abs(h) % 512
    rows = [([127, -5, 33, 77],), ([-1],), ([0, 0, 0],)]
    df = spark.createDataFrame(rows, "bs array<long>")
    got = [r["b"] for r in df.select(hashes.salt_bucket(F.col("bs")).alias("b")).collect()]
    for (bs,), g in zip(rows, got):
        h = java_arrays_hashcode_py(bs)
        m = h % 512 if h >= 0 else -((-h) % 512)  # Java %: sign of dividend
        assert g == abs(m)
        assert 0 <= g < 512


@pytest.mark.parametrize("v,width", [(0, 4), (1, 4), (-1, 4), (2**31 - 1, 4),
                                     (-(2**31), 4), (255, 2), (-32768, 2),
                                     (7, 1), (-128, 1), (2**40, 8), (-(2**62), 8),
                                     (16777215, 3), (1704067200, 4)])
def test_int_be_roundtrip_and_layout(spark, v, width):
    df = spark.createDataFrame([(v,)], "v long")
    out = df.select(
        codec.encode_int_be(F.col("v"), width).alias("b"),
        codec.decode_int_be(codec.encode_int_be(F.col("v"), width), width).alias("rt"),
    ).first()
    expected = (v & ((1 << (8 * width)) - 1)).to_bytes(width, "big")
    assert bytes(out["b"]) == expected  # big-endian two's complement (Bytes.toBytes)
    # round-trip only faithful when v fits the width
    if -(1 << (8 * width - 1)) <= v < (1 << (8 * width - 1)):
        assert out["rt"] == v


@pytest.mark.parametrize("v", [0.0, 1.5, -2.25, 3.141592653589793, 1e300, -1e-300,
                               float("inf"), float("-inf")])
def test_double_be_roundtrip(spark, v):
    df = spark.createDataFrame([(v,)], "v double")
    out = df.select(
        codec.encode_double_be(F.col("v")).alias("b"),
        codec.decode_double_be(codec.encode_double_be(F.col("v"))).alias("rt"),
    ).first()
    assert bytes(out["b"]) == struct.pack(">d", v)
    assert out["rt"] == v


def test_null_conventions(spark):
    df = spark.createDataFrame([(None, None), ("abc", 5)], "s string, v long")
    out = df.select(
        codec.encode_string(F.col("s")).alias("sb"),
        codec.decode_string(codec.encode_string(F.col("s"))).alias("srt"),
        codec.encode_int_be(F.col("v"), 4).alias("vb"),
        codec.decode_int_be(codec.encode_int_be(F.col("v"), 4), 4).alias("vrt"),
    ).collect()
    null_row = out[0] if out[0]["srt"] is None else out[1]
    val_row = out[1] if null_row is out[0] else out[0]
    assert bytes(null_row["sb"]) == b"null"  # string null ↔ null-string-literal
    assert null_row["srt"] is None
    assert bytes(null_row["vb"]) == b""  # non-string null ↔ empty byte[]
    assert null_row["vrt"] is None
    assert bytes(val_row["sb"]) == b"abc"
    assert val_row["srt"] == "abc"
    assert val_row["vrt"] == 5


def test_boolean_and_timestamp_codecs(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    rows = df.select(
        codec.encode_boolean(F.col("b")).alias("eb"),
        codec.decode_boolean(codec.encode_boolean(F.col("b"))).alias("rt"),
    ).collect()
    assert {bytes(r["eb"]) for r in rows} == {b"\x01", b"\x00", b""}
    assert {r["rt"] for r in rows} == {True, False, None}

    ts_df = spark.sql("SELECT timestamp_millis(1704067207179) AS ts")
    out = ts_df.select(
        codec.encode_timestamp_ms(F.col("ts")).alias("b"),
        F.unix_millis(codec.decode_timestamp_ms(codec.encode_timestamp_ms(F.col("ts")))).alias("rt"),
    ).first()
    assert bytes(out["b"]) == (1704067207179).to_bytes(8, "big")
    assert out["rt"] == 1704067207179


def test_key_slicing_helpers(spark):
    # salted key: [2B bucket][4B time][payload]
    key = (300).to_bytes(2, "big") + (1704067200).to_bytes(4, "big") + b"payload"
    df = spark.createDataFrame([(key,)], "k binary")
    out = df.select(
        codec.key_bucket(F.col("k")).alias("bucket"),
        codec.key_time(F.col("k")).alias("t"),
    ).first()
    assert out["bucket"] == 300
    assert out["t"] == 1704067200


def test_floor_to_hour(spark):
    df = spark.createDataFrame([(1704868200123,)], "ms long")
    got = df.select(codec.floor_to_hour_ms(F.col("ms")).alias("h")).first()["h"]
    assert got == 1704866400000  # TsdbScanner.getLastHourTime semantics


def test_sql_udf_registry_roundtrip(spark):
    """L2 escape hatch: the codec family callable from plain spark.sql."""
    from hbase_bulkload_service_spark.functions import codec

    names = codec.register_sql_udfs(spark)
    assert {"hb_decode_int4", "hb_encode_int8", "hb_decode_double"} <= set(names)
    row = spark.sql(
        """
        SELECT hb_decode_int2(hb_encode_int2(-2))                      AS i2,
               hb_decode_int8(hb_encode_int8(1704067200000))           AS i8,
               hex(hb_encode_int3(5))                                  AS m3,
               hb_decode_string(hb_encode_string(NULL))                AS s_null,
               hex(hb_encode_string(NULL))                             AS s_nullb,
               hb_decode_string(hb_encode_string('x'))                 AS s,
               hb_decode_bool(X'01')                                   AS bt,
               hb_decode_bool(X'')                                     AS bn,
               hb_key_bucket(concat(hb_encode_int2(511),
                                    hb_encode_int4(1700000000)))       AS bucket,
               hb_key_time(concat(hb_encode_int2(511),
                                  hb_encode_int4(1700000000)))         AS ktime,
               hb_decode_double(hb_encode_double(CAST(6.55 AS DOUBLE))) AS d
        """
    ).collect()[0]
    assert row.i2 == -2 and row.i8 == 1704067200000
    assert row.m3 == "000005"  # 3-byte TSDB metric-uid width
    assert row.s_null is None and row.s_nullb == "6E756C6C"  # "null" literal
    assert row.s == "x" and row.bt is True and row.bn is None
    assert row.bucket == 511 and row.ktime == 1700000000
    assert row.d == 6.55


def test_decimal_codec_golden_vectors_and_roundtrip(spark):
    """Bytes.toBytes(BigDecimal) layout: 4B BE scale + minimal
    two's-complement unscaled (HBaseSerde.java:338-345)."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType, StructField, StructType

    from hbase_bulkload_service_spark.functions import codec

    rows = [(Decimal("1.50"),), (Decimal("-1.50"),), (Decimal("0.00"),), (None,)]
    df = spark.createDataFrame(
        rows, StructType([StructField("d", DecimalType(12, 2))])
    )
    enc = df.select(codec.encode_decimal_be(F.col("d")).alias("b"))
    got = [bytes(r.b) for r in enc.collect()]
    # scale=2 prefix; 150 -> 0x0096 (sign byte), -150 -> 0xFF6A, 0 -> 0x00
    assert got[0] == b"\x00\x00\x00\x02\x00\x96"
    assert got[1] == b"\x00\x00\x00\x02\xff\x6a"
    assert got[2] == b"\x00\x00\x00\x02\x00"
    assert got[3] == b""
    back = enc.select(codec.decode_decimal_be(F.col("b"), 12, 2).alias("d"))
    assert [r.d for r in back.collect()] == [
        Decimal("1.50"), Decimal("-1.50"), Decimal("0.00"), None,
    ]


def test_decimal_roundtrip_on_real_column(spark, sf_dir):
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.functions import codec
    from hbase_bulkload_service_spark.sources.tables import load

    c = load(spark, sf_dir, "customer").select(
        F.col("c_acctbal").cast("decimal(12,2)").alias("d")
    )
    rt = c.select(
        "d", codec.decode_decimal_be(codec.encode_decimal_be(F.col("d")), 12, 2).alias("r")
    )
    assert rt.filter("d IS DISTINCT FROM r").count() == 0


def test_biginteger_codec(spark):
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType, StructField, StructType

    from hbase_bulkload_service_spark.functions import codec

    rows = [(Decimal(128),), (Decimal(-128),), (Decimal(0),), (None,)]
    df = spark.createDataFrame(
        rows, StructType([StructField("v", DecimalType(38, 0))])
    )
    enc = df.select(codec.encode_bigint_unscaled_be(F.col("v")).alias("b"))
    got = [bytes(r.b) for r in enc.collect()]
    assert got == [b"\x00\x80", b"\x80", b"\x00", b""]
    back = enc.select(codec.decode_bigint_unscaled_be(F.col("b")).alias("v"))
    assert [r.v for r in back.collect()] == [
        Decimal(128), Decimal(-128), Decimal(0), None,
    ]


def test_date_time_codec_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from hbase_bulkload_service_spark.functions import codec
    from hbase_bulkload_service_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    rt = o.select("d", codec.decode_date(codec.encode_date(F.col("d"))).alias("r"))
    assert rt.filter("d IS DISTINCT FROM r").count() == 0
    # golden: 1970-01-02 -> epoch-day 1
    one = spark.sql("SELECT CAST('1970-01-02' AS DATE) d").select(
        F.hex(codec.encode_date(F.col("d"))).alias("h")
    ).collect()[0].h
    assert one == "00000001"
    t = spark.sql("SELECT 34200123 ms").select(  # 09:30:00.123
        codec.decode_time_millis(codec.encode_time_millis(F.col("ms"))).alias("r")
    ).collect()[0].r
    assert t == 34200123


def test_ts_at_most_ms_is_session_timezone_proof(spark):
    """The NTZ predicate literal must parse timezone-free: under a non-UTC
    session timezone, a lit(datetime)→cast chain shifts the boundary (lit
    uses the OS zone, the cast uses the session zone) and silently drops
    boundary rows. Regression for the America/New_York probe."""
    from hbase_bulkload_service_spark.functions.codec import ts_at_most_ms

    df = spark.sql(
        "SELECT * FROM VALUES (TIMESTAMP_NTZ '1998-09-02 00:00:00'),"
        " (TIMESTAMP_NTZ '1998-09-02 00:00:01') AS t(ts)"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            # 904694400000 ms == 1998-09-02 00:00:00Z: exactly one boundary row
            assert df.filter(ts_at_most_ms(df, "ts", 904694400000)).count() == 1, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_sql_udf_date_interval_family(spark):
    """Round-3 L2 additions: date (both codecs) + interval SQL functions
    match the independent struct layout and round-trip."""
    import datetime
    import struct

    from hbase_bulkload_service_spark.functions import codec

    names = codec.register_sql_udfs(spark)
    assert {
        "hb_encode_date", "hb_decode_date", "hb_encode_date_legacy",
        "hb_decode_date_legacy", "hb_encode_interval_ym",
        "hb_decode_interval_ym", "hb_encode_interval_dt",
        "hb_decode_interval_dt",
    } <= set(names)
    r = spark.sql(
        """
        SELECT hex(hb_encode_date(DATE'2020-03-01'))                      AS e4,
               hb_decode_date(hb_encode_date(DATE'1969-07-20'))           AS d4,
               hex(hb_encode_date_legacy(DATE'2020-03-01'))               AS e8,
               hb_decode_date_legacy(hb_encode_date_legacy(DATE'2020-03-01')) AS d8,
               hex(hb_encode_interval_ym(14))                             AS ym,
               hb_decode_interval_ym(hb_encode_interval_ym(-14))          AS ymrt,
               hb_decode_interval_dt(hb_encode_interval_dt(-93781500))   AS dtrt
        """
    ).collect()[0]
    days = (datetime.date(2020, 3, 1) - datetime.date(1970, 1, 1)).days
    assert r.e4 == struct.pack(">i", days).hex().upper()
    assert r.d4 == datetime.date(1969, 7, 20)  # negative epoch-days
    assert r.e8 == struct.pack(">q", days * 86400000).hex().upper()
    assert r.d8 == datetime.date(2020, 3, 1)
    assert r.ym == struct.pack(">i", 14).hex().upper()
    assert r.ymrt == -14 and r.dtrt == -93781500
