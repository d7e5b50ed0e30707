"""Golden-vector + property tests for the round-3 codec additions:
INTERVAL_YEAR_MONTH / INTERVAL_DAY_TIME (HBaseSerde.java:300,313), the
legacy class-indexed Date/Time-as-long codecs (HBaseTypeUtils.java:70-76),
and per-table string charsets (HBaseTableSchema.java:55,126-128)."""

from __future__ import annotations

import datetime
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DayTimeIntervalType,
    StringType,
    YearMonthIntervalType,
)

from hbase_bulkload_service_spark.functions import codec
import pytest

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# golden vectors (independent struct.pack ground truth)
# ---------------------------------------------------------------------------

def test_interval_ym_golden_vectors(spark):
    """INTERVAL_YEAR_MONTH encodes as the INTEGER branch: 4-byte BE months
    (HBaseSerde.java:298-300)."""
    rows = [(-14,), (0,), (7,), (14,), (2**31 - 1,), (-(2**31),)]
    df = spark.createDataFrame(rows, "m int")
    out = df.select("m", codec.encode_interval_ym(F.col("m")).alias("b")).collect()
    for r in out:
        assert bytes(r["b"]) == struct.pack(">i", r["m"])


def test_interval_dt_golden_vectors(spark):
    """INTERVAL_DAY_TIME encodes as the BIGINT branch: 8-byte BE millis
    (HBaseSerde.java:312-313)."""
    rows = [(-93781500,), (0,), (1500,), (93781500,), (86400000 * 400,)]
    df = spark.createDataFrame(rows, "ms long")
    out = df.select("ms", codec.encode_interval_dt(F.col("ms")).alias("b")).collect()
    for r in out:
        assert bytes(r["b"]) == struct.pack(">q", r["ms"])


def test_legacy_date_time_golden_vectors(spark):
    """Legacy codec: sql.Date / sql.Time as 8-byte epoch-millis longs
    (HBaseTypeUtils.java:70-76) vs the LogicalType codec's 4-byte ints."""
    d = datetime.date(2020, 3, 1)
    days = (d - datetime.date(1970, 1, 1)).days
    df = spark.createDataFrame([(d, 45296789)], "d date, t int")
    r = df.select(
        codec.encode_date_legacy(F.col("d")).alias("db"),
        codec.encode_date(F.col("d")).alias("db4"),
        codec.encode_time_legacy(F.col("t")).alias("tb"),
        codec.encode_time_millis(F.col("t")).alias("tb4"),
    ).collect()[0]
    assert bytes(r["db"]) == struct.pack(">q", days * 86400000)
    assert bytes(r["db4"]) == struct.pack(">i", days)  # LogicalType variant
    assert bytes(r["tb"]) == struct.pack(">q", 45296789)
    assert bytes(r["tb4"]) == struct.pack(">i", 45296789)


# ---------------------------------------------------------------------------
# round-trip properties
# ---------------------------------------------------------------------------

@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=40))
def test_interval_ym_roundtrip(spark, vs):
    df = spark.createDataFrame([(v,) for v in vs], "m int")
    out = df.select(
        "m", codec.decode_interval_ym(codec.encode_interval_ym(F.col("m"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["m"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**53), 2**53), min_size=1, max_size=40))
def test_interval_dt_roundtrip(spark, vs):
    df = spark.createDataFrame([(v,) for v in vs], "ms long")
    out = df.select(
        "ms", codec.decode_interval_dt(codec.encode_interval_dt(F.col("ms"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["ms"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-100_000, 100_000), min_size=1, max_size=30))
def test_native_interval_columns_roundtrip(spark, vs):
    """Spark-native interval columns survive the full encode→decode path
    (months exact; millis exact incl. the 0.5 ms-step fractions)."""
    rows = [(v, v * 1500 + (v % 2) * 500) for v in vs]
    df = spark.createDataFrame(rows, "m int, ms long").select(
        F.col("m"),
        F.col("ms"),
        F.col("m").cast(YearMonthIntervalType()).alias("ym"),
        codec.millis_to_interval_dt(F.col("ms")).alias("dt"),
    )
    out = df.select(
        "m",
        "ms",
        codec.interval_ym_months(
            codec.decode_interval_ym(codec.encode_interval_ym(codec.interval_ym_months(F.col("ym"))))
            .cast(YearMonthIntervalType())
        ).alias("m_rt"),
        codec.interval_dt_millis(
            codec.millis_to_interval_dt(
                codec.decode_interval_dt(codec.encode_interval_dt(codec.interval_dt_millis(F.col("dt"))))
            ).cast(DayTimeIntervalType())
        ).alias("ms_rt"),
    ).collect()
    for r in out:
        assert r["m_rt"] == r["m"]
        assert r["ms_rt"] == r["ms"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.dates(datetime.date(1900, 1, 1), datetime.date(2100, 1, 1)),
        min_size=1,
        max_size=40,
    )
)
def test_legacy_date_roundtrip(spark, ds):
    df = spark.createDataFrame([(d,) for d in ds], "d date")
    out = df.select(
        "d", codec.decode_date_legacy(codec.encode_date_legacy(F.col("d"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["d"]


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 86_399_999), min_size=1, max_size=40))
def test_legacy_time_roundtrip(spark, vs):
    df = spark.createDataFrame([(v,) for v in vs], "t int")
    out = df.select(
        "t", codec.decode_time_legacy(codec.encode_time_legacy(F.col("t"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["t"]


# ---------------------------------------------------------------------------
# charset plumb-through (HBaseTableSchema.java:55,126-128)
# ---------------------------------------------------------------------------

def test_string_charset_bytes_and_roundtrip(spark):
    """ISO-8859-1 produces single-byte encodings for Latin-1 text (UTF-8
    would be 2 bytes for é) and round-trips through the schema-driven
    serde."""
    df = spark.createDataFrame([("café",), ("naïve",), (None,)], "s string")
    out = df.select(
        "s",
        codec.encode_string(F.col("s"), charset="ISO-8859-1").alias("b"),
        codec.decode_string(
            codec.encode_string(F.col("s"), charset="ISO-8859-1"), charset="ISO-8859-1"
        ).alias("rt"),
    ).collect()
    for r in out:
        expected = (r["s"] if r["s"] is not None else "null").encode("latin-1")
        assert bytes(r["b"]) == expected
        assert r["rt"] == r["s"]


def test_htable_cells_charset_and_legacy(spark):
    """encode_htable_cells honors schema.charset and legacy date layout end
    to end (the round-2 verdict flagged charset as dead config)."""
    from hbase_bulkload_service_spark.schema import HBaseTableSchema
    from hbase_bulkload_service_spark.operators.table import (
        decode_cells_htable,
        encode_htable_cells,
    )

    schema = (
        HBaseTableSchema(charset="ISO-8859-1")
        .set_row_key("rk", StringType())
        .add_column("f", "name", StringType())
        .add_column("f", "d", DateType())
    )
    d = datetime.date(1999, 12, 31)
    df = spark.createDataFrame([("k1", ("résumé", d))], "rk string, f struct<name:string,d:date>")
    cells = encode_htable_cells(df, schema, legacy=True)
    raw = {(r["family"], r["qualifier"]): bytes(r["value"]) for r in cells.collect()}
    assert raw[("f", "name")] == "résumé".encode("latin-1")
    days = (d - datetime.date(1970, 1, 1)).days
    assert raw[("f", "d")] == struct.pack(">q", days * 86400000)
    back = decode_cells_htable(cells, schema, legacy=True).collect()[0]
    assert back["f"]["name"] == "résumé"
    assert back["f"]["d"] == d


# ---------------------------------------------------------------------------
# full-dispatch serde property: EVERY supported type through the cell serde
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(st.data())
def test_cell_serde_full_type_dispatch_roundtrip(spark, data):
    """encode_htable_cells → decode_cells_htable is identity across the
    ENTIRE §1.3 type table in one schema (both codec generations)."""
    import decimal as dec

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
        TimestampType,
    )

    from hbase_bulkload_service_spark.operators.table import (
        decode_cells_htable,
        encode_htable_cells,
    )
    from hbase_bulkload_service_spark.schema import HBaseTableSchema

    n = data.draw(st.integers(2, 6))
    rows = []
    for i in range(n):
        rows.append(Row(
            rk=f"k{i:03d}",
            f=Row(
                s=data.draw(st.one_of(st.none(), st.text(
                    alphabet=st.characters(codec="latin-1", exclude_characters="\x00"),
                    max_size=12).filter(lambda t: t != "null"))),
                i1=data.draw(st.integers(-128, 127)),
                i2=data.draw(st.integers(-(2**15), 2**15 - 1)),
                i4=data.draw(st.integers(-(2**31), 2**31 - 1)),
                i8=data.draw(st.integers(-(2**63), 2**63 - 1)),
                fl=float(data.draw(st.integers(-1000, 1000))) / 4,
                db=float(data.draw(st.integers(-10**9, 10**9))) / 8,
                bo=data.draw(st.booleans()),
                ts=datetime.datetime(2020, 1, 1) + datetime.timedelta(
                    milliseconds=data.draw(st.integers(0, 10**10))),
                d=data.draw(st.dates(datetime.date(1900, 1, 1),
                                     datetime.date(2100, 1, 1))),
                dc=dec.Decimal(data.draw(st.integers(-(10**12), 10**12))).scaleb(-3),
                ym=data.draw(st.integers(-10000, 10000)),
                dtm=data.draw(st.integers(-(2**40), 2**40)),
            ),
        ))
    legacy = data.draw(st.booleans())
    charset = data.draw(st.sampled_from(["UTF-8", "ISO-8859-1"]))
    schema = (
        HBaseTableSchema(charset=charset)
        .set_row_key("rk", StringType())
        .add_column("f", "s", StringType())
        .add_column("f", "i1", ByteType())
        .add_column("f", "i2", ShortType())
        .add_column("f", "i4", IntegerType())
        .add_column("f", "i8", LongType())
        .add_column("f", "fl", FloatType())
        .add_column("f", "db", DoubleType())
        .add_column("f", "bo", BooleanType())
        .add_column("f", "ts", TimestampType())
        .add_column("f", "d", DateType())
        .add_column("f", "dc", DecimalType(18, 3))
        .add_column("f", "ym", YearMonthIntervalType())
        .add_column("f", "dur", DayTimeIntervalType())
    )
    spark_schema = StructType([
        StructField("rk", StringType()),
        StructField("f", StructType([
            StructField("s", StringType()),
            StructField("i1", ByteType()),
            StructField("i2", ShortType()),
            StructField("i4", IntegerType()),
            StructField("i8", LongType()),
            StructField("fl", FloatType()),
            StructField("db", DoubleType()),
            StructField("bo", BooleanType()),
            StructField("ts", TimestampType()),
            StructField("d", DateType()),
            StructField("dc", DecimalType(18, 3)),
            StructField("ym", IntegerType()),
            StructField("dtm", LongType()),
        ])),
    ])
    df = spark.createDataFrame(rows, spark_schema).select(
        "rk",
        F.struct(
            "f.s", "f.i1", "f.i2", "f.i4", "f.i8", "f.fl", "f.db", "f.bo",
            "f.ts", "f.d", "f.dc",
            F.col("f.ym").cast(YearMonthIntervalType()).alias("ym"),
            __import__("hbase_bulkload_service_spark.functions.codec",
                       fromlist=["codec"]).millis_to_interval_dt(
                F.col("f.dtm")).cast(DayTimeIntervalType()).alias("dur"),
        ).alias("f"),
    )
    cells = encode_htable_cells(df, schema, legacy=legacy)
    back = decode_cells_htable(cells, schema, legacy=legacy)
    from hbase_bulkload_service_spark.functions import codec as _codec

    got = {
        r["rk"]: r for r in back.select(
            "rk",
            F.col("f.s").alias("s"), F.col("f.i1").alias("i1"),
            F.col("f.i2").alias("i2"), F.col("f.i4").alias("i4"),
            F.col("f.i8").alias("i8"), F.col("f.fl").alias("fl"),
            F.col("f.db").alias("db"), F.col("f.bo").alias("bo"),
            F.col("f.ts").alias("ts"), F.col("f.d").alias("d"),
            F.col("f.dc").alias("dc"),
            _codec.interval_ym_months(F.col("f.ym")).alias("ym"),
            _codec.interval_dt_millis(F.col("f.dur")).alias("dtm"),
        ).collect()
    }
    assert len(got) == n
    for r in rows:
        g = got[r.rk]
        f = r.f
        assert g["s"] == f.s
        assert (g["i1"], g["i2"], g["i4"], g["i8"]) == (f.i1, f.i2, f.i4, f.i8)
        assert g["fl"] == f.fl and g["db"] == f.db and g["bo"] == f.bo
        assert g["ts"] == f.ts and g["d"] == f.d
        assert g["dc"] == f.dc
        assert g["ym"] == f.ym and g["dtm"] == f.dtm
