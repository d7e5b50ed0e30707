"""HBase-SQL-table query surface (SURVEY.md §2.A A4-A8, §2.C, §2.E E3,
§2.F F1) over family-struct DataFrames.

The reference materializes scans as nested rows — rowkey + one ROW per
column family (HBaseSerde.java:217-239, HBaseTableSchema.java:309-339) —
and serves three query shapes: projected scans, point gets, and lookup
joins (HBaseRowDataLookupFunction.java:76-86). Here each is a thin
combinator over a DataFrame shaped by schema.HBaseTableSchema; Catalyst
provides pushdown/pruning.

Cell-form conversion (encode_htable_cells / decode_cells_htable) is the
A4/A5 decode + H4 Put-mutation serde in one place: nested rows ↔ long-form
``(rowkey BINARY, family STRING, qualifier STRING, value BINARY)`` using
the byte codecs — the engine's canonical exchange format with HBase-world
storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
    YearMonthIntervalType,
)

from hbase_bulkload_service_spark.functions import codec
from hbase_bulkload_service_spark.schema import HBaseTableSchema
from hbase_bulkload_service_spark.sources.tables import load


# ---------------------------------------------------------------------------
# fixture: htable = customer ⨝ nation as rowkey + two families (FIXTURES.md §3)
# ---------------------------------------------------------------------------

HTABLE_SCHEMA = (
    HBaseTableSchema()
    .set_row_key("rowkey", StringType())
    .add_column("f1", "c_name", StringType())
    .add_column("f1", "c_acctbal", DoubleType())
    .add_column("f1", "c_nationkey", IntegerType())
    .add_column("f2", "n_name", StringType())
    .add_column("f2", "c_mktsegment", StringType())
)


def rowkey_of_custkey(custkey: Column) -> Column:
    """String rowkey = zero-padded custkey (keeps HBase lexicographic order
    == numeric order, the standard fixed-width-rowkey idiom)."""
    return F.lpad(custkey.cast("string"), 12, "0")


def build_htable(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    c = load(spark, sf_dir, "customer", spread=spread)
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            rowkey_of_custkey(F.col("c_custkey")).alias("rowkey"),
            F.struct(
                F.col("c_name"),
                F.col("c_acctbal"),
                F.col("c_nationkey"),
            ).alias("f1"),
            F.struct(F.col("n_name"), F.col("c_mktsegment")).alias("f2"),
        )
    )


# ---------------------------------------------------------------------------
# A7/C1/C2 — projected scan
# ---------------------------------------------------------------------------

def scan(htable: DataFrame, selections: dict[str, list[str] | None]) -> DataFrame:
    """Columns-only projection scan (HBaseSerde.java:181-191 adds exactly
    the declared columns to the Scan). ``selections`` maps family → list of
    qualifiers (None = whole family). Nested-field pruning means parquet
    reads only the requested leaves — exceeding the reference's
    family-granularity limit (C2)."""
    cols: list[Column] = [F.col("rowkey")]
    for fam, quals in selections.items():
        if quals is None:
            cols.append(F.col(fam))
        else:
            for q in quals:
                cols.append(F.col(f"{fam}.{q}").alias(f"{fam}_{q}"))
    return htable.select(*cols)


# ---------------------------------------------------------------------------
# A8 — point get
# ---------------------------------------------------------------------------

def point_get(htable: DataFrame, key) -> DataFrame:
    """Single-rowkey Get (HBaseSerde.java:198-214): equality filter on the
    key column; on a key-sorted/bucketed layout this prunes to one file."""
    return htable.filter(F.col("rowkey") == F.lit(key))


# ---------------------------------------------------------------------------
# F1 — lookup join
# ---------------------------------------------------------------------------

def lookup_join(
    probe: DataFrame,
    probe_key: str,
    htable: DataFrame,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Lookup (temporal) join keyed strictly on the single rowkey
    (AbstractHBaseDynamicTableSource.java:66-84 validates exactly one join
    key == rowkey; eval() collects only non-empty ⇒ inner semantics,
    HBaseRowDataLookupFunction.java:76-86).

    Spark-first: broadcast hash join replaces per-probe-row RPC. At
    100 TB with a dim past the broadcast threshold, pass
    ``broadcast=False`` — the planner then picks a sort-merge /
    shuffled-hash join on the rowkey, and when ``htable`` is stored
    bucketed BY rowkey (create_bucketed_table's device applied to the
    rowkey axis) the dim side plans ZERO exchanges: only the probe
    shuffles, which is F1's actual 100 TB shape
    (test_plan_contracts.test_lookup_join_big_dim_* pins it).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "JOIN HBase table requires inner (reference) or left semantics"
        )
    build = F.broadcast(htable) if broadcast else htable
    return probe.join(
        build, probe[probe_key] == htable["rowkey"], how
    )


# ---------------------------------------------------------------------------
# F1 upgrade — event-time as-of join
# ---------------------------------------------------------------------------

def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Event-time as-of join: each probe row picks the build row with the
    greatest ``ts`` ≤ the probe's ``ts`` for the same ``key`` (inclusive),
    left semantics (unmatched probes keep nulls).

    The reference's lookup join is processing-time `FOR SYSTEM_TIME AS OF`
    (HBaseRowDataLookupFunction.java:76-86 — a point Get per probe row);
    this is the event-time generalization Spark lacks as a built-in.

    Spark-first composition, NOT a range join: tag build rows 0 / probe
    rows 1, union on (key, ts), and take a running
    ``last(build_payload, ignorenulls)`` over
    ``partitionBy(key).orderBy(ts, tag)``. ONE shuffle on the join key and
    a partition-local sort — linear at 100 TB, no O(probe × build)
    candidate blowup, skew profile identical to any keyed shuffle (salt the
    hot keys if needed). The (ts, tag) sort order makes equal timestamps
    match inclusively, exactly like an ANSI/DuckDB ``ASOF JOIN … ON
    probe.ts >= build.ts``.

    Build rows sharing (key, ts) resolve deterministically to the
    field-order struct max: the window sorts by (ts, tag, payload), so the
    running ``last`` sees the max payload latest — the tie collapse rides
    the window sort instead of costing its own groupBy shuffle."""
    payload = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in build.columns
            if c not in (key, ts)
        ],
    )
    b = build.select(F.col(key), F.col(ts), payload.alias("__b")).withColumn(
        "__tag", F.lit(0)
    )
    p = probe.withColumn("__b", F.lit(None).cast(b.schema["__b"].dataType)).withColumn(
        "__tag", F.lit(1)
    )
    for c in probe.columns:
        if c not in (key, ts):
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    u = b.select(*p.columns).unionByName(p)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc(), F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__b", ignorenulls=True).over(w))
    out_cols = [c for c in probe.columns] + [
        F.col(f"__m.{f.name}").alias(f.name)
        for f in b.schema["__b"].dataType.fields
    ]
    return matched.filter(F.col("__tag") == 1).select(*out_cols)


def interval_join(
    probe: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-containment join: each probe row matched to every interval
    with ``start <= probe.ts < end`` — the time-slice assignment shape of
    the reference's batch slicer (HBaseController.java:209-229 slices ×
    scanned rows), generalized to arbitrary interval tables.

    Expressed as a bare non-equi condition this plans as a
    BroadcastNestedLoopJoin: O(|probe| × |intervals|) compares AND a
    mandatory broadcast of one side — a dead end once the interval table
    outgrows the driver. Bucketing restores a keyed equi-join: each
    interval explodes to the coarse time buckets it covers (bounded
    fan-out of ``~len/bucket_width`` rows), the probe computes its single
    bucket map-side, Spark hash-joins on ``bucket``, and the exact range
    predicate filters inside the bucket. Each matched pair appears exactly
    once — a probe row owns exactly one bucket — so no dedup pass.

    ``bucket_width`` tunes fan-out vs. join selectivity: ≈ the typical
    interval length is right (each interval covers ~2 buckets; each probe
    bucket meets only intervals it could actually match). Timestamps and
    bounds must be non-negative (integer ``div`` truncation == floor
    there). Degenerate intervals (``end <= start``) are filtered out
    before the explode — F.sequence would otherwise silently generate a
    *descending* bucket sequence for them (extra exploded rows that only
    die later at the exact range filter).

    At 100 TB both sides shuffle keyed on bucket — AQE handles skew (a hot
    hour) by splitting oversized bucket partitions; no driver-side state.
    """
    p = probe.withColumn("__bk", F.expr(f"{ts_col} div {bucket_width}"))
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"({end_col} - 1) div {bucket_width}"),
            )
        ),
    )
    return (
        p.join(iv, "__bk")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bk")
    )


# ---------------------------------------------------------------------------
# H5 — delete mutation
# ---------------------------------------------------------------------------

def delete_rows(htable: DataFrame, keys: DataFrame, key_col: str = "rowkey") -> DataFrame:
    """H5 delete-mutation analog (HBaseSerde.createDeleteMutation:151-173:
    delete every declared qualifier for a key — i.e. the whole logical row).
    Over an immutable snapshot that is an anti-join: keep rows whose key is
    NOT in the delete set (`MERGE … WHEN MATCHED THEN DELETE` semantics).

    Scale: broadcast the (typically small) delete-key set; a huge delete set
    becomes a shuffled left-anti join on the bucketed key."""
    return htable.join(
        F.broadcast(keys.select(F.col(key_col))), key_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# H4 — upsert Put mutation
# ---------------------------------------------------------------------------

def upsert_rows(htable: DataFrame, puts: DataFrame, key_col: str = "rowkey") -> DataFrame:
    """H4 upsert-Put analog (HBaseSerde.createPutMutation:119-144: a Put
    writes *every declared qualifier*, so at row granularity an applied
    batch replaces the whole row for matched keys and inserts new keys —
    HBase Put IS upsert).

    Over an immutable snapshot: anti-join out replaced keys, then union the
    put batch (`MERGE … WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT`).
    Scale: broadcast the put-batch keys when the batch is small (the common
    ingest case); a bulk batch becomes a shuffled anti-join on the bucketed
    key, and on a row-level-upsert table format this is a native MERGE."""
    keys = puts.select(key_col)
    return htable.join(F.broadcast(keys), key_col, "left_anti").unionByName(puts)


# ---------------------------------------------------------------------------
# A4/A5 decode + H4 encode — nested rows ↔ long-form cells
# ---------------------------------------------------------------------------

def _encode_value(
    col: Column, dtype: DataType, charset: str = "UTF-8", legacy: bool = False
) -> Column:
    """Typed value → HBase bytes. ``charset`` applies to strings
    (HBaseTableSchema.java:55,126-128); ``legacy=True`` selects the
    class-indexed codec's 8-byte-long Date/Time layouts
    (HBaseTypeUtils.java:70-76) over the LogicalType codec's 4-byte ints
    (HBaseSerde.java:302-311)."""
    if isinstance(dtype, BinaryType):
        return col
    if isinstance(dtype, StringType):
        return codec.encode_string(col, charset=charset)
    if isinstance(dtype, ByteType):
        return codec.encode_int_be(col, 1)
    if isinstance(dtype, ShortType):
        return codec.encode_int_be(col, 2)
    if isinstance(dtype, IntegerType):
        return codec.encode_int_be(col, 4)
    if isinstance(dtype, LongType):
        return codec.encode_int_be(col, 8)
    if isinstance(dtype, FloatType):
        return codec.encode_float_be(col)
    if isinstance(dtype, DoubleType):
        return codec.encode_double_be(col)
    if isinstance(dtype, BooleanType):
        return codec.encode_boolean(col)
    if isinstance(dtype, TimestampType):
        return codec.encode_timestamp_ms(col)
    if isinstance(dtype, DateType):
        return codec.encode_date_legacy(col) if legacy else codec.encode_date(col)
    if isinstance(dtype, DecimalType):
        return codec.encode_decimal_be(col)
    if isinstance(dtype, YearMonthIntervalType):
        return codec.encode_interval_ym(codec.interval_ym_months(col))
    if isinstance(dtype, DayTimeIntervalType):
        return codec.encode_interval_dt(codec.interval_dt_millis(col))
    raise TypeError(f"no cell codec for {dtype.simpleString()}")


def _decode_value(
    col: Column, dtype: DataType, charset: str = "UTF-8", legacy: bool = False
) -> Column:
    if isinstance(dtype, BinaryType):
        return col
    if isinstance(dtype, StringType):
        return codec.decode_string(col, charset=charset)
    if isinstance(dtype, ByteType):
        return codec.decode_int_be(col, 1).cast("byte")
    if isinstance(dtype, ShortType):
        return codec.decode_int_be(col, 2).cast("short")
    if isinstance(dtype, IntegerType):
        return codec.decode_int_be(col, 4).cast("int")
    if isinstance(dtype, LongType):
        return codec.decode_int_be(col, 8)
    if isinstance(dtype, FloatType):
        return codec.decode_float_be(col)
    if isinstance(dtype, DoubleType):
        return codec.decode_double_be(col)
    if isinstance(dtype, BooleanType):
        return codec.decode_boolean(col)
    if isinstance(dtype, TimestampType):
        return codec.decode_timestamp_ms(col)
    if isinstance(dtype, DateType):
        return codec.decode_date_legacy(col) if legacy else codec.decode_date(col)
    if isinstance(dtype, DecimalType):
        return codec.decode_decimal_be(col, dtype.precision, dtype.scale)
    if isinstance(dtype, YearMonthIntervalType):
        return codec.decode_interval_ym(col).cast(dtype)
    if isinstance(dtype, DayTimeIntervalType):
        return codec.millis_to_interval_dt(codec.decode_interval_dt(col)).cast(dtype)
    raise TypeError(f"no cell codec for {dtype.simpleString()}")


def encode_htable_cells(
    htable: DataFrame, schema: HBaseTableSchema, legacy: bool = False
) -> DataFrame:
    """Nested rows → long-form cells — the Put-mutation serde
    (HBaseSerde.createPutMutation:119-144: every declared qualifier written).
    Zero-length rowkeys are dropped as dirty records
    (HBaseSerde.java:122-126, B4). String cells use ``schema.charset``
    (HBaseTableSchema.java:55,126-128); ``legacy=True`` selects the
    class-indexed codec's Date/Time-as-long layouts
    (HBaseTypeUtils.java:70-76)."""
    cs = schema.charset
    rk = F.col(schema.rowkey_name)
    rk_bin = (
        rk
        if isinstance(schema.rowkey_type, BinaryType)
        else _encode_value(rk, schema.rowkey_type, cs, legacy)
    )
    cell_structs = []
    for fam, quals in schema.families.items():
        for q, dtype in quals.items():
            cell_structs.append(
                F.struct(
                    F.lit(fam).alias("family"),
                    F.lit(q).alias("qualifier"),
                    _encode_value(F.col(f"{fam}.{q}"), dtype, cs, legacy).alias("value"),
                )
            )
    return (
        htable.select(rk_bin.alias("key"), F.explode(F.array(*cell_structs)).alias("cell"))
        .filter(F.length("key") > 0)
        .select("key", "cell.family", "cell.qualifier", "cell.value")
    )


def decode_cells_htable(
    cells: DataFrame, schema: HBaseTableSchema, legacy: bool = False
) -> DataFrame:
    """Long-form cells → nested rows (A4/A5 scan materialization,
    HBaseSerde.convertToRow:217-239). Cells are pivoted back into family
    structs; missing qualifiers decode to NULL like an absent HBase cell.
    ``schema.charset`` / ``legacy`` mirror :func:`encode_htable_cells`."""
    cs = schema.charset
    declared = [f"{fam}:{q}" for fam, quals in schema.families.items() for q in quals]
    pivoted = (
        cells.withColumn("fq", F.concat_ws(":", "family", "qualifier"))
        .groupBy("key")
        .pivot("fq", declared)  # explicit values: no extra pass, stable schema
        .agg(F.first("value"))
    )
    rk = (
        F.col("key")
        if isinstance(schema.rowkey_type, BinaryType)
        else _decode_value(F.col("key"), schema.rowkey_type, cs, legacy)
    )
    cols = [rk.alias(schema.rowkey_name)]
    for fam, quals in schema.families.items():
        cols.append(
            F.struct(
                *[
                    _decode_value(F.col(f"`{fam}:{q}`"), dtype, cs, legacy).alias(q)
                    for q, dtype in quals.items()
                ]
            ).alias(fam)
        )
    return pivoted.select(*cols)


# ---------------------------------------------------------------------------
# skew-mitigating salted equi-join (scale path for F1-family joins)
# ---------------------------------------------------------------------------

def salted_join(
    probe: DataFrame,
    dim: DataFrame,
    key: str,
    salt_partitions: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting — the standard cure when one join key
    carries a disproportionate share of probe rows (the TSDB shape: a hot
    metric, a celebrity user) and a plain shuffle join puts that whole key
    in ONE task.

    Result is IDENTICAL to ``probe.join(dim, key, how)``: the probe side
    computes a deterministic salt from ``salt_source`` (pass a
    roughly-uniform probe column, e.g. a unique row id — best, cheapest
    hash). When ``salt_source`` is None the salt hashes the WHOLE probe
    row (all columns), which spreads a single hot key value across salts
    as long as its rows differ in any other column; identical duplicate
    rows still land on one salt. Hashing the join key itself would be
    useless — every row of the hot key would get the same salt — so that
    is deliberately NOT the default. The dim side explodes each row into
    ``salt_partitions`` copies, and the join keys on ``(key, salt)``.
    The hot key's rows now spread across ``salt_partitions`` tasks; dim
    inflation is bounded by |dim| × salt_partitions (keep the factor
    small — 8-16 splits a hot task 8-16× while only copying the dim
    side, which is the small side by assumption).

    Composition with engine config: AQE's skew-join handles *detected*
    skew by splitting partitions post-shuffle; explicit salting is the
    declarative form that also works under shuffle-hash joins and
    bucketed layouts where AQE cannot re-split. Reference analog: the
    rowkey salt itself (TsdbBulkload.java:84-113) is this exact move
    applied to writes; `salted_join` is the read-side twin.
    """
    if how not in ("inner", "left", "left_semi", "leftsemi"):
        # right/full would emit each UNMATCHED dim row once per salt copy —
        # silently wrong; probe-side-preserving joins only
        raise ValueError(f"salted_join supports inner/left semantics, got {how!r}")
    if salt_source:
        src_cols = [F.col(salt_source)]
    else:
        # row-content salt: deterministic (stable under task retry) and
        # spreads a hot KEY value, unlike hashing the key itself
        src_cols = [F.col(c) for c in probe.columns]
    p = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*src_cols), F.lit(salt_partitions)).cast("int")
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_partitions - 1)))
    )
    return p.join(d, [key, "__salt"], how).drop("__salt")


# ---------------------------------------------------------------------------
# secondary index (index-table pattern — HBase-world standard idiom)
# ---------------------------------------------------------------------------

def build_index(htable: DataFrame, col: str, rowkey_col: str = "rowkey") -> DataFrame:
    """Secondary-index table: ``(index_key = value-of-col, rowkey)``.

    HBase has no native secondary indexes; the universal workaround is a
    second table keyed by the indexed value whose cells are the primary
    rowkeys (what Phoenix/Lily automate). Here the index is a two-column
    DataFrame — write it bucketed/sorted by ``index_key`` and a point
    lookup on the value prunes to one file, exactly like the primary
    table's rowkey get (A8).

    Nested family columns index fine: pass ``"f2.c_mktsegment"``.
    """
    return htable.select(
        F.col(col).alias("index_key"), F.col(rowkey_col).alias("rowkey")
    )


def index_lookup(
    htable: DataFrame,
    index: DataFrame,
    value,
    rowkey_col: str = "rowkey",
) -> DataFrame:
    """A8-via-index: resolve ``value`` to rowkeys in the (small, pruned)
    index table, then semi-join the primary table on its OWN key.

    Scale shape: the index filter prunes to one index file (key-sorted
    layout); the surviving rowkey set is usually broadcast-sized, so the
    primary-side probe is a broadcast semi-join — a full scan of the
    primary table is replaced by (tiny index read + hash probe). With the
    primary bucketed by rowkey, dynamic partition pruning narrows the
    probe further. The equivalent of HBase's multi-Get on index results.
    """
    hits = index.filter(F.col("index_key") == F.lit(value)).select("rowkey")
    return htable.join(
        F.broadcast(hits),
        htable[rowkey_col] == hits["rowkey"],
        "left_semi",
    )


# ---------------------------------------------------------------------------
# H4+H5 — mutation-log resolution (HBase read-path semantics)
# ---------------------------------------------------------------------------

def resolve_mutations(
    mutations: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "seq",
    op_col: str = "op",
    put_op: str = "P",
) -> DataFrame:
    """Resolve a Put/Delete mutation log to the visible snapshot — HBase's
    read path: per key the HIGHEST-sequence mutation wins, and a Delete
    tombstone suppresses the row entirely (HBaseSerde.createPutMutation
    :119-144 / createDeleteMutation :151-173 produce the log; region
    compaction applies exactly this resolution).

    ONE hash aggregate keyed on the cell key: ``max_by(payload, seq)``
    with map-side partial combine — the same shape (and therefore the
    same salt-spread skew profile) as latest-version dedup (D3). Requires
    ``seq_col`` to be unique per key (HBase: timestamp + sequence id);
    ties would make the winner nondeterministic.
    """
    payload_cols = [c for c in mutations.columns if c not in key_cols]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    resolved = mutations.groupBy(*key_cols).agg(
        F.max_by(payload, F.col(seq_col)).alias("__m")
    )
    out = resolved.select(
        *key_cols, *[F.col(f"__m.{c}").alias(c) for c in payload_cols]
    )
    return out.filter(F.col(op_col) == put_op).drop(op_col)
