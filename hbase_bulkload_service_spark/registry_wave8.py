"""Registry wave 8 (q115+) — round-4 additions: oracle-gated sketch
accuracy (converts the last non-BPE rows-only gate into a hash-exact
row), the HFL2 binary-container bulkload round-trip (block index + ROW
bloom + DIFF encoding), and exact heavy hitters via the two-pass
Misra-Gries shape.

Same portability rules as registry.py: integer cents, epoch-millis
timestamps, identical aliases both sides, DuckDB SUMs cast back to
BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.functions.codec import decode_double_be
from hbase_bulkload_service_spark.operators import analytics, tsdb
from hbase_bulkload_service_spark.registry import (
    DUCK_SALT_BUCKET,
    TSDB_CELLS_CTE,
    cents,
    register,
)
from hbase_bulkload_service_spark.sources import hfile
from hbase_bulkload_service_spark.sources.tables import load_events


# ===========================================================================
# q115 — sketch accuracy verdicts (oracle-gated twin of q73)
# ===========================================================================

@register(
    "q115_sketch_accuracy",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS hll_within_bound,
           TRUE AS gk_rank_within_bound
    FROM events
    GROUP BY event_type
    """,
)
def q115_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73's sketches pushed through the cross-engine gate: the oracle
    computes the EXACT side (row count, distinct users) and asserts the
    accuracy booleans as literal TRUE — the row hash-matches iff HLL++
    and the GK median actually meet their error contracts on this data
    (operators/analytics.py:sketch_accuracy carries the integer-ppm
    bound algebra). Sketch STATES stay out of the oracle by nature;
    their ACCURACY no longer does."""
    ev = load_events(spark, sf_dir, spread=True).withColumn(
        "cents", cents(F.col("value"))
    )
    return analytics.sketch_accuracy(ev, "event_type", "user_id", "cents")


# ===========================================================================
# q116 — bulkload e2e through the HFL2 BINARY container (block index +
# ROW bloom + DIFF encoding — the HFile v3 features the reference's table
# config enables: HBaseManager.java:379-385, HFileOutputUtil.java:20-26)
# ===========================================================================

@register(
    "q116_hfl2_container",
    f"""
    WITH {TSDB_CELLS_CTE},
    c1 AS (
      SELECT metric_id, ts_hour, tags, offset_sec, version_ts,
             MAX(dvalue) AS dvalue
      FROM cells
      GROUP BY metric_id, ts_hour, tags, offset_sec, version_ts
    ),
    ded AS (
      SELECT metric_id, ts_hour, tags, offset_sec,
             arg_max(dvalue, version_ts) AS dvalue
      FROM c1 GROUP BY metric_id, ts_hour, tags, offset_sec
    ),
    b AS (SELECT *, {DUCK_SALT_BUCKET} AS bucket FROM ded),
    k AS (
      SELECT CAST(bucket // 8 AS INT) AS region,
             upper(lpad(to_hex(bucket), 4, '0') || lpad(to_hex(ts_hour), 8, '0')
                   || lpad(to_hex(metric_id), 6, '0') || lpad(to_hex(ts_hour), 8, '0')
                   || hex(tags)) AS key_hex,
             dvalue
      FROM b
    )
    SELECT region, COUNT(*) AS n_cells,
           COUNT(DISTINCT key_hex) AS n_keys,
           MIN(key_hex) AS min_key_hex, MAX(key_hex) AS max_key_hex,
           CAST(SUM(CAST(FLOOR(dvalue * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM k GROUP BY region
    """,
)
def q116_hfl2_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q56's flagship pipeline driven through the BINARY container: salt →
    dedup → range-partition+sort → HFL2 files (blocked DIFF-encoded
    records, per-file block index, ROW bloom, snappy-flagged blocks),
    then read BACK by parsing the binary format (one task per file, every
    container invariant — magic, index↔block agreement, DIFF decode,
    global sort, bloom membership of every row key — enforced inside the
    reading task), layout-validated like adoption would, and summarized
    per region against the same first-principles oracle as q56. A bug in
    ANY of the block encoder, index, bloom builder, or trailer breaks the
    readback and the row."""
    cells = tsdb.derive_tsdb_cells(load_events(spark, sf_dir, spread=True))
    c1 = cells.withColumn("value", tsdb.encode_double_be(F.col("dvalue")))
    kv = tsdb.bulkload_kv(c1, num_partitions=16, tie_col="dvalue")

    from hbase_bulkload_service_spark.registry_wave4 import _scratch

    d = _scratch("q116hfl2")
    import shutil

    shutil.rmtree(d, ignore_errors=True)  # fresh layout on re-run
    hfile.write_hfl2_files(kv, d, rollup=True, num_partitions=16)
    hfile.validate_layout(spark, d, rollup=True)  # dispatches to HFL2 parse
    back = hfile.read_hfl2_dir(spark, d, verify_bloom=True)
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
# q117 — exact corpus heavy hitters (two-pass Misra-Gries shape)
# ===========================================================================

from hbase_bulkload_service_spark.operators.textops import words_of
from hbase_bulkload_service_spark.registry_llm import DOCS_NORM_CTE
from hbase_bulkload_service_spark.sources.tables import load


@register(
    "q117_heavy_hitters",
    f"""
    WITH {DOCS_NORM_CTE},
    words AS (SELECT unnest(ws) AS item FROM w),
    nn AS (SELECT item FROM words WHERE item <> '')
    SELECT item, COUNT(*) AS cnt
    FROM nn
    GROUP BY item
    HAVING COUNT(*) * 1000000 >= 34000 * (SELECT COUNT(*) FROM nn)
    """,
)
def q117_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every word holding ≥3.4% of the corpus token stream, with exact
    counts (operators/analytics.py:heavy_hitters). The scale shape is the
    point: pass 1 is a zero-item-shuffle Misra-Gries summary per
    partition (bounded candidate superset by the n/k undercount bound),
    pass 2 recounts candidates exactly via a broadcast semi join — the
    full distinct-word space never shuffles, unlike the naive GROUP BY
    HAVING the oracle runs."""
    words = (
        load(spark, sf_dir, "documents", spread=True)
        .select(F.explode(words_of(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
    )
    return analytics.heavy_hitters(words, "word", phi_ppm=34_000)
