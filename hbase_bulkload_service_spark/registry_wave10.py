"""Registry wave 10 (q130+) — round-4 final additions:

- q130 data-quality expectations audit (the Deequ / Great-Expectations
  check-suite shape: row predicates, uniqueness, referential integrity —
  one fused scan per audited table, per-expectation failure counts);
- q131 hierarchical ROLLUP aggregation (multi-level totals in one pass,
  GROUPING() disambiguation — the reporting shape of the reference's
  E3 SQL-aggregation surface);
- q132 term cooccurrence / PMI-lift collocation mining (df-band-blocked
  pair generation, exact integer lift in ppb).

Same portability rules as registry.py: integer outputs, identical
aliases both sides, DuckDB SUMs cast back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import quality, textops
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load


# ===========================================================================
# q130 — declarative data-quality expectations audit
# ===========================================================================


def _orders_row_checks():
    """The orders row-check suite — shared by q130 (batch audit) and
    q137 (streaming monitor), whose contract is bit-for-bit equality
    with this exact suite; a single definition removes drift risk."""
    return [
        ("orders_key_not_null", F.col("o_orderkey").isNotNull()),
        ("orders_status_domain", F.col("o_orderstatus").isin("F", "O", "P")),
        ("orders_price_positive", F.col("o_totalprice") > 0),
        ("orders_priority_urgent", F.col("o_orderpriority") == "1-URGENT"),
    ]


@register(
    "q130_expectations_audit",
    """
    WITH ck AS (SELECT DISTINCT c_custkey FROM customer),
         ok_ AS (SELECT DISTINCT o_orderkey FROM orders),
         u AS (
    SELECT 'orders_key_not_null' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderkey IS NOT NULL, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'),
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_priority_urgent',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderpriority = '1-URGENT',
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_key_unique',
           CAST(COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
                - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN ck.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders LEFT JOIN ck ON o_custkey = c_custkey
    WHERE o_custkey IS NOT NULL
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(l_discount BETWEEN 0 AND 0.5,
                                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_line_unique',
           CAST(COUNT(CASE WHEN l_orderkey IS NOT NULL
                            AND l_linenumber IS NOT NULL THEN 1 END)
                AS BIGINT),
           CAST(COUNT(CASE WHEN l_orderkey IS NOT NULL
                            AND l_linenumber IS NOT NULL THEN 1 END)
                - (SELECT COUNT(*) FROM
                    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
                     WHERE l_orderkey IS NOT NULL
                       AND l_linenumber IS NOT NULL))
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN ok_.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem LEFT JOIN ok_ ON l_orderkey = ok_.o_orderkey
    WHERE l_orderkey IS NOT NULL
    )
    SELECT expectation, n_checked, n_failed, n_failed = 0 AS ok FROM u
    """,
)
def q130_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite over the TPC-H fact tables: orders
    gets 4 row predicates + key uniqueness + customer FK, lineitem gets
    2 row predicates + composite-key uniqueness + orders FK. One fused
    aggregate scan per table plus one keyed join per FK; the
    intentionally-mixed 'orders_priority_urgent' check reports real
    failure counts (audit, not assert). The oracle rebuilds every count
    from first-principles SQL."""
    orders = load(spark, sf_dir, "orders", spread=True)
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem", spread=True)
    a1 = quality.expectations_audit(
        orders,
        row_checks=_orders_row_checks(),
        unique_keys=[("orders_key_unique", ["o_orderkey"])],
        fk_checks=[("orders_custkey_fk", "o_custkey", customer, "c_custkey")],
    )
    a2 = quality.expectations_audit(
        lineitem,
        row_checks=[
            (
                "lineitem_discount_range",
                F.col("l_discount").between(0, 0.5),
            ),
            ("lineitem_qty_positive", F.col("l_quantity") > 0),
        ],
        unique_keys=[
            ("lineitem_line_unique", ["l_orderkey", "l_linenumber"])
        ],
        fk_checks=[
            ("lineitem_orderkey_fk", "l_orderkey", orders, "o_orderkey")
        ],
    )
    return a1.unionByName(a2)


# ===========================================================================
# q131 — hierarchical ROLLUP aggregation with GROUPING disambiguation
# ===========================================================================


@register(
    "q131_rollup_totals",
    """
    SELECT source, lang,
           CAST(GROUPING(source, lang) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """,
)
def q131_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level reporting totals in ONE pass — per (source, lang),
    per source, and grand total — via the native ROLLUP operator
    (Catalyst plans a single Expand + hash aggregate: one scan, one
    shuffle, no self-union of three aggregates). GROUPING() makes
    subtotal rows distinguishable from genuine NULL group values, so the
    oracle hash-match also proves the two engines agree on the grouping
    bitmask convention (first column = high bit)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return (
        docs.rollup("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "sum_chars")
    )


# ===========================================================================
# q132 — PMI-lift term cooccurrence with relative df-band blocking
# ===========================================================================

_CO_MIN_PPM = 40_000
_CO_MAX_PPM = 780_000


@register(
    "q132_term_cooccurrence",
    f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS ws
      FROM documents
    ),
    t2 AS (
      SELECT doc_id, term
      FROM (SELECT doc_id, unnest(ws) AS term FROM w)
      WHERE term <> ''
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM t2 GROUP BY term),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    band AS (
      SELECT term, df FROM dfs, n
      WHERE df * 1000000 >= {_CO_MIN_PPM} * nd
        AND df * 1000000 <= {_CO_MAX_PPM} * nd
    ),
    bt AS (
      SELECT t2.doc_id, t2.term, band.df
      FROM t2 JOIN band USING (term)
    ),
    p AS (
      SELECT a.term AS term_a, b.term AS term_b,
             a.df AS dfa, b.df AS dfb, COUNT(*) AS co
      FROM bt a JOIN bt b USING (doc_id)
      WHERE a.term < b.term
      GROUP BY 1, 2, 3, 4
    )
    SELECT term_a, term_b,
           CAST(dfa AS BIGINT) AS df_a,
           CAST(dfb AS BIGINT) AS df_b,
           CAST(co AS BIGINT) AS co_df,
           CAST(co * 1000000000 * nd // (dfa * dfb) AS BIGINT) AS score_ppb
    FROM p, n
    WHERE co >= 2
    """,
)
def q132_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining gate: exact integer PMI-lift (ppb) for every
    mid-band term pair — the df band is RELATIVE (4%–78% of N) so the
    same configuration is meaningful at every scale factor; the band cap
    is what keeps the per-doc pair fan-out bounded (stopword-class terms
    above 78% df never enter the self-join)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return textops.term_cooccurrence(
        docs,
        text_col="text",
        min_df=_CO_MIN_PPM,
        max_df=_CO_MAX_PPM,
        min_co=2,
        rel_ppm=True,
    )
