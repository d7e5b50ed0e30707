"""Registry wave 11 (q133+) — round-4 closing additions:

- q133 exact k-per-stratum deterministic sampling (the exact-budget
  counterpart to q47's rate-based stratified sampling; md5-ordered,
  reproducible, with a lossless-or-loud map-side prefilter as the
  100 TB path);
- q134 asymmetric containment near-superset pairs (the quote / excerpt
  detection axis symmetric Jaccard misses; rare-gram blocked like q36).

Same portability rules as registry.py: integer outputs, identical
aliases both sides, DuckDB SUMs cast back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, dedup
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import DOCS_NORM_CTE
from hbase_bulkload_service_spark.sources.tables import load


# ===========================================================================
# q133 — exact k-per-stratum deterministic sample
# ===========================================================================

_CAP = 30
_CAP_SEED = 7
_CAP_PREFILTER_PPM = 900_000


@register(
    "q133_capped_stratum_sample",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('{_CAP_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rk <= {_CAP}
    """,
)
def q133_capped_stratum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {_CAP} docs per language, drawn by deterministic md5 order
    — the evaluation-set / per-stratum-quota builder. The engine runs
    WITH the map-side prefilter enabled (only ~90% of rows reach the
    window here; at production ppm only ~cap/stratum-size does) and its
    in-plan losslessness guard live; the oracle is the naive full
    window — the hash match proves the prefilter changed nothing."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return curation.capped_stratum_sample(
        docs,
        cap=_CAP,
        strata_col="lang",
        key_col="doc_id",
        seed=_CAP_SEED,
        prefilter_ppm=_CAP_PREFILTER_PPM,
    ).select("doc_id", "lang")


# ===========================================================================
# q134 — asymmetric containment (near-superset) pairs
# ===========================================================================

_CONT_PPM = 600_000


@register(
    "q134_containment_pairs",
    f"""
    WITH {DOCS_NORM_CTE},
    g AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(range(1, length(nt) - 3),
                              i -> substr(nt, i, 5)))) AS gram
      FROM w WHERE length(nt) >= 5
    ),
    rare AS (
      SELECT gram FROM g GROUP BY gram
      HAVING COUNT(*) <= {dedup.NGRAM_DF_MAX}
    ),
    gr AS (SELECT g.* FROM g JOIN rare USING (gram)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_inner, b.doc_id AS doc_outer
      FROM gr a JOIN gr b ON a.gram = b.gram
      WHERE a.doc_id <> b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
    inter_t AS (
      SELECT c.doc_inner, c.doc_outer, COUNT(*) AS inter
      FROM cand c
      JOIN g ga ON ga.doc_id = c.doc_inner
      JOIN g gb ON gb.doc_id = c.doc_outer AND gb.gram = ga.gram
      GROUP BY 1, 2
    )
    SELECT i.doc_inner, i.doc_outer,
           CAST(i.inter AS BIGINT) AS inter,
           CAST(s.sz AS BIGINT) AS n_inner,
           CAST(i.inter * 1000000 // s.sz AS BIGINT) AS containment_ppm
    FROM inter_t i JOIN sizes s ON s.doc_id = i.doc_inner
    WHERE i.inter * 1000000 // s.sz >= {_CONT_PPM}
    """,
)
def q134_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional near-superset pairs at containment >= 60%: the
    excerpt/quote detection axis (a short doc living inside a long one
    scores ~0 Jaccard but ~1e6 containment). Global rare-gram blocking
    + lossless upper-bound prune; the oracle rebuilds candidates,
    intersections, and the integer ppm verdict from scratch."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return dedup.containment_pairs(
        docs, text_col="text", n=5, threshold_ppm=_CONT_PPM
    )
