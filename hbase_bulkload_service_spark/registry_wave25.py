"""Registry wave 25 (round 6, session 3): embedding-budget analysis and
training-batch assembly — the Matryoshka dimension-budget recall curve
(q205) and stratified round-robin minibatch construction (q206).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.operators import curation, similarity
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q205 — Matryoshka dimension-budget recall curve
# ===========================================================================

_MRL_DIMS = (8, 16, 32, 64)
_MRL_K = 5
_MRL_NQ = 4


def _dd(a: str, b: str, d: int) -> str:
    """Prefix-d dot product as a DuckDB fold (the duck_dot device with a
    parametric dimension)."""
    return (
        f"list_reduce(list_transform(range(1, {d + 1}), "
        f"i -> ({a}[i])::DOUBLE * ({b}[i])::DOUBLE), (x, y) -> x + y)"
    )


def _cosd(a: str, b: str, d: int) -> str:
    return (
        f"CAST(FLOOR({_dd(a, b, d)} / "
        f"(sqrt({_dd(a, a, d)}) * sqrt({_dd(b, b, d)})) * 1000000) AS BIGINT)"
    )


_MRL_SCORED = " UNION ALL ".join(
    f"""SELECT q.qid, e.vec_id, {d} AS dim_budget,
           {_cosd("q.qv", "e.embedding", d)} AS cm
    FROM embeddings e, qids q WHERE e.vec_id <> q.qid"""
    for d in _MRL_DIMS
)


@register(
    "q205_matryoshka_recall",
    f"""
    WITH qids AS MATERIALIZED (
      SELECT vec_id AS qid, embedding AS qv
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_MRL_NQ})
    ),
    scored AS ({_MRL_SCORED}),
    topk AS MATERIALIZED (
      SELECT dim_budget, qid, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY dim_budget, qid
                                     ORDER BY cm DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    ),
    gt AS (SELECT qid, vec_id FROM topk WHERE dim_budget = {max(_MRL_DIMS)}),
    ov AS (
      SELECT t.dim_budget, t.qid,
             SUM(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS overlap
      FROM topk t LEFT JOIN gt g
        ON g.qid = t.qid AND g.vec_id = t.vec_id
      GROUP BY 1, 2
    )
    SELECT dim_budget, qid, CAST(overlap AS BIGINT) AS overlap,
           CAST(overlap * 1000000 // {_MRL_K} AS BIGINT) AS recall_ppm
    FROM ov
    """,
)
def q205_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka dimension-budget recall curve
    (operators/similarity.py:matryoshka_recall, after Kusupati et al.
    2022): per prefix budget {_MRL_DIMS} and query, the top-{_MRL_K}
    overlap against the full-dimension ground truth — the "how many
    dims does the index need" analysis. One corpus pass scores every
    budget (query set broadcast, |dims| prefix folds per row); the
    largest budget is the built-in recall-1.0 control row."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.matryoshka_recall(
        emb, dims=_MRL_DIMS, k=_MRL_K, n_queries=_MRL_NQ
    )


# ===========================================================================
# q206 — stratified round-robin minibatch assembly
# ===========================================================================

_SB_BATCHES = 16
_SB_SEED = 0


@register(
    "q206_stratified_batches",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{_SB_SEED}:' || CAST(doc_id AS VARCHAR)),
                        doc_id) - 1 AS rk
      FROM documents
    ),
    c AS (
      SELECT CAST(rk % {_SB_BATCHES} AS INT) AS batch, lang,
             COUNT(*) AS n_docs
      FROM r GROUP BY 1, 2
    )
    SELECT batch, lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs - SUM(n_docs) OVER (PARTITION BY lang)
                // {_SB_BATCHES} AS BIGINT) AS dev
    FROM c
    """,
)
def q206_stratified_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified minibatch assembly
    (operators/curation.py:stratified_batches): every language dealt
    round-robin (md5 draw order) over {_SB_BATCHES} batches, audited
    as per-(batch, lang) counts with the deviation from floor(n/B) —
    0/1 by construction, so the dev column doubles as the fairness
    proof the oracle pins. One stratum-keyed rank exchange + one
    rollup."""
    return curation.stratified_batches(
        load(spark, sf_dir, "documents", spread=True),
        n_batches=_SB_BATCHES,
        seed=_SB_SEED,
    )
