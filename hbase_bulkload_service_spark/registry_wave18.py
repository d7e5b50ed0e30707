"""Registry wave 18 (round 6): two new LLM-data-pipeline capabilities —
DSIR importance-resampling data selection (q171) and product-quantization
ANN with asymmetric distance computation (q172).

Both follow the repo's integer-exact oracle discipline: no float crosses
a verdict (DSIR uses an integer likelihood-ratio twin; PQ reuses the
q118 quantized-Lloyd device with the subspace as an extra group key).
Reference parity: the reference has no data-selection or ANN surface;
these extend the training-data-pipeline capability set the brief makes
first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.operators import curation, similarity
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q171 — DSIR importance resampling (hashed-bigram domain matching)
# ===========================================================================

_DSIR_BUCKETS = 4096
_DSIR_KEEP = 100
_DSIR_TARGET = "zh"


@register(
    "q171_dsir_importance",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    w AS (SELECT doc_id, lang, string_split(nt, ' ') AS ws FROM t),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w WHERE len(ws) >= 2
    ),
    fb AS MATERIALIZED (
      SELECT doc_id, lang,
             ('0x' || substr(md5(bigram), 1, 8))::BIGINT % {_DSIR_BUCKETS}
               AS bucket
      FROM bg
    ),
    stats AS (
      SELECT bucket,
             SUM(CASE WHEN lang = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN lang = '{_DSIR_TARGET}' THEN 0 ELSE 1 END) AS cr
      FROM fb GROUP BY 1
    ),
    df AS (
      SELECT doc_id, bucket, COUNT(*) AS c
      FROM fb WHERE lang <> '{_DSIR_TARGET}' GROUP BY 1, 2
    ),
    wgt AS (
      SELECT df.doc_id,
             CAST(SUM(df.c) AS BIGINT) AS n_feats,
             CAST(SUM(df.c * (((stats.ct + 1) * 1000000) // (stats.cr + 1)))
                  AS BIGINT) AS weight_ppm
      FROM df JOIN stats USING (bucket) GROUP BY 1
    )
    SELECT doc_id, n_feats, weight_ppm
    FROM wgt ORDER BY weight_ppm DESC, doc_id LIMIT {_DSIR_KEEP}
    """,
)
def q171_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/curation.py:dsir_importance): rank
    the non-'{target}' document pool by hashed-bigram likelihood-ratio
    similarity to the '{target}' stratum and keep the top 100 — the
    domain-matching selection stage of a pretraining pipeline, with an
    integer-exact ratio twin so the verdict is hash-exact. Plan: bucket
    aggs collapse to 4096 rows, score table broadcasts, final top-N is
    TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return curation.dsir_importance(
        docs,
        target_value=_DSIR_TARGET,
        n_buckets=_DSIR_BUCKETS,
        keep_n=_DSIR_KEEP,
    )


# ===========================================================================
# q172 — product-quantization ANN (per-subspace Lloyd codebooks + ADC)
# ===========================================================================

_PQ_M = 4        # subspaces (64-dim corpus -> 16-dim subvectors)
_PQ_K = 8        # codebook size per subspace
_PQ_ITERS = 1    # centroid update rounds (assignments run iters+1 times)
_PQ_NQ = 4       # queries = the 4 lowest-id vectors
_PQ_TOPK = 5
_PQ_D = 16       # dim // m, fixed by the embeddings fixture (64-dim)


def _pq_round(i: int) -> str:
    """One unrolled per-subspace Lloyd round — q118's _km_round with the
    subspace in every key (see operators/similarity.py:pq_ann_topk)."""
    return f"""
    d{i} AS (
      SELECT vm.vec_id, vm.sub, c{i}.cid,
             SUM((vm.x - c{i}.c) * (vm.x - c{i}.c)) AS d2
      FROM vm JOIN c{i} ON vm.sub = c{i}.sub AND vm.spos = c{i}.spos
      GROUP BY 1, 2, 3
    ),
    a{i} AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, cid) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ),
    u{i} AS (
      SELECT a{i}.sub, a{i}.cid, vm.spos, SUM(vm.x) // COUNT(*) AS c
      FROM a{i} JOIN vm
        ON a{i}.vec_id = vm.vec_id AND a{i}.sub = vm.sub
      GROUP BY 1, 2, 3
    ),
    c{i + 1} AS MATERIALIZED (
      SELECT c{i}.sub, c{i}.cid, c{i}.spos, COALESCE(u{i}.c, c{i}.c) AS c
      FROM c{i} LEFT JOIN u{i}
        ON u{i}.sub = c{i}.sub AND u{i}.cid = c{i}.cid
           AND u{i}.spos = c{i}.spos
    )"""


_PQ_ROUNDS = ",".join(_pq_round(i) for i in range(_PQ_ITERS))


@register(
    "q172_pq_ann",
    f"""
    WITH base AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    vm AS MATERIALIZED (
      SELECT vec_id,
             CAST((pos - 1) // {_PQ_D} AS INT) AS sub,
             CAST((pos - 1) % {_PQ_D} AS INT) AS spos,
             CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM base
    ),
    ids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY 1 LIMIT {_PQ_K})
    ),
    c0 AS MATERIALIZED (
      SELECT vm.sub, ids.cid, vm.spos, vm.x AS c
      FROM ids JOIN vm USING (vec_id)
    ),
    {_PQ_ROUNDS},
    dfin AS (
      SELECT vm.vec_id, vm.sub, cf.cid,
             SUM((vm.x - cf.c) * (vm.x - cf.c)) AS d2
      FROM vm JOIN c{_PQ_ITERS} cf
        ON vm.sub = cf.sub AND vm.spos = cf.spos
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, cid) AS rn
        FROM dfin
      ) WHERE rn = 1
    ),
    qids AS (
      SELECT vec_id AS qid
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY 1 LIMIT {_PQ_NQ})
    ),
    qd AS (
      SELECT vm.vec_id AS qid, cf.sub, cf.cid,
             SUM((vm.x - cf.c) * (vm.x - cf.c)) AS qd2
      FROM vm JOIN qids ON vm.vec_id = qids.qid
      JOIN c{_PQ_ITERS} cf ON vm.sub = cf.sub AND vm.spos = cf.spos
      GROUP BY 1, 2, 3
    ),
    ad AS (
      SELECT qd.qid, codes.vec_id, CAST(SUM(qd.qd2) AS BIGINT) AS adist
      FROM codes JOIN qd ON codes.sub = qd.sub AND codes.cid = qd.cid
      GROUP BY 1, 2
    )
    SELECT qid, vec_id, adist, rnk FROM (
      SELECT qid, vec_id, adist,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adist, vec_id) AS rnk
      FROM ad
    ) WHERE rnk <= {_PQ_TOPK}
    """,
)
def q172_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py:pq_ann_topk):
    4 per-subspace integer-Lloyd codebooks of 8 centroids over the
    64-dim corpus, every vector encoded as 4 codes, and the 4 lowest-id
    vectors answered by Asymmetric Distance Computation — top-5 each.
    The oracle unrolls the SAME training round, codes, ADC table, and
    ranking as chained CTEs, so a divergence in any subspace's codebook
    or any lookup breaks the hash."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.pq_ann_topk(
        emb,
        m=_PQ_M,
        k=_PQ_K,
        iters=_PQ_ITERS,
        n_queries=_PQ_NQ,
        topk=_PQ_TOPK,
    )
