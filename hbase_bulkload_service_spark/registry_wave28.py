"""Registry wave 28 (round 6, session 4): classifier/eval and sketch
instrumentation — q214 Cohen's kappa per source (chance-corrected
agreement over q32's predictions), q215 count-min sketch with its
exact-recount accuracy gate, q216 per-source token-distribution TVD
(exact corpus-drift monitor), q217 IVF nprobe-vs-recall curve (the
search-budget sweep completing the q205 dimension-budget curve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, similarity, textops
from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import NT
from hbase_bulkload_service_spark.registry_wave8 import (  # noqa: E402
    _km_round,
    _KM_ITERS,
    _KM_K,
)
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q214 — Cohen's kappa per source (chance-corrected classifier agreement)
# ===========================================================================


@register(
    "q214_kappa_agreement",
    f"""
    WITH pred AS ({_ORACLE["q32_lang_id"]}),
    cells AS (
      SELECT d.source AS g, d.lang AS label, p.pred_lang AS pred,
             COUNT(*) AS n
      FROM pred p JOIN documents d USING (doc_id)
      GROUP BY 1, 2, 3
    ),
    rows_ AS (SELECT g, label AS cls, SUM(n) AS row_n FROM cells GROUP BY 1, 2),
    cols_ AS (SELECT g, pred AS cls, SUM(n) AS col_n FROM cells GROUP BY 1, 2),
    pe AS (
      SELECT r.g, SUM(r.row_n * c.col_n) AS pe_num
      FROM rows_ r JOIN cols_ c USING (g, cls) GROUP BY 1
    ),
    tot AS (
      SELECT g, SUM(n) AS n_docs,
             SUM(CASE WHEN label = pred THEN n ELSE 0 END) AS n_agree
      FROM cells GROUP BY 1
    )
    SELECT t.g AS source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_agree AS BIGINT) AS n_agree,
           CAST(t.n_agree * 1000000 // t.n_docs AS BIGINT) AS po_ppm,
           CAST(COALESCE(p.pe_num, 0) * 1000000 // (t.n_docs * t.n_docs)
                AS BIGINT) AS pe_ppm,
           CAST((t.n_docs * t.n_agree - COALESCE(p.pe_num, 0)) * 1000000
                // nullif(t.n_docs * t.n_docs - COALESCE(p.pe_num, 0), 0)
                AS BIGINT) AS kappa_ppm
    FROM tot t LEFT JOIN pe p USING (g)
    """,
)
def q214_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per source (operators/textops.py:kappa_agreement):
    q32's language predictions vs labels as chance-corrected agreement
    — the per-provider eval readout that raw accuracy (q208's diagonal)
    flatters when a source's label marginals are skewed. Exact rational
    ``(N·D − Σ row·col) / (N² − Σ row·col)`` in truncating ppm;
    negative kappa truncates identically under Spark ``div`` and DuckDB
    ``//``. The oracle nests q32's full oracle so predictor and eval
    cannot drift."""
    return textops.kappa_agreement(
        load(spark, sf_dir, "documents", spread=True)
    )


# ===========================================================================
# q215 — count-min sketch + exact-recount accuracy gate
# ===========================================================================

_CM_D = 4
_CM_W = 256
_CM_TOP = 20


@register(
    "q215_countmin_sketch",
    f"""
    WITH truth AS (
      SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS true_cnt
      FROM events GROUP BY 1
    ),
    hashes AS MATERIALIZED (
      SELECT t.key, t.true_cnt, j.row_id,
             ('0x' || substr(md5(CAST(j.row_id AS VARCHAR) || ':' || t.key),
                             1, 8))::BIGINT % {_CM_W} AS col_id
      FROM truth t, (SELECT unnest(range({_CM_D})) AS row_id) j
    ),
    cells AS (
      SELECT row_id, col_id, SUM(true_cnt) AS cell_sum
      FROM hashes GROUP BY 1, 2
    ),
    top AS MATERIALIZED (
      SELECT key, true_cnt FROM truth
      ORDER BY true_cnt DESC, key LIMIT {_CM_TOP}
    ),
    est AS (
      SELECT h.key, MIN(c.cell_sum) AS est_cnt
      FROM hashes h JOIN cells c USING (row_id, col_id)
      JOIN top USING (key)
      GROUP BY 1
    )
    SELECT t.key,
           CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(e.est_cnt AS BIGINT) AS est_cnt,
           e.est_cnt >= t.true_cnt AS lower_bound_ok,
           CAST((e.est_cnt - t.true_cnt) * 1000000 // t.true_cnt AS BIGINT)
             AS over_ppm
    FROM top t JOIN est e USING (key)
    """,
)
def q215_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch with its accuracy gate
    (operators/analytics.py:countmin_estimates): a {_CM_D}×{_CM_W}
    sketch over user activity, point-estimated for the {_CM_TOP}
    heaviest users and compared against the exact recount — both CMS
    guarantees surface as columns (``lower_bound_ok`` structural TRUE;
    ``over_ppm`` the collision overestimate). md5-row hashes make the
    sketch itself engine-reproducible, so the ORACLE REBUILDS THE
    SKETCH — the hash pins the estimates, not just the verdicts.
    Sketch rows come from the collapsed per-key counts, never the raw
    stream; estimation is a broadcast join on the d·w cell table."""
    return analytics.countmin_estimates(
        load_events(spark, sf_dir, spread=True),
        "user_id",
        depth=_CM_D,
        width=_CM_W,
        top_n=_CM_TOP,
    )


# ===========================================================================
# q216 — per-source token-distribution TVD (corpus drift, exact)
# ===========================================================================


@register(
    "q216_token_tvd",
    f"""
    WITH wds AS (
      SELECT source AS g, unnest(string_split({NT}, ' ')) AS w
      FROM documents
    ),
    sw AS (
      SELECT g, w, COUNT(*) AS c_sw FROM wds WHERE w <> '' GROUP BY 1, 2
    ),
    wtot AS (SELECT w, SUM(c_sw) AS c_w FROM sw GROUP BY 1),
    totals AS (
      SELECT g, SUM(c_sw) AS n_s, COUNT(*) AS n_types FROM sw GROUP BY 1
    ),
    n AS (SELECT SUM(c_w) AS n_corpus FROM wtot),
    j AS (
      SELECT s.g,
             SUM(ABS(s.c_sw * n.n_corpus - t.c_w * tt.n_s)) AS present_num,
             SUM(t.c_w) AS c_w_present
      FROM sw s JOIN wtot t USING (w) JOIN totals tt USING (g)
      CROSS JOIN n
      GROUP BY 1
    )
    SELECT tt.g AS source,
           CAST(tt.n_s AS BIGINT) AS n_tokens,
           CAST(tt.n_types AS BIGINT) AS n_types,
           CAST((j.present_num + tt.n_s * (n.n_corpus - j.c_w_present))
                * 1000000 // (2 * tt.n_s * n.n_corpus) AS BIGINT) AS tvd_ppm
    FROM totals tt JOIN j USING (g) CROSS JOIN n
    """,
)
def q216_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram drift (operators/textops.py:token_tvd): the
    EXACT total-variation distance between each source's token
    distribution and the corpus mixture, in ppm — integer
    cross-multiplication with the absent-word mass folded in
    analytically (``N_s·(N − Σ_present c_w)``), so no float
    probabilities and no source×vocab grid ever materializes. The
    model-free companion to q147's embedding drift and q194's
    reference-rank surprisal."""
    return textops.token_tvd(load(spark, sf_dir, "documents", spread=True))


# ===========================================================================
# q217 — IVF nprobe-vs-recall curve (search-budget sweep)
# ===========================================================================

_NP_K = 5
_NP_NQ = 4
_NP_PROBES = (1, 2, 4, 8)
_NP_PROBES_SQL = ", ".join(f"({p})" for p in _NP_PROBES)
_NP_ROUNDS = ",".join(_km_round(i) for i in range(_KM_ITERS))


@register(
    "q217_nprobe_recall",
    f"""
    WITH vm AS MATERIALIZED (
      SELECT vec_id, pos - 1 AS pos,
             CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM (
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
      )
    ),
    ids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY 1 LIMIT {_KM_K})
    ),
    c0 AS (SELECT ids.cid, vm.pos, vm.x AS c FROM ids JOIN vm USING (vec_id)),
    {_NP_ROUNDS},
    cf AS MATERIALIZED (SELECT * FROM c{_KM_ITERS}),
    df AS (
      SELECT vm.vec_id, cf.cid,
             SUM((vm.x - cf.c) * (vm.x - cf.c)) AS d2
      FROM vm JOIN cf USING (pos) GROUP BY 1, 2
    ),
    asn AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM df
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS qid
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY 1 LIMIT {_NP_NQ})
    ),
    qv AS MATERIALIZED (
      SELECT q.qid, vm.pos, vm.x FROM q JOIN vm ON vm.vec_id = q.qid
    ),
    alld AS MATERIALIZED (
      SELECT qv.qid, vm.vec_id, SUM((qv.x - vm.x) * (qv.x - vm.x)) AS d2
      FROM qv JOIN vm ON vm.pos = qv.pos AND vm.vec_id <> qv.qid
      GROUP BY 1, 2
    ),
    gt AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
        FROM alld
      ) WHERE rn <= {_NP_K}
    ),
    qc AS (
      SELECT qv.qid, cf.cid, SUM((qv.x - cf.c) * (qv.x - cf.c)) AS d2
      FROM qv JOIN cf USING (pos) GROUP BY 1, 2
    ),
    qcr AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid ORDER BY d2, cid)
               AS cell_rank
      FROM qc
    ),
    probes(nprobe) AS (VALUES {_NP_PROBES_SQL}),
    allowed AS MATERIALIZED (
      SELECT p.nprobe, r.qid, r.cid
      FROM probes p JOIN qcr r ON r.cell_rank <= p.nprobe
    ),
    cand AS MATERIALIZED (
      SELECT a.nprobe, d.qid, d.vec_id, d.d2
      FROM alld d
      JOIN asn s ON s.vec_id = d.vec_id
      JOIN allowed a ON a.qid = d.qid AND a.cid = s.cid
    ),
    topk AS (
      SELECT nprobe, qid, vec_id FROM (
        SELECT nprobe, qid, vec_id,
               row_number() OVER (
                 PARTITION BY nprobe, qid ORDER BY d2, vec_id) AS rn
        FROM cand
      ) WHERE rn <= {_NP_K}
    ),
    nc AS (
      SELECT nprobe, qid, COUNT(*) AS n_candidates FROM cand GROUP BY 1, 2
    ),
    ov AS (
      SELECT t.nprobe, t.qid, COUNT(*) AS overlap
      FROM topk t JOIN gt ON gt.qid = t.qid AND gt.vec_id = t.vec_id
      GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT nprobe, qid FROM allowed)
    SELECT g.nprobe, g.qid,
           CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap,
           CAST(COALESCE(ov.overlap, 0) * 1000000 // {_NP_K} AS BIGINT)
             AS recall_ppm
    FROM grid g
    LEFT JOIN nc USING (nprobe, qid)
    LEFT JOIN ov USING (nprobe, qid)
    """,
)
def q217_nprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe-vs-recall curve
    (operators/similarity.py:nprobe_recall): per search budget, the
    exact-ground-truth top-{_NP_K} overlap AND the candidate count the
    budget paid — the index-tuning sweep completing q205's
    dimension-budget curve (budget on the OTHER axis). Coarse centroids
    are the shared q118 integer-Lloyd device — the oracle re-derives
    the SAME {_KM_ITERS} rounds via q118's unrolled CTE text (imported,
    not copied), then replays cell ranking, candidate gating, and both
    rankings; nprobe={max(_NP_PROBES)} ≥ n_cells is the built-in
    recall-1.0 exhaustive control."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.nprobe_recall(
        emb,
        n_cells=_KM_K,
        iters=_KM_ITERS,
        k=_NP_K,
        n_queries=_NP_NQ,
        nprobes=_NP_PROBES,
    )
