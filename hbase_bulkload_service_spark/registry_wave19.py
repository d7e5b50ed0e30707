"""Registry wave 19 (round 6): training-batch assembly and corpus-growth
monitoring — GPT-style concat-and-cut sequence packing (q173), the
k-gram novelty curve (q174), IVF-PQ ANN (q175), and fixed-round label
propagation communities (q176).

Both are integer-exact: packing is pure offset arithmetic over the
deterministic-shuffle order (the q103 device), novelty is counts and a
truncating ppm division. Reference parity: the reference has no
training-data surface; these extend the LLM-pipeline capability set the
brief makes first-class (textops.pack_sequences is the FFD no-spanning
twin of q173 — greedy, not SQL-expressible, covered by pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import textops
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q173 — concat-and-cut sequence packing (documents span window boundaries)
# ===========================================================================

_PACK_LEN = 256
_PACK_SEED = 11
_PACK_SHARDS = 8


@register(
    "q173_concat_packing",
    f"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    tok AS (SELECT doc_id, len(string_split(nt, ' ')) AS n_tok FROM t),
    h AS (
      SELECT doc_id, n_tok,
             md5('{_PACK_SEED}:' || CAST(doc_id AS VARCHAR)) AS ok
      FROM tok
    ),
    s AS (
      SELECT doc_id, n_tok, ok,
             ('0x' || substr(ok, 1, 8))::BIGINT % {_PACK_SHARDS} AS shard
      FROM h
    ),
    p AS (
      SELECT shard, n_tok,
             row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
               AS pos
      FROM s
    ),
    c AS (
      SELECT shard, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS strt
      FROM p
    ),
    b AS (
      SELECT shard, n_tok, strt,
             strt // {_PACK_LEN} AS w0,
             (strt + n_tok - 1) // {_PACK_LEN} AS w1
      FROM c
    ),
    m AS (
      SELECT shard, strt, n_tok, w0,
             unnest(range(w0, w1 + 1)) AS seq_id
      FROM b
    ),
    x AS (
      SELECT shard, seq_id,
             CASE WHEN seq_id = w0 THEN 1 ELSE 0 END AS st,
             least(strt + n_tok, (seq_id + 1) * {_PACK_LEN})
               - greatest(strt, seq_id * {_PACK_LEN}) AS tik
      FROM m
    )
    SELECT shard, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(st) AS BIGINT) AS n_starts,
           CAST(SUM(tik) AS BIGINT) AS n_tokens,
           CAST((SUM(tik) * 1000000) // {_PACK_LEN} AS BIGINT) AS fill_ppm
    FROM x GROUP BY 1, 2
    """,
)
def q173_concat_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing audit
    (operators/textops.py:concat_pack_stats): concatenate the
    deterministically-shuffled token stream per shard and cut it at
    256-token boundaries; one row per training sequence with doc-span
    and fill stats. The oracle replays the same md5 order, running-sum
    offsets, and integer window arithmetic, so any drift in the shuffle
    device or the offset math breaks the hash. Plan: one keyed exchange
    for the shard sort (window cumsum rides the same partitioning), one
    for the (shard, seq) rollup — no joins, raw text never shuffles."""
    return textops.concat_pack_stats(
        load(spark, sf_dir, "documents", spread=True),
        seq_len=_PACK_LEN,
        seed=_PACK_SEED,
        n_shards=_PACK_SHARDS,
    )


# ===========================================================================
# q174 — corpus k-gram novelty curve (diversity over ingestion order)
# ===========================================================================

_NOV_K = 5
_NOV_BATCH = 50


@register(
    "q174_ngram_novelty",
    f"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    w AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM t),
    g AS (
      SELECT doc_id // {_NOV_BATCH} AS batch,
             unnest(list_transform(
               range(1, len(ws) - {_NOV_K} + 2),
               i -> array_to_string(
                      list_slice(ws, i, i + {_NOV_K} - 1), ' ')))
               AS gm
      FROM w WHERE len(ws) >= {_NOV_K}
    ),
    per AS (
      SELECT batch, md5(gm) AS h, COUNT(*) AS c FROM g GROUP BY 1, 2
    ),
    fb AS (SELECT h, MIN(batch) AS fb FROM per GROUP BY 1)
    SELECT per.batch,
           CAST(SUM(per.c) AS BIGINT) AS n_occ,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN fb.fb = per.batch THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST((SUM(CASE WHEN fb.fb = per.batch THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM per JOIN fb USING (h) GROUP BY 1
    """,
)
def q174_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus 5-gram novelty curve (operators/textops.py:ngram_novelty):
    per 50-doc ingestion batch, the fraction of its distinct 5-grams the
    corpus has never seen before — the "is more crawl still adding
    information?" saturation monitor. Grams are md5-hashed before the
    first exchange; three linear keyed aggs, no pair join."""
    return textops.ngram_novelty(
        load(spark, sf_dir, "documents", spread=True),
        k=_NOV_K,
        batch_docs=_NOV_BATCH,
    )


# ===========================================================================
# q175 — IVF-PQ ANN (coarse inverted lists + PQ codes, the FAISS layout)
# ===========================================================================

_IVFPQ_CELLS = 4
_IVFPQ_M = 4
_IVFPQ_K = 8
_IVFPQ_NPROBE = 2
_IVFPQ_NQ = 4
_IVFPQ_TOPK = 5
_IVFPQ_D = 16  # dim // m, fixed by the embeddings fixture (64-dim)


@register(
    "q175_ivfpq_topk",
    f"""
    WITH base AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    vm AS MATERIALIZED (
      SELECT vec_id, pos - 1 AS pos,
             CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM base
    ),
    gids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings
            ORDER BY 1 LIMIT {_IVFPQ_CELLS})
    ),
    g0 AS MATERIALIZED (
      SELECT gids.cid, vm.pos, vm.x AS c FROM gids JOIN vm USING (vec_id)
    ),
    gd0 AS (
      SELECT vm.vec_id, g0.cid, SUM((vm.x - g0.c) * (vm.x - g0.c)) AS d2
      FROM vm JOIN g0 USING (pos) GROUP BY 1, 2
    ),
    ga0 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM gd0
      ) WHERE rn = 1
    ),
    gu0 AS (
      SELECT ga0.cid, vm.pos, SUM(vm.x) // COUNT(*) AS c
      FROM ga0 JOIN vm USING (vec_id) GROUP BY 1, 2
    ),
    g1 AS MATERIALIZED (
      SELECT g0.cid, g0.pos, COALESCE(gu0.c, g0.c) AS c
      FROM g0 LEFT JOIN gu0 ON gu0.cid = g0.cid AND gu0.pos = g0.pos
    ),
    cd AS (
      SELECT vm.vec_id, g1.cid, SUM((vm.x - g1.c) * (vm.x - g1.c)) AS d2
      FROM vm JOIN g1 USING (pos) GROUP BY 1, 2
    ),
    cells AS MATERIALIZED (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM cd
      ) WHERE rn = 1
    ),
    pvm AS MATERIALIZED (
      SELECT vec_id, CAST(pos // {_IVFPQ_D} AS INT) AS sub,
             CAST(pos % {_IVFPQ_D} AS INT) AS spos, x
      FROM vm
    ),
    pids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings
            ORDER BY 1 LIMIT {_IVFPQ_K})
    ),
    p0 AS MATERIALIZED (
      SELECT pvm.sub, pids.cid, pvm.spos, pvm.x AS c
      FROM pids JOIN pvm USING (vec_id)
    ),
    pd0 AS (
      SELECT pvm.vec_id, pvm.sub, p0.cid,
             SUM((pvm.x - p0.c) * (pvm.x - p0.c)) AS d2
      FROM pvm JOIN p0 ON pvm.sub = p0.sub AND pvm.spos = p0.spos
      GROUP BY 1, 2, 3
    ),
    pa0 AS (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, cid) AS rn
        FROM pd0
      ) WHERE rn = 1
    ),
    pu0 AS (
      SELECT pa0.sub, pa0.cid, pvm.spos, SUM(pvm.x) // COUNT(*) AS c
      FROM pa0 JOIN pvm
        ON pa0.vec_id = pvm.vec_id AND pa0.sub = pvm.sub
      GROUP BY 1, 2, 3
    ),
    p1 AS MATERIALIZED (
      SELECT p0.sub, p0.cid, p0.spos, COALESCE(pu0.c, p0.c) AS c
      FROM p0 LEFT JOIN pu0
        ON pu0.sub = p0.sub AND pu0.cid = p0.cid AND pu0.spos = p0.spos
    ),
    pdf AS (
      SELECT pvm.vec_id, pvm.sub, p1.cid,
             SUM((pvm.x - p1.c) * (pvm.x - p1.c)) AS d2
      FROM pvm JOIN p1 ON pvm.sub = p1.sub AND pvm.spos = p1.spos
      GROUP BY 1, 2, 3
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, sub, cid FROM (
        SELECT vec_id, sub, cid,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, cid) AS rn
        FROM pdf
      ) WHERE rn = 1
    ),
    qids AS MATERIALIZED (
      SELECT vec_id AS qid
      FROM (SELECT DISTINCT vec_id FROM embeddings
            ORDER BY 1 LIMIT {_IVFPQ_NQ})
    ),
    qcd AS (
      SELECT vm.vec_id AS qid, g1.cid AS cell,
             SUM((vm.x - g1.c) * (vm.x - g1.c)) AS d2
      FROM vm JOIN qids ON vm.vec_id = qids.qid
      JOIN g1 USING (pos) GROUP BY 1, 2
    ),
    probed AS (
      SELECT qid, cell FROM (
        SELECT qid, cell,
               row_number() OVER (PARTITION BY qid ORDER BY d2, cell) AS rn
        FROM qcd
      ) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    qd AS (
      SELECT pvm.vec_id AS qid, p1.sub, p1.cid,
             SUM((pvm.x - p1.c) * (pvm.x - p1.c)) AS qd2
      FROM pvm JOIN qids ON pvm.vec_id = qids.qid
      JOIN p1 ON pvm.sub = p1.sub AND pvm.spos = p1.spos
      GROUP BY 1, 2, 3
    ),
    ad AS (
      SELECT probed.qid, codes.vec_id, cells.cell,
             CAST(SUM(qd.qd2) AS BIGINT) AS adist
      FROM codes
      JOIN cells USING (vec_id)
      JOIN probed ON probed.cell = cells.cell
      JOIN qd ON qd.qid = probed.qid
             AND qd.sub = codes.sub AND qd.cid = codes.cid
      GROUP BY 1, 2, 3
    )
    SELECT qid, vec_id, cell, adist, rnk FROM (
      SELECT qid, vec_id, cell, adist,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adist, vec_id) AS rnk
      FROM ad
    ) WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def q175_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.py:ivfpq_topk, the FAISS
    ``IVF4,PQ4x8`` layout): a 4-cell integer-Lloyd coarse quantizer
    partitions the corpus into inverted lists, every vector carries 4
    PQ codes, and the 4 lowest-id query vectors scan only their 2
    nearest cells via ADC — search cost scales with nprobe/n_cells of
    the corpus instead of the corpus. The oracle unrolls BOTH
    quantizers (the q118 coarse device + the q172 subspace device),
    the probe ranking, and the cell-filtered ADC sum as one CTE chain,
    so a divergence anywhere — coarse cells, codes, probe list, or any
    ADC lookup — breaks the hash."""
    from hbase_bulkload_service_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.ivfpq_topk(
        emb,
        n_cells=_IVFPQ_CELLS,
        coarse_iters=1,
        m=_IVFPQ_M,
        k=_IVFPQ_K,
        pq_iters=1,
        nprobe=_IVFPQ_NPROBE,
        n_queries=_IVFPQ_NQ,
        topk=_IVFPQ_TOPK,
    )


# ===========================================================================
# q176 — fixed-round label propagation communities (oracle-unrolled
# iterative, extending the family: q114 pagerank, q121 CC, q149 k-core)
# ===========================================================================

_LPA_ROUNDS = 3


def _lpa_round(i: int) -> str:
    """One synchronous LPA round: neighbor label counts -> per-node
    argmax (count desc, label asc)."""
    return f"""
    n{i} AS (
      SELECT ed.dst AS node, l{i}.lbl
      FROM ed JOIN l{i} ON l{i}.node = ed.src
    ),
    c{i} AS (SELECT node, lbl, COUNT(*) AS c FROM n{i} GROUP BY 1, 2),
    l{i + 1} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )"""


from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    FUZZY_EDGES_CTE as _FUZZY_EDGES_CTE,
)


@register(
    "q176_label_propagation",
    f"""
    WITH {_FUZZY_EDGES_CTE},
    ed AS MATERIALIZED (
      SELECT x AS src, y AS dst FROM e
      UNION ALL SELECT y AS src, x AS dst FROM e
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM ed),
    {",".join(_lpa_round(i) for i in range(_LPA_ROUNDS))}
    SELECT node, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}
    """,
)
def q176_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the q107 near-identical-name graph:
    {_LPA_ROUNDS} synchronous label-propagation rounds
    (operators/graph.py:label_propagation_rounds) — most-frequent
    neighbor label, ties -> lowest, init = own id. The oracle unrolls
    the SAME rounds as chained MATERIALIZED CTEs, so a divergence in any
    round's counts or tie-break breaks the hash. Communities complement
    q121's hash-to-min components: CC floods one min through any bridge
    edge; LPA keeps locally-dense groups separate."""
    from hbase_bulkload_service_spark.operators import dedup, graph

    cust = load(spark, sf_dir, "customer", spread=True)
    pairs = dedup.fuzzy_self_join_k1(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return graph.label_propagation_rounds(pairs, rounds=_LPA_ROUNDS)
