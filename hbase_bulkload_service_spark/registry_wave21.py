"""Registry wave 21 (round 6, session 3): the cross-lingual / curation
quartet a multilingual pretraining pipeline runs between crawl and
tokenizer — margin-based bitext mining (q191), phrase-level
decontamination over positional postings (q192), temperature-based
language resampling (q193), and CCNet-style reference-surprisal quality
bucketing (q194).

Integer-exact throughout: cosines are floor-micros, the mining margin is
a truncating-div ppm twin, quotas are largest-remainder integers, and
the surprisal score is a capped frequency RANK (monotone in -log p for
a unigram reference model) so no float ever crosses a verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity, textops
from hbase_bulkload_service_spark.oracle_frags import duck_cos_micros as _cos
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q191 — margin-based bitext mining (Artetxe & Schwenk 2019)
# ===========================================================================

_BTX_K = 4
_BTX_EVERY = 50
_BTX_MOD = 2


@register(
    "q191_bitext_mining",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id % {_BTX_EVERY} = 0
    ),
    s AS (
      SELECT e.vec_id, c.centroid_id,
             {_cos("e.embedding", "c.cvec")} AS cm
      FROM embeddings e, c
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, centroid_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cm DESC, centroid_id) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    cand AS MATERIALIZED (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_cos("ea.embedding", "eb.embedding")} AS cos_micros
      FROM assign a JOIN assign b ON a.cell = b.cell
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id % {_BTX_MOD} = 0 AND b.vec_id % {_BTX_MOD} <> 0
    ),
    ranked AS MATERIALIZED (
      SELECT *,
             row_number() OVER (PARTITION BY vec_a
                                ORDER BY cos_micros DESC, vec_b) AS ra,
             row_number() OVER (PARTITION BY vec_b
                                ORDER BY cos_micros DESC, vec_a) AS rb
      FROM cand
    ),
    sa AS (
      SELECT vec_a,
             SUM(CASE WHEN ra <= {_BTX_K} THEN cos_micros ELSE 0 END) AS sum_a
      FROM ranked GROUP BY 1
    ),
    sb AS (
      SELECT vec_b,
             SUM(CASE WHEN rb <= {_BTX_K} THEN cos_micros ELSE 0 END) AS sum_b
      FROM ranked GROUP BY 1
    )
    SELECT m.vec_a, m.vec_b, m.cos_micros,
           CAST(sa.sum_a AS BIGINT) AS sum_a,
           CAST(sb.sum_b AS BIGINT) AS sum_b,
           CAST((m.cos_micros * {2 * _BTX_K} * 1000000)
                // nullif(sa.sum_a + sb.sum_b, 0) AS BIGINT) AS margin_ppm
    FROM (SELECT * FROM ranked WHERE ra = 1 AND rb = 1) m
    JOIN sa USING (vec_a) JOIN sb USING (vec_b)
    """,
)
def q191_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining
    (operators/similarity.py:bitext_margin_pairs, after Artetxe &
    Schwenk 2019): mutual-nearest-neighbor pairs between the two
    deterministic sides of the embedding space, scored by the integer
    ratio margin over each side's top-{_BTX_K} candidate cosines.
    Candidates are IVF-cell-blocked (equi-join on cell — never
    |A|x|B|); the margin twin is
    (cos * 2k * 1e6) div (sum_a + sum_b)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.bitext_margin_pairs(
        emb,
        similarity.pseudo_centroids(emb, every=_BTX_EVERY),
        k=_BTX_K,
        side_mod=_BTX_MOD,
    )


# ===========================================================================
# q192 — phrase-level decontamination (positional postings)
# ===========================================================================

_PHR_LEN = 3
_PHR_MOD = 97


@register(
    "q192_phrase_decontam",
    f"""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS ws
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(ws) AS w,
             generate_subscripts(ws, 1) - 1 AS pos
      FROM t
    ),
    ph AS MATERIALIZED (
      SELECT doc_id AS phrase_doc, unnest(ws[1:{_PHR_LEN}]) AS w,
             generate_subscripts(ws[1:{_PHR_LEN}], 1) - 1 AS i
      FROM t WHERE doc_id % {_PHR_MOD} = 0 AND len(ws) >= {_PHR_LEN}
    ),
    votes AS (
      SELECT ph.phrase_doc, tok.doc_id, tok.pos - ph.i AS strt
      FROM tok JOIN ph ON tok.w = ph.w
      WHERE tok.pos - ph.i >= 0
    ),
    aligned AS (
      SELECT phrase_doc, doc_id, strt
      FROM votes GROUP BY 1, 2, 3 HAVING COUNT(*) = {_PHR_LEN}
    )
    SELECT phrase_doc, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(strt) AS INT) AS first_pos
    FROM aligned GROUP BY 1, 2
    """,
)
def q192_phrase_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-level decontamination
    (operators/textops.py:phrase_decontamination): the first
    {_PHR_LEN} normalized tokens of every eval-cohort document
    (doc_id % {_PHR_MOD} = 0), located in EVERY corpus document with
    occurrence counts and first positions (overlaps included, which
    substring-count arithmetic would merge). The GPT-3-style n-gram
    hash-set plan: each doc emits its sliding P-grams once and probes
    the BROADCAST phrase set (per-token cost independent of eval-set
    size; only hits shuffle) — the probe measured both alternatives
    quadratic: the postings join in shuffle, the nested-loop scan in
    CPU (SCALE.md). The oracle replays the alignment as a positional
    unnest + vote join."""
    return textops.phrase_decontamination(
        load(spark, sf_dir, "documents", spread=True),
        phrase_len=_PHR_LEN,
        source_mod=_PHR_MOD,
    )


# ===========================================================================
# q193 — temperature-based multilingual resampling (alpha = 0.5)
# ===========================================================================

_TMP_BUDGET = 200
_TMP_SEED = 0


@register(
    "q193_temperature_mix",
    f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ),
    wts AS (
      SELECT lang, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight
      FROM counts
    ),
    alloc AS (
      SELECT lang, n_docs, weight,
             ({_TMP_BUDGET} * weight) // SUM(weight) OVER () AS bse,
             ({_TMP_BUDGET} * weight) % SUM(weight) OVER () AS rem
      FROM wts
    ),
    quotas AS MATERIALIZED (
      SELECT lang, n_docs, weight,
             CAST(bse + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                              <= {_TMP_BUDGET} - SUM(bse) OVER ()
                         THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM alloc
    ),
    ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{_TMP_SEED}:' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS BIGINT) AS rnk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.rnk, q.n_docs, q.weight, q.quota
    FROM ranked r JOIN quotas q USING (lang)
    WHERE r.rnk <= q.quota
    """,
)
def q193_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual resampling
    (operators/curation.py:temperature_sample, the XLM-R alpha=0.5
    move): a {_TMP_BUDGET}-doc budget apportioned across languages by
    floor(sqrt(n_lang)) weights (largest-remainder, sums exactly to
    budget), each language keeping its first quota docs by the
    reproducible md5 draw. The language histogram and every
    apportionment window are metadata-scale; the corpus pays one rank
    exchange."""
    return curation.temperature_sample(
        load(spark, sf_dir, "documents", spread=True),
        budget=_TMP_BUDGET,
        seed=_TMP_SEED,
    )


# ===========================================================================
# q194 — CCNet-style reference-surprisal quality buckets
# ===========================================================================

_SRP_CAP = 1000
_SRP_MOD = 7
_SRP_TILES = 3


@register(
    "q194_surprisal_buckets",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    tok AS (
      SELECT doc_id, lang, unnest(string_split(nt, ' ')) AS w FROM t
    ),
    vocab AS MATERIALIZED (
      SELECT w, row_number() OVER (ORDER BY cnt DESC, w) AS rnk
      FROM (
        SELECT w, COUNT(*) AS cnt FROM tok
        WHERE doc_id % {_SRP_MOD} = 0 GROUP BY 1
        ORDER BY cnt DESC, w LIMIT {_SRP_CAP}
      )
    ),
    scored AS (
      SELECT tok.doc_id, tok.lang,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             SUM(COALESCE(vocab.rnk, {_SRP_CAP + 1}))
               // COUNT(*) AS avg_rank
      FROM tok LEFT JOIN vocab USING (w)
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_tok, CAST(avg_rank AS BIGINT) AS avg_rank,
           CAST(ntile({_SRP_TILES}) OVER (
             PARTITION BY lang ORDER BY avg_rank, doc_id) AS INT) AS bucket,
           CASE CAST(ntile({_SRP_TILES}) OVER (
                  PARTITION BY lang ORDER BY avg_rank, doc_id) AS INT)
             WHEN 1 THEN 'head' WHEN {_SRP_TILES} THEN 'tail'
             ELSE 'middle' END AS tier
    FROM scored
    """,
)
def q194_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing
    (operators/textops.py:surprisal_buckets, after Wenzek et al. 2020):
    every document scored by the truncating mean frequency-RANK of its
    tokens in the reference slice (doc_id % {_SRP_MOD} = 0; rank capped
    at {_SRP_CAP}, unseen costs {_SRP_CAP + 1} — rank is monotone in
    -log p, so the ordering matches reference-LM perplexity), then cut
    into per-language head/middle/tail terciles. The rank table is
    top-{_SRP_CAP} via TakeOrderedAndProject and broadcasts; the ntile
    is the q89 per-language window."""
    return textops.surprisal_buckets(
        load(spark, sf_dir, "documents", spread=True),
        rank_cap=_SRP_CAP,
        ref_mod=_SRP_MOD,
        n_tiles=_SRP_TILES,
    )
