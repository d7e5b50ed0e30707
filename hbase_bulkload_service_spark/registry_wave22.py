"""Registry wave 22 (round 6, session 3): data-mixture optimization and
release gates — DoReMi-lite multiplicative-weights domain reweighting
(q195), the token-blocklist audit (q196), and the embedding-table
health report (q197).

q195 is this wave's iterative-algorithm gate (the q110/q118 class): three
multiplicative-weights rounds unrolled as chained MATERIALIZED CTEs, each
round's mixture average feeding the next round's excess-loss signal, with
a largest-remainder ppm renormalization every round so a one-ulp
divergence anywhere breaks the final hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation, similarity, textops
from hbase_bulkload_service_spark.oracle_frags import duck_dot as _dot
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q195 — DoReMi-lite domain reweighting (multiplicative weights, 3 rounds)
# ===========================================================================

_DRM_ROUNDS = 3
_DRM_V = 5
_DRM_SCALE = 1_000_000


def _drm_round_ctes(t: int) -> str:
    """One multiplicative-weights round: update vs the CURRENT mixture
    average, then largest-remainder renormalize back to ppm."""
    prev = f"w{t - 1}_ppm"
    carry = ", ".join(f"w{i}_ppm" for i in range(t))
    return f"""
    u{t} AS (
      SELECT source, loss, {carry},
             ({prev} * ({_DRM_SCALE} + greatest(
                loss - (SUM({prev} * loss) OVER ()) // 1000000, 0)))
               // {_DRM_SCALE} AS raw
      FROM r{t - 1}
    ),
    b{t} AS (
      SELECT source, loss, {carry},
             (1000000 * raw) // SUM(raw) OVER () AS bse,
             (1000000 * raw) % SUM(raw) OVER () AS rem
      FROM u{t}
    ),
    r{t} AS MATERIALIZED (
      SELECT source, loss, {carry},
             CAST(bse + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                              <= 1000000 - SUM(bse) OVER ()
                         THEN 1 ELSE 0 END AS BIGINT) AS w{t}_ppm
      FROM b{t}
    )"""


@register(
    "q195_doremi_mix",
    f"""
    WITH t AS (
      SELECT source,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS ws
      FROM documents
    ),
    tok AS (SELECT source, unnest(ws) AS w FROM t),
    vocab AS MATERIALIZED (
      SELECT w FROM (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1
                     ORDER BY cnt DESC, w LIMIT {_DRM_V})
    ),
    loss AS MATERIALIZED (
      SELECT tok.source,
             (SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) * 1000000)
               // COUNT(*) AS loss
      FROM tok LEFT JOIN vocab ON tok.w = vocab.w GROUP BY 1
    ),
    b0 AS (
      SELECT source, loss,
             1000000 // COUNT(*) OVER () AS bse,
             1000000 % COUNT(*) OVER () AS rem
      FROM loss
    ),
    r0 AS MATERIALIZED (
      SELECT source, loss,
             CAST(bse + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                              <= 1000000 - SUM(bse) OVER ()
                         THEN 1 ELSE 0 END AS BIGINT) AS w0_ppm
      FROM b0
    ),{",".join(_drm_round_ctes(t) for t in range(1, _DRM_ROUNDS + 1))}
    SELECT source, CAST(loss AS BIGINT) AS loss,
           {", ".join(f"w{t}_ppm" for t in range(_DRM_ROUNDS + 1))}
    FROM r{_DRM_ROUNDS}
    """,
)
def q195_doremi_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite mixture optimization
    (operators/curation.py:doremi_weights, after Xie et al. 2023):
    {_DRM_ROUNDS} multiplicative-weights rounds over the source axis,
    each upweighting domains whose proxy loss (mean OOV-ppm against the
    corpus top-{_DRM_V} vocabulary) exceeds the CURRENT mixture's
    weighted average — so every round depends on the last — with a
    largest-remainder ppm renormalization per round (weights sum to
    exactly 1e6 every round). One corpus pass builds the loss table;
    every round is window arithmetic on the |sources|-row relation."""
    return curation.doremi_weights(
        load(spark, sf_dir, "documents", spread=True),
        rounds=_DRM_ROUNDS,
        vocab_size=_DRM_V,
        scale=_DRM_SCALE,
    )


# ===========================================================================
# q196 — token-blocklist release gate (C4 badwords audit)
# ===========================================================================

_BL_LIST = {"slow": 3, "dirty": 5, "big": 1}
_BL_THRESH = 8

_BL_SEV_SQL = (
    "CASE w WHEN 'big' THEN 1 WHEN 'dirty' THEN 5 WHEN 'slow' THEN 3 END"
)


@register(
    "q196_blocklist_audit",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS ws
      FROM documents
    ),
    tok AS (SELECT doc_id, source, unnest(ws) AS w FROM t),
    per_doc AS (
      SELECT doc_id, source, SUM({_BL_SEV_SQL}) AS score
      FROM tok WHERE {_BL_SEV_SQL} IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    viol AS (
      SELECT source,
             SUM(CASE WHEN score >= {_BL_THRESH} THEN 1 ELSE 0 END)
               AS flagged_docs,
             SUM(score) AS total_score
      FROM per_doc GROUP BY 1
    )
    SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(v.flagged_docs, 0) AS BIGINT) AS flagged_docs,
           CAST(COALESCE(v.total_score, 0) AS BIGINT) AS total_score,
           CAST(COALESCE(v.flagged_docs, 0) * 1000000 // t.n_docs AS BIGINT)
             AS flagged_ppm
    FROM totals t LEFT JOIN viol v USING (source)
    """,
)
def q196_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-blocklist release gate
    (operators/textops.py:blocklist_audit, the C4 badwords filter as an
    auditable per-source report): severity-weighted blocklisted-token
    scores per document, docs at score >= {_BL_THRESH} flagged, rolled
    up per source with flagged-ppm — blocklist policy is enforced per
    corpus slice. The blocklist broadcasts onto the token stream
    ('dirty' never occurs — the miss path stays live); raw text never
    shuffles."""
    return textops.blocklist_audit(
        load(spark, sf_dir, "documents"),
        blocklist=_BL_LIST,
        flag_threshold=_BL_THRESH,
    )


# ===========================================================================
# q197 — embedding-table health audit
# ===========================================================================

_EH_LOW = 500_000


@register(
    "q197_embedding_health",
    f"""
    WITH m AS (
      SELECT label,
             CAST(FLOOR(sqrt({_dot("embedding", "embedding")}) * 1000000)
                  AS BIGINT) AS nm,
             CASE WHEN list_max(embedding) = list_min(embedding)
                  THEN 1 ELSE 0 END AS cnst
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN nm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_norm,
           CAST(SUM(CASE WHEN nm > 0 AND nm < {_EH_LOW} THEN 1 ELSE 0 END)
                AS BIGINT) AS low_norm,
           CAST(SUM(cnst) AS BIGINT) AS const_dims,
           CAST(MIN(nm) AS BIGINT) AS min_norm_micros,
           CAST(MAX(nm) AS BIGINT) AS max_norm_micros,
           CAST(SUM(nm) // COUNT(*) AS BIGINT) AS mean_norm_micros
    FROM m GROUP BY 1
    """,
)
def q197_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table health audit
    (operators/similarity.py:embedding_health): per label cohort, the
    degenerate-vector census (zero-norm, low-norm below {_EH_LOW}
    micros, constant-across-dims) and the norm spread
    (min/max/truncating-mean micros) — the gate an index build runs
    before trusting a batch of vectors. One scan, map-side fold math,
    one keyed agg; |labels| output rows."""
    return similarity.embedding_health(
        load(spark, sf_dir, "embeddings"), low_norm_micros=_EH_LOW
    )
