"""Registry wave 29 (round 6, session 4 tail): the quality-filter
calibration trio — q218 integer Flesch readability, q219 per-language
exact-percentile length floors, q220 quality-weighted soft sampling
(the CCNet-style keep-with-probability-equal-to-quality device).
These land OUTSIDE the round-6 driver window (50-slot cap, already
full); they are round-7 window leaders, fully verified this round via
the vanilla-session driver-protocol sweep + the selfcheck replica +
the TZ sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.operators import curation, textops
from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import NT
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q218 — integer Flesch readability twin
# ===========================================================================

_RD_HARD = 30000  # milli-score; sf0.01 span -20973..96097, median ~29k


@register(
    "q218_readability",
    f"""
    WITH t AS (
      SELECT doc_id, {NT} AS nt FROM documents WHERE length({NT}) > 0
    ),
    f AS (
      SELECT doc_id,
             CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_words,
             CAST(GREATEST(1, len(regexp_extract_all(nt, '[.!?]+')))
                  AS BIGINT) AS n_sentences,
             CAST(GREATEST(1, len(regexp_extract_all(nt, '[aeiouy]+')))
                  AS BIGINT) AS n_syllables
      FROM t
    ),
    s AS (
      SELECT doc_id, n_words, n_sentences, n_syllables,
             n_words * 1000 // n_sentences AS wps_milli,
             n_syllables * 1000 // n_words AS spw_milli
      FROM f
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(wps_milli AS BIGINT) AS wps_milli,
           CAST(spw_milli AS BIGINT) AS spw_milli,
           CAST(206835 - (1015 * wps_milli) // 1000
                       - (84600 * spw_milli) // 1000 AS BIGINT)
             AS flesch_milli,
           206835 - (1015 * wps_milli) // 1000
                  - (84600 * spw_milli) // 1000 < {_RD_HARD}
             AS hard_to_read
    FROM s
    """,
)
def q218_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Flesch reading-ease twin
    (operators/textops.py:readability_scores): words, sentence runs,
    vowel-run syllables, and the classic score in truncating milli —
    the readability feature of C4-class quality filter sets, exact and
    float-free. Pure map-side census, zero shuffle ({_RD_HARD} milli
    flags the measured lower half of the synthetic corpus, so both
    branches are live)."""
    return textops.readability_scores(
        load(spark, sf_dir, "documents", spread=True), hard_milli=_RD_HARD
    )


# ===========================================================================
# q219 — per-language exact-percentile length floor
# ===========================================================================

_LF_Q = 250  # permille -> exact p25 by rank


@register(
    "q219_length_floor",
    f"""
    WITH b AS (
      SELECT doc_id, lang AS g,
             CAST(len(string_split({NT}, ' ')) AS BIGINT) AS n_words
      FROM documents
    ),
    r AS (
      SELECT g, doc_id, n_words,
             row_number() OVER (PARTITION BY g ORDER BY n_words, doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM b
    ),
    fl AS (
      SELECT g, n_words AS p_words FROM r
      WHERE rn = (n * {_LF_Q} + 999) // 1000
    )
    SELECT r.g AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(fl.p_words AS BIGINT) AS p_words,
           CAST(SUM(CASE WHEN r.n_words < fl.p_words THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN r.n_words < fl.p_words THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS flagged_ppm
    FROM r JOIN fl USING (g)
    GROUP BY r.g, fl.p_words
    """,
)
def q219_length_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language calibrated length gate
    (operators/textops.py:calibrated_length_floor): the exact p{_LF_Q}‰
    word-count percentile WITHIN each language (PERCENTILE_DISC by
    rank — value at ceil(q·n) in (words, doc_id) order) and how many of
    the stratum's docs sit under their own floor — the per-language
    calibration that replaces the global length cutoff which
    over-drops terse languages. One stratum-keyed rank window; the
    |langs|-row floor table broadcasts back."""
    return textops.calibrated_length_floor(
        load(spark, sf_dir, "documents", spread=True), q_permille=_LF_Q
    )


# ===========================================================================
# q220 — quality-weighted soft sampling
# ===========================================================================


@register(
    "q220_soft_sampling",
    f"""
    WITH g AS ({_ORACLE["q212_char_diversity"]}),
    s AS (
      SELECT d.source, g.gini_ppm,
             CASE WHEN ('0x' || substr(md5('q:' || CAST(d.doc_id AS
                   VARCHAR)), 1, 8))::BIGINT % 1000000 < g.gini_ppm
                  THEN 1 ELSE 0 END AS kept
      FROM g JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept) * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm,
           CAST(SUM(gini_ppm) // COUNT(*) AS BIGINT) AS mean_quality_ppm
    FROM s GROUP BY 1
    """,
)
def q220_soft_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted soft sampling
    (operators/curation.py:soft_quality_sample): keep each doc with
    probability equal to its q212 quality score via the deterministic
    md5 gate ``bucket('q:' ‖ doc_id) < quality_ppm`` — the CCNet-style
    soft filter that preserves a quality GRADIENT instead of a hard
    cutoff, engine-portable and retry-stable where rand() is neither.
    Per-source kept_ppm lands near mean_quality_ppm by construction —
    the audit column the oracle pins exactly. The oracle nests q212's
    full oracle so the score and the sampler cannot drift."""
    return curation.soft_quality_sample(
        load(spark, sf_dir, "documents", spread=True)
    )
