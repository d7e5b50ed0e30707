"""Registry wave 23 (round 6, session 3): catalog, governance, and
multimodal planning — the ANALYZE-style table profiler (q198), the
cross-source duplication matrix (q199), and the audio silence-trim
plan (q200).

q198 canonicalizes every column to an engine-portable string BEFORE the
profile (integers as decimals, doubles as floor-cents, timestamps as
epoch millis — the registry conventions) because raw float/timestamp
formatting differs between engines and would poison the min/max verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.functions.codec import epoch_millis
from hbase_bulkload_service_spark.operators import dedup, multimodal, quality
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q198 — ANALYZE-style table profile (catalog statistics pass)
# ===========================================================================

_PRF_INT = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
_PRF_CENTS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PRF_STR = ["l_returnflag", "l_linestatus"]

def lineitem_canon(li: DataFrame) -> dict[str, F.Column]:
    """Canonical string-able expressions for every lineitem column
    (shared by q198's exact profile and q202's sketch profile)."""
    canon = {c: F.col(c) for c in _PRF_INT + _PRF_STR}
    canon.update(
        {c: F.floor(F.col(c) * 100).cast("long") for c in _PRF_CENTS}
    )
    canon["l_shipdate"] = epoch_millis(li, "l_shipdate")
    return canon


_PRF_MELT = " UNION ALL ".join(
    [
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM lineitem"
        for c in _PRF_INT
    ]
    + [
        f"SELECT '{c}', CAST(CAST(FLOOR({c} * 100) AS BIGINT) AS VARCHAR) "
        "FROM lineitem"
        for c in _PRF_CENTS
    ]
    + [f"SELECT '{c}', {c} FROM lineitem" for c in _PRF_STR]
    + [
        "SELECT 'l_shipdate', CAST(epoch_ms(l_shipdate) AS VARCHAR) "
        "FROM lineitem"
    ]
)


@register(
    "q198_table_profile",
    f"""
    WITH m AS ({_PRF_MELT})
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS null_ppm
    FROM m GROUP BY 1
    """,
)
def q198_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profiler (operators/quality.py:column_profile)
    over all 11 lineitem columns: per column, row/null counts, EXACT
    distinct count, lexicographic min/max of the canonical string form
    (ints as decimals, doubles as floor-cents, l_shipdate as epoch
    millis). One pass: the melt is map-side, the exact-NDV shuffle is
    bounded by a (col, val) pre-agg (per-column cardinality, not row
    count), output is catalog-sized."""
    li = load(spark, sf_dir, "lineitem", spread=True)
    return quality.column_profile(li, lineitem_canon(li))


# ===========================================================================
# q199 — cross-source duplication matrix
# ===========================================================================


@register(
    "q199_dup_matrix",
    # rides q35's exact chain (registry_llm fragments) + source joins
    None,  # filled below after the fragment import
)
def q199_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix
    (operators/dedup.py:dup_source_matrix): near-dup pair counts per
    unordered source pair — the "which crawls copy which" governance
    report (q155 scores sources in isolation; this exposes the
    between-source structure, and the diagonal is internal
    redundancy). Rides q35's banded-LSH + exact-Jaccard path; source
    labels join the surviving pairs only; |sources|^2-bounded
    output."""
    return dedup.dup_source_matrix(
        load(spark, sf_dir, "documents", spread=True), threshold=0.5
    )


from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE  # noqa: E402
from hbase_bulkload_service_spark.registry_llm import (  # noqa: E402
    SHINGLES_CTE as _SH,
    _BANDS_SQL,
    _SIG_COLS,
)

_ORACLE["q199_dup_matrix"] = f"""
    WITH {_SH},
    sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
    bk AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE i.inter * 1.0 / (za.n + zb.n - i.inter) >= 0.5
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = pairs.doc_a
    JOIN documents db ON db.doc_id = pairs.doc_b
    GROUP BY 1, 2
    """


# ===========================================================================
# q200 — audio silence-trim plan
# ===========================================================================

_TRIM_FRAME = 64
_TRIM_THRESH = 95


@register(
    "q200_audio_trim",
    f"""
    WITH v AS (
      SELECT doc_id, text, length(text) AS nb
      FROM documents WHERE doc_id % 3 = 1
    ),
    fr AS (
      SELECT doc_id, text, nb,
             unnest(range(0, CAST(ceil(nb / {_TRIM_FRAME}.0) AS BIGINT)))
               AS fi
      FROM v
    ),
    lm AS (
      SELECT doc_id, CAST(fi AS INT) AS frame_idx,
             CAST(list_aggregate(list_transform(
                    range(fi * {_TRIM_FRAME} + 1,
                          least(nb, fi * {_TRIM_FRAME} + {_TRIM_FRAME}) + 1),
                    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), 'sum')
                  // (least(nb, fi * {_TRIM_FRAME} + {_TRIM_FRAME})
                      - fi * {_TRIM_FRAME}) AS BIGINT) AS luma
      FROM fr
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_frames,
             MIN(CASE WHEN luma >= {_TRIM_THRESH} THEN frame_idx END) AS fi,
             MAX(CASE WHEN luma >= {_TRIM_THRESH} THEN frame_idx END) AS la,
             MAX(luma) AS max_energy
      FROM lm GROUP BY 1
    )
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(COALESCE(fi, n_frames) AS INT) AS lead_trim,
           CAST(CASE WHEN fi IS NULL THEN 0
                     ELSE n_frames - 1 - la END AS INT) AS tail_trim,
           CAST(n_frames - COALESCE(fi, n_frames)
                - (CASE WHEN fi IS NULL THEN 0 ELSE n_frames - 1 - la END)
                AS INT) AS kept_frames,
           CAST(max_energy AS BIGINT) AS max_energy
    FROM agg
    """,
)
def q200_audio_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence-trim planning
    (operators/multimodal.py:audio_trim_plan): per audio clip, the
    leading/trailing frames below energy {_TRIM_THRESH} and the
    surviving span — the lead-in/lead-out removal pass before feature
    extraction, emitted as a PLAN (offsets), not rewritten payloads.
    Frame energies are the integer mean-byte kernel (numpy over Arrow,
    the q179 device); the plan is ONE doc-keyed agg — min/max active
    frame index gives lead/tail/kept arithmetically, no windows. The
    oracle recomputes energies from codepoints (ASCII fixture)."""
    media = multimodal.attach_media(
        load(spark, sf_dir, "documents", spread=True)
    )
    return multimodal.audio_trim_plan(
        media, frame_bytes=_TRIM_FRAME, threshold=_TRIM_THRESH
    )
