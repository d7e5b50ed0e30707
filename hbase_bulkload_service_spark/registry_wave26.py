"""Registry wave 26 (round 6, session 3): the seasonal member closing
the forecasting family (q207 Holt-Winters, whose recursive-CTE oracle
carries the seasonal register as a LIST column), the language-ID
confusion matrix (q208 — classifier eval at scale), and the exact A/B
guardrail comparison (q209 — experimentation readout by
cross-multiplication, no float rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, textops
from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q207 — integer Holt-Winters additive-seasonal forecast chart
# ===========================================================================

_HW_P = 4

# the seasonal slot this step reads/updates (1-indexed into the list)
_HW_SP = f"list_extract(r.sl, CAST((s.rn - 1) % {_HW_P} AS INT) + 1)"
_HW_L2 = f"((s.x - {_HW_SP} + r.l + r.b) // 2)"
_HW_B2 = f"(({_HW_L2} - r.l + r.b) // 2)"
_HW_S2 = (
    f"list_transform(range(1, {_HW_P + 1}), "
    f"i -> CASE WHEN i = CAST((s.rn - 1) % {_HW_P} AS INT) + 1 "
    f"THEN ((s.x - {_HW_L2} + list_extract(r.sl, i)) // 2) "
    f"ELSE list_extract(r.sl, i) END)"
)
_HW_F = f"(r.l + r.b + {_HW_SP})"
_HW_ZEROS = "[" + ", ".join(["CAST(0 AS BIGINT)"] * _HW_P) + "]"


@register(
    "q207_holt_winters",
    f"""
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS x,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
               AS BIGINT) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, rn, x,
             CAST(0 AS INT) AS phase,
             x AS l, CAST(0 AS BIGINT) AS b,
             {_HW_ZEROS} AS sl,
             CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS e
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, s.x,
             CAST((s.rn - 1) % {_HW_P} AS INT),
             {_HW_L2}, {_HW_B2}, {_HW_S2},
             {_HW_F}, s.x - {_HW_F}
      FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, rn, phase, x AS x_cents,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(list_extract(sl, phase + 1) AS BIGINT) AS seasonal_cents,
           CAST(f AS BIGINT) AS forecast_cents,
           CAST(e AS BIGINT) AS err_cents
    FROM r
    """,
)
def q207_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Holt-Winters additive-seasonal chart per user series
    (operators/analytics.py:holt_winters_forecast): level + trend +
    {_HW_P}-slot seasonal register in the alpha=beta=gamma=1/2 integer
    form, emitting each sample's one-step-ahead forecast and error —
    the seasonal member closing the q178/q184 family. All three
    registers go negative on real series, so the loop divides with the
    explicit truncate-toward-zero helper. The recursive-CTE oracle
    carries the seasonal register as a LIST column rebuilt functionally
    each step — a one-ulp divergence in any register at any step breaks
    every later hash."""
    return analytics.holt_winters_forecast(
        load_events(spark, sf_dir, spread=True), period=_HW_P
    )


# ===========================================================================
# q208 — language-ID confusion matrix (classifier eval)
# ===========================================================================


@register(
    "q208_lang_confusion",
    f"""
    WITH pred AS ({_ORACLE["q32_lang_id"]}),
    cells AS (
      SELECT d.lang, p.pred_lang, COUNT(*) AS n
      FROM pred p JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    )
    SELECT lang, pred_lang, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT)
             AS share_ppm
    FROM cells
    """,
)
def q208_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix
    (operators/textops.py:lang_confusion): q32's n-gram predictions
    against the labeled language, per (label, predicted) cell with the
    label-row share in ppm — the diagonal is per-language recall, the
    off-diagonals say which languages the heuristic confuses. The
    oracle nests q32's full oracle as a CTE, so the eval gate and the
    predictor gate can never drift apart."""
    return textops.lang_confusion(
        load(spark, sf_dir, "documents", spread=True)
    )


# ===========================================================================
# q209 — exact A/B guardrail comparison (cross-multiplied, no float rates)
# ===========================================================================

_AB_THRESH = 75


@register(
    "q209_ab_guardrail",
    f"""
    WITH a AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 = 0 AS armb,
             CASE WHEN value > {_AB_THRESH} THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    g AS (
      SELECT event_type,
             SUM(CASE WHEN NOT armb THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN NOT armb THEN hit ELSE 0 END) AS hits_a,
             SUM(CASE WHEN armb THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN armb THEN hit ELSE 0 END) AS hits_b
      FROM a GROUP BY 1
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(hits_a AS BIGINT) AS hits_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(hits_b AS BIGINT) AS hits_b,
           hits_b * n_a > hits_a * n_b AS b_worse,
           CAST((hits_b * n_a * 1000000) // nullif(hits_a * n_b, 0)
                AS BIGINT) AS lift_ppm
    FROM g
    """,
)
def q209_ab_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact A/B guardrail comparison
    (operators/analytics.py:ab_guardrail): units md5-split into arms,
    per event_type the arms' guardrail hit rates (value > {_AB_THRESH})
    compared by CROSS-MULTIPLICATION — hits_b*n_a vs hits_a*n_b, pure
    integers, no float rate ever computed — plus the exact truncating
    rate ratio in ppm. Arm assignment is map-side; one
    segment-keyed agg."""
    ev = load_events(spark, sf_dir, spread=True)
    return analytics.ab_guardrail(
        ev, F.col("value") > _AB_THRESH
    )
