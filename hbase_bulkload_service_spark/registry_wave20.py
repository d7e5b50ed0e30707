"""Registry wave 20 (round 6): tokenizer-budget analysis (q177 vocabulary
coverage), a genuinely-sequential stateful operator (q178 integer EWMA
control chart — applyInPandas vs a recursive-CTE oracle), and multimodal
shot segmentation (q179 scene cuts over the opaque payload), the EWMA
chart's streaming twin (q180, availableNow-replay-gated against the
same recursive-CTE oracle), residual-encoded IVFADC (q181), and
STL-lite seasonal decomposition (q182).

Integer-exact throughout: coverage is counts + a truncating ppm, the
EWMA recurrence is ``(e + x) div 2`` over nonneg cents (truncating and
flooring division agree), shot lumas are ``sum(bytes) div len``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, multimodal, textops
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q177 — top-V vocabulary coverage / per-doc OOV rate
# ===========================================================================

_VOCAB_V = 1000


@register(
    "q177_vocab_coverage",
    f"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS w FROM t),
    freq AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
    vocab AS MATERIALIZED (
      SELECT w FROM freq ORDER BY cnt DESC, w LIMIT {_VOCAB_V}
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS oov,
           CAST((SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(*) AS BIGINT) AS oov_ppm
    FROM tok LEFT JOIN vocab ON tok.w = vocab.w
    GROUP BY 1
    """,
)
def q177_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget analysis (operators/textops.py:vocab_coverage):
    the corpus's top-1000 words by frequency (deterministic tie-break)
    as the vocabulary, every document scored by its OOV rate against
    it. Plan: one word-keyed agg + a TakeOrderedAndProject V-cut; the
    V-row vocabulary broadcasts onto the token stream; the only other
    exchange is the doc rollup."""
    return textops.vocab_coverage(
        load(spark, sf_dir, "documents", spread=True), vocab_size=_VOCAB_V
    )


# ===========================================================================
# q178 — integer EWMA control chart (sequential recurrence; the canonical
# applyInPandas stateful operator, oracle-replayed as a recursive CTE)
# ===========================================================================

_EWMA_SPIKE = 2


@register(
    "q178_ewma_chart",
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
      SELECT user_id, event_id, rn, x, x AS e, CAST(0 AS BIGINT) AS spike
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, s.x,
             (r.e + s.x) // 2,
             CAST(CASE WHEN s.x > {_EWMA_SPIKE} * r.e THEN 1 ELSE 0 END
                  AS BIGINT)
      FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, rn, x AS x_cents,
           CAST(e AS BIGINT) AS ewma_cents, spike
    FROM r
    """,
)
def q178_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA control chart per user series
    (operators/analytics.py:ewma_control): E_1 = x_1,
    E_t = (E_(t-1) + x_t) div 2 over cents, spike where
    x_t > {_EWMA_SPIKE} * E_(t-1). The truncation in every step breaks
    any window/prefix-sum rewrite, so the engine side is the canonical
    Arrow-batched applyInPandas stateful loop (one keyed exchange, O(1)
    state per series) and the oracle replays the recurrence as a
    recursive CTE stepping rn -> rn+1 — a divergence at any step breaks
    every later row's hash."""
    return analytics.ewma_control(
        load_events(spark, sf_dir, spread=True), spike_factor=_EWMA_SPIKE
    )


# ===========================================================================
# q179 — multimodal shot segmentation (frame-luma cut detector)
# ===========================================================================

_SHOT_FRAME = 64
_SHOT_THRESH = 2


@register(
    "q179_scene_shots",
    f"""
    WITH v AS (
      SELECT doc_id, text, length(text) AS nb
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT doc_id, text, nb,
             unnest(range(0, CAST(ceil(nb / {_SHOT_FRAME}.0) AS BIGINT)))
               AS fi
      FROM v
    ),
    lm AS (
      SELECT doc_id, CAST(fi AS INT) AS frame_idx,
             CAST(list_aggregate(list_transform(
                    range(fi * {_SHOT_FRAME} + 1,
                          least(nb, fi * {_SHOT_FRAME} + {_SHOT_FRAME}) + 1),
                    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), 'sum')
                  // (least(nb, fi * {_SHOT_FRAME} + {_SHOT_FRAME})
                      - fi * {_SHOT_FRAME}) AS BIGINT) AS luma
      FROM fr
    ),
    mk AS (
      SELECT doc_id, frame_idx, luma,
             CASE WHEN abs(luma - lag(luma) OVER (
                    PARTITION BY doc_id ORDER BY frame_idx))
                    > {_SHOT_THRESH} THEN 1 ELSE 0 END AS cut
      FROM lm
    ),
    sh AS (
      SELECT doc_id, frame_idx, luma,
             CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS shot_id
      FROM mk
    )
    SELECT doc_id, shot_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MIN(frame_idx) AS INT) AS first_frame,
           CAST(MIN(luma) AS BIGINT) AS min_luma,
           CAST(MAX(luma) AS BIGINT) AS max_luma
    FROM sh GROUP BY 1, 2
    """,
)
def q179_scene_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal shot segmentation
    (operators/multimodal.py:scene_shots): 64-byte frames over the
    opaque video payloads, integer frame luma via numpy-over-Arrow,
    a cut where the luma jump exceeds {_SHOT_THRESH}, gaps-and-islands
    into shots. The oracle recomputes frame lumas from codepoints
    (the ASCII fixture makes payload bytes == codepoints, the q43
    device) and replays the lag + running-sum segmentation."""
    media = multimodal.attach_media(
        load(spark, sf_dir, "documents", spread=True)
    ).filter(F.col("media_type") == "video")
    return multimodal.scene_shots(
        media, frame_bytes=_SHOT_FRAME, threshold=_SHOT_THRESH
    )


# ===========================================================================
# q180 — q178 as a LIVE stream (availableNow replay inherits the batch
# oracle — the q137/q156 idiom)
# ===========================================================================

from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE  # noqa: E402


@register("q180_streaming_ewma", _ORACLE["q178_ewma_chart"])
def q180_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q178 as a LIVE stream (streaming/ops.streaming_ewma_chart): the
    EWMA register and series position live in applyInPandasWithState
    state — O(1) per series, watermark-free — and the recurrence is the
    same truncating integer arithmetic as the batch loop. Finite
    availableNow replay of the corpus must reproduce q178's
    recursive-CTE oracle bit-for-bit, so the streaming path inherits
    the batch gate (the q137/q156 idiom)."""
    import shutil
    import tempfile

    from hbase_bulkload_service_spark.registry import cents
    from hbase_bulkload_service_spark.streaming import ops as st

    ev = load_events(spark, sf_dir, spread=True).select(
        "user_id",
        "event_id",
        "ts_ms",
        cents(F.col("value")).alias("x_cents"),
    )
    d = tempfile.mkdtemp(prefix="q180ewma")
    try:
        # repartition(16), not coalesce: keeps the derive/encode at full
        # width and the 16 replay files keep the stream scan spread
        # (the q156 stage-audit lesson)
        ev.repartition(16).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(ev.schema).parquet(d)
        out = st.streaming_ewma_chart(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("q180_ewma_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        st.await_finite(q, 300)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table("q180_ewma_mem")


# ===========================================================================
# q182 — STL-lite seasonal decomposition (trend / seasonal / residual)
# ===========================================================================

_STL_K = 2
_STL_PERIOD = 24
_STL_SLOT = 3_600_000


_STL_CHAIN = f"""
    s AS (
      SELECT event_type, user_id, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS x
      FROM events
    ),
    t AS (
      SELECT event_type, user_id, event_id, ts_ms, x,
             CASE WHEN COUNT(*) OVER w = {2 * _STL_K + 1}
                  THEN CAST(SUM(x) OVER w // {2 * _STL_K + 1} AS BIGINT)
             END AS trend
      FROM s
      WINDOW w AS (PARTITION BY event_type, user_id
                   ORDER BY ts_ms, event_id
                   ROWS BETWEEN {_STL_K} PRECEDING AND {_STL_K} FOLLOWING)
    ),
    d AS (
      SELECT *, x - trend AS detr,
             (ts_ms // {_STL_SLOT}) % {_STL_PERIOD} AS phase
      FROM t
    ),
    se AS MATERIALIZED (
      SELECT *,
             CASE WHEN COUNT(detr) OVER wp > 0
                  THEN CAST(SUM(detr) OVER wp // COUNT(detr) OVER wp
                            AS BIGINT)
             END AS seasonal
      FROM d
      WINDOW wp AS (PARTITION BY event_type, user_id, phase)
    )"""


@register(
    "q182_stl_decompose",
    f"""
    WITH {_STL_CHAIN}
    SELECT event_type, user_id, event_id, ts_ms, phase,
           x AS x_cents, trend AS trend_cents, seasonal AS seasonal_cents,
           CAST(detr - seasonal AS BIGINT) AS resid_cents
    FROM se
    """,
)
def q182_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of every (event_type, user_id) series
    (operators/analytics.py:stl_decompose): centered 5-sample moving-
    average trend (NULL at edges — full windows only), per-(series,
    hour-of-day) seasonal mean of the detrended samples, residual =
    the rest. Truncating integer division throughout — Spark div and
    DuckDB // agree even on the negative detrended sums. Two keyed
    window exchanges, no joins."""
    return analytics.stl_decompose(load_events(spark, sf_dir, spread=True))


# ===========================================================================
# q181 — IVFADC proper: IVF-PQ with RESIDUAL encoding (Jegou et al. §V.A)
# ===========================================================================

_IVFADC_CELLS = 4
_IVFADC_M = 4
_IVFADC_K = 8
_IVFADC_NPROBE = 2
_IVFADC_NQ = 4
_IVFADC_TOPK = 5
_IVFADC_D = 16


@register(
    "q181_ivfadc_topk",
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
            ORDER BY 1 LIMIT {_IVFADC_CELLS})
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
    rvm AS MATERIALIZED (
      SELECT vm.vec_id, vm.pos, vm.x - g1.c AS x
      FROM vm JOIN cells USING (vec_id)
      JOIN g1 ON g1.cid = cells.cell AND g1.pos = vm.pos
    ),
    pvm AS MATERIALIZED (
      SELECT vec_id, CAST(pos // {_IVFADC_D} AS INT) AS sub,
             CAST(pos % {_IVFADC_D} AS INT) AS spos, x
      FROM rvm
    ),
    pids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings
            ORDER BY 1 LIMIT {_IVFADC_K})
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
            ORDER BY 1 LIMIT {_IVFADC_NQ})
    ),
    qcd AS (
      SELECT vm.vec_id AS qid, g1.cid AS cell,
             SUM((vm.x - g1.c) * (vm.x - g1.c)) AS d2
      FROM vm JOIN qids ON vm.vec_id = qids.qid
      JOIN g1 USING (pos) GROUP BY 1, 2
    ),
    probed AS MATERIALIZED (
      SELECT qid, cell FROM (
        SELECT qid, cell,
               row_number() OVER (PARTITION BY qid ORDER BY d2, cell) AS rn
        FROM qcd
      ) WHERE rn <= {_IVFADC_NPROBE}
    ),
    qres AS (
      SELECT probed.qid, probed.cell,
             CAST(vm.pos // {_IVFADC_D} AS INT) AS sub,
             CAST(vm.pos % {_IVFADC_D} AS INT) AS spos,
             vm.x - g1.c AS x
      FROM probed
      JOIN vm ON vm.vec_id = probed.qid
      JOIN g1 ON g1.cid = probed.cell AND g1.pos = vm.pos
    ),
    qd AS (
      SELECT qres.qid, qres.cell, p1.sub, p1.cid,
             SUM((qres.x - p1.c) * (qres.x - p1.c)) AS qd2
      FROM qres JOIN p1 ON qres.sub = p1.sub AND qres.spos = p1.spos
      GROUP BY 1, 2, 3, 4
    ),
    ad AS (
      SELECT probed.qid, codes.vec_id, cells.cell,
             CAST(SUM(qd.qd2) AS BIGINT) AS adist
      FROM codes
      JOIN cells USING (vec_id)
      JOIN probed ON probed.cell = cells.cell
      JOIN qd ON qd.qid = probed.qid AND qd.cell = cells.cell
             AND qd.sub = codes.sub AND qd.cid = codes.cid
      GROUP BY 1, 2, 3
    )
    SELECT qid, vec_id, cell, adist, rnk FROM (
      SELECT qid, vec_id, cell, adist,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adist, vec_id) AS rnk
      FROM ad
    ) WHERE rnk <= {_IVFADC_TOPK}
    """,
)
def q181_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper (operators/similarity.py:ivfpq_residual_topk):
    q175's IVF-PQ with RESIDUAL encoding — codebooks train on, and
    codes encode, vector − coarse centroid, and the ADC table is built
    per (query, probed cell) because the query residual differs per
    cell. The oracle extends q175's chain with the residual CTEs (rvm,
    qres) and the cell-aware ADC join, so a divergence in the residual
    arithmetic, either quantizer, or any per-cell lookup breaks the
    hash."""
    from hbase_bulkload_service_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.ivfpq_residual_topk(
        emb,
        n_cells=_IVFADC_CELLS,
        coarse_iters=1,
        m=_IVFADC_M,
        k=_IVFADC_K,
        pq_iters=1,
        nprobe=_IVFADC_NPROBE,
        n_queries=_IVFADC_NQ,
        topk=_IVFADC_TOPK,
    )


# ===========================================================================
# q183 — robust seasonal anomalies: STL residual vs per-series MAD
# ===========================================================================

_MAD_C = 3


@register(
    "q183_stl_anomalies",
    f"""
    WITH {_STL_CHAIN},
    f AS (
      SELECT event_type, user_id, event_id, ts_ms, x AS x_cents,
             CAST(detr - seasonal AS BIGINT) AS resid_cents
      FROM se WHERE detr IS NOT NULL AND seasonal IS NOT NULL
    ),
    r1 AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, user_id
                                ORDER BY resid_cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, user_id) AS n
      FROM f
    ),
    m1 AS (
      SELECT *,
             MAX(CASE WHEN rn = CAST(ceil(n / 2.0) AS INT)
                      THEN resid_cents END)
               OVER (PARTITION BY event_type, user_id) AS med_cents
      FROM r1
    ),
    d1 AS (SELECT *, abs(resid_cents - med_cents) AS dev FROM m1),
    r2 AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, user_id
                                ORDER BY dev, event_id) AS drn
      FROM d1
    ),
    m2 AS (
      SELECT *,
             MAX(CASE WHEN drn = CAST(ceil(n / 2.0) AS INT) THEN dev END)
               OVER (PARTITION BY event_type, user_id) AS mad_cents
      FROM r2
    )
    SELECT event_type, user_id, event_id, ts_ms, x_cents, resid_cents,
           CAST(med_cents AS BIGINT) AS med_cents,
           CAST(mad_cents AS BIGINT) AS mad_cents
    FROM m2 WHERE dev > {_MAD_C} * mad_cents
    """,
)
def q183_stl_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust seasonal anomaly detection
    (operators/analytics.py:stl_mad_anomalies): q182's residuals scored
    against their series' exact median/MAD,
    |resid - med| > {_MAD_C} x MAD, multiplied out — no division, no
    float. The median and MAD are PERCENTILE_DISC windows over the
    series partition (rank + count + max(case)), so the detector adds
    ONE series re-exchange to the two stl window exchanges and no
    joins. The composed-gate idiom (q139/q162): decomposition +
    threshold verified as one hash-exact unit."""
    return analytics.stl_mad_anomalies(
        load_events(spark, sf_dir, spread=True), c=_MAD_C
    )


# ===========================================================================
# q184 — Holt linear-trend forecast chart (two-register sequential
# recurrence; the forecasting member of the q178 family)
# ===========================================================================


@register(
    "q184_holt_forecast",
    """
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS x,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
               AS BIGINT) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, rn, x, x AS l, CAST(0 AS BIGINT) AS b,
             CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS e
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, s.x,
             (s.x + r.l + r.b) // 2,
             ((s.x + r.l + r.b) // 2 - r.l + r.b) // 2,
             r.l + r.b,
             s.x - (r.l + r.b)
      FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, rn, x AS x_cents,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(f AS BIGINT) AS forecast_cents,
           CAST(e AS BIGINT) AS err_cents
    FROM r
    """,
)
def q184_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Holt linear-trend chart per user series
    (operators/analytics.py:holt_forecast): level AND trend registers
    in the alpha=beta=1/2 integer form, emitting each sample's
    one-step-ahead forecast and error — the forecasting member of the
    control-chart family (q178 smooths, this predicts). The trend
    register goes negative on falling series, so the engine loop uses
    explicit truncate-toward-zero division to match Spark div / DuckDB
    // (Python's // floors — a one-character bug the oracle would
    catch on the first falling series). Recursive-CTE oracle steps
    rn -> rn+1 through both registers."""
    return analytics.holt_forecast(load_events(spark, sf_dir, spread=True))


# ===========================================================================
# q185 — hard-negative mining (contrastive-training pairs / label audit)
# ===========================================================================

from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    duck_cos_micros as _duck_cos,
)

_HN_THRESH = 350_000


@register(
    "q185_hard_negatives",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    s AS (
      SELECT e.vec_id, c.centroid_id,
             {_duck_cos("e.embedding", "c.cvec")} AS cm
      FROM embeddings e, c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cm DESC, centroid_id) AS rn
        FROM s
      ) WHERE rn = 1
    )
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ea.label AS label_a, eb.label AS label_b,
             {_duck_cos("ea.embedding", "eb.embedding")} AS cos_micros
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ) WHERE cos_micros >= {_HN_THRESH} AND label_a <> label_b
    """,
)
def q185_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py:hard_negative_pairs):
    IVF-cell-blocked pairs with cosine >= {_HN_THRESH} micros and
    DIFFERENT labels — the contrastive-training pair miner and
    label-noise audit, sharing q42's blocked candidate set (equi-join
    on cell, never O(n^2)); labels ride thin id-keyed joins onto the
    surviving pairs."""
    from hbase_bulkload_service_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.hard_negative_pairs(
        emb, _HN_THRESH, similarity.pseudo_centroids(emb)
    )


# ===========================================================================
# q186 — skew salting plan (profile -> plan -> execute closes with q120/q28)
# ===========================================================================

_SALT_TARGET = 32


@register(
    "q186_salt_plan",
    f"""
    SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
           CAST((cnt + {_SALT_TARGET} - 1) // {_SALT_TARGET} AS BIGINT)
             AS salt_factor
    FROM (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1)
    WHERE cnt > {_SALT_TARGET}
    """,
)
def q186_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew salting plan (operators/analytics.py:salt_plan): keys of the
    busiest join axis whose row count exceeds {_SALT_TARGET}, each with
    the ceil-division salt factor a targeted salted join (q28) should
    spread it over — q120 diagnoses, this plans, q28 executes. One
    map-side-combined keyed agg; the plan is skewed-keys-sized and
    broadcastable."""
    return analytics.salt_plan(
        load_events(spark, sf_dir, spread=True), "user_id",
        target_rows=_SALT_TARGET,
    )


# ===========================================================================
# q187 / q188 — privacy & governance: k-anonymity audit, forget plan
# ===========================================================================

_KANON_K = 5
_KANON_BAL = 2000
_FORGET_MOD = 37


@register(
    "q187_k_anonymity",
    f"""
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           CAST(group_n AS BIGINT) AS group_n
    FROM (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {_KANON_BAL}) AS BIGINT) AS bal_bucket,
             COUNT(*) AS group_n
      FROM customer GROUP BY 1, 2, 3
    ) WHERE group_n < {_KANON_K}
    """,
)
def q187_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk audit (operators/quality.py:k_anonymity_audit):
    every (nation, market segment, balance-bucket) equivalence class
    with fewer than {_KANON_K} members — the indirect-identifier
    release gate complementing q58's direct-identifier scrub. One
    map-side-combined keyed agg filtered to the risky tail."""
    from hbase_bulkload_service_spark.operators import quality

    cust = load(spark, sf_dir, "customer")
    return quality.k_anonymity_audit(
        cust.withColumn(
            "bal_bucket",
            F.floor(F.col("c_acctbal") / _KANON_BAL).cast("long"),
        ).select("c_nationkey", "c_mktsegment", "bal_bucket"),
        ["c_nationkey", "c_mktsegment", "bal_bucket"],
        k=_KANON_K,
    )


@register(
    "q188_forget_plan",
    f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT epoch_ms(ts) // 300000) AS BIGINT)
             AS n_rollup_slots,
           CAST(MIN(epoch_ms(ts)) AS BIGINT) AS first_ts,
           CAST(MAX(epoch_ms(ts)) AS BIGINT) AS last_ts
    FROM events WHERE user_id % {_FORGET_MOD} = 0
    GROUP BY 1
    """,
)
def q188_forget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten work order
    (operators/quality.py:forget_plan): per deletion-cohort user, the
    raw row count, the derived 5-minute rollup slots that must be
    recomputed, and the affected time span (the regions to rewrite).
    Cohort predicate prunes at the scan; one keyed agg, cohort-sized
    output."""
    from hbase_bulkload_service_spark.operators import quality

    ev = load_events(spark, sf_dir, spread=True)
    return quality.forget_plan(
        ev, F.col("user_id") % _FORGET_MOD == 0
    )


# ===========================================================================
# q189 / q190 — compute governance + eval hygiene: join-size estimate,
# split-leakage audit
# ===========================================================================

_JSE_TOP = 10
_LEAK_MOD = 10


@register(
    "q189_join_size_estimate",
    f"""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt, COUNT(*) * COUNT(*) AS pairs
      FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(pairs) AS total FROM counts)
    SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(pairs AS BIGINT) AS pairs,
           CAST((pairs * 1000000) // tot.total AS BIGINT) AS share_ppm
    FROM counts, tot
    ORDER BY pairs DESC, user_id LIMIT {_JSE_TOP}
    """,
)
def q189_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality pricing
    (operators/analytics.py:join_size_estimate): the exact self-join
    output size per key (cnt^2) from the collapsed count table, top-10
    contributors with their share — priced WITHOUT running the join.
    Completes the skew triptych: q120 diagnoses, q189 prices, q186
    prescribes, the q28 salted join executes."""
    from hbase_bulkload_service_spark.operators import analytics

    return analytics.join_size_estimate(
        load_events(spark, sf_dir, spread=True), "user_id", top_n=_JSE_TOP
    )


from hbase_bulkload_service_spark.registry_llm import (  # noqa: E402
    SHINGLES_CTE as _SHINGLES_CTE,
    _BANDS_SQL,
    _SIG_COLS,
)

_LEAK_SPLIT_A = (
    f"CASE WHEN ('0x' || substr(md5('s:' || CAST(i.doc_a AS VARCHAR)), 1, 8))"
    f"::BIGINT % {_LEAK_MOD} = 0 THEN 'test' ELSE 'train' END"
)
_LEAK_SPLIT_B = (
    f"CASE WHEN ('0x' || substr(md5('s:' || CAST(i.doc_b AS VARCHAR)), 1, 8))"
    f"::BIGINT % {_LEAK_MOD} = 0 THEN 'test' ELSE 'train' END"
)


@register(
    "q190_split_leakage",
    f"""
    WITH {_SHINGLES_CTE},
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
    )
    SELECT * FROM (
      SELECT i.doc_a, i.doc_b,
             {_LEAK_SPLIT_A} AS split_a,
             {_LEAK_SPLIT_B} AS split_b,
             i.inter, (za.n + zb.n - i.inter) AS union_n,
             i.inter * 1.0 / (za.n + zb.n - i.inter) AS jaccard
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE i.inter * 1.0 / (za.n + zb.n - i.inter) >= 0.5
    ) WHERE split_a <> split_b
    """,
)
def q190_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split-leakage audit
    (operators/dedup.py:split_leakage): verified near-dup pairs
    (q35's banded-LSH + exact-Jaccard path) whose deterministic hash
    split labels differ — the eval-hygiene gate a benchmark release
    runs (a test doc with a train near-twin inflates every score).
    Split labels are computed map-side on the surviving pairs; empty
    is the healthy state, and the synthetic corpus leaks 4 pairs at
    sf0.01 so both branches are live."""
    from hbase_bulkload_service_spark.operators import dedup as _dedup

    return _dedup.split_leakage(
        load(spark, sf_dir, "documents", spread=True), test_mod=_LEAK_MOD
    )
