"""Registry wave 20 (round 6): tokenizer-budget analysis (q177 vocabulary
coverage), a genuinely-sequential stateful operator (q178 integer EWMA
control chart — applyInPandas vs a recursive-CTE oracle), and multimodal
shot segmentation (q179 scene cuts over the opaque payload), plus the
EWMA chart's streaming twin (q180, availableNow-replay-gated against
the same recursive-CTE oracle).

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
