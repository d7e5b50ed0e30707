"""Registry wave 13 (q141+) — time-series fill, robust statistics,
trend/drift detection, and corpus-balance operators:

- q141 dense-grid resample with zero-order-hold fill (the OpenTSDB
  downsample fill policy — emit EVERY slot, not just observed ones);
- q142 MAD-based robust outlier profile (the detector a single extreme
  value cannot mask, unlike stddev z-scores);
- q143 exact integer least-squares trend per group (metric drift).

Same portability rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics
from hbase_bulkload_service_spark.operators import tsdb as tsdb_ops
from hbase_bulkload_service_spark.oracle_frags import duck_zoh_grid_ctes
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load, load_events


# ===========================================================================
# q141 — dense-grid resample + zero-order-hold fill
# ===========================================================================


@register(
    "q141_grid_fill",
    f"""
    WITH {duck_zoh_grid_ctes(900_000)}
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(last_value(cents IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS filled,
           cents IS NOT NULL AS is_observed
    FROM j
    """,
)
def q141_grid_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 15-minute grid per event type with zero-order-hold fill:
    every slot between the series' first and last observation appears,
    gap slots carry the latest earlier value and is_observed=FALSE.
    Grid-sized state after the first exchange (tsdb.grid_fill)."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "event_id",
        "ts_ms",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return tsdb_ops.grid_fill(
        ev, series_col="event_type", ts_col="ts_ms",
        value_col="cents", id_col="event_id", step_ms=900_000,
    )


# ===========================================================================
# q142 — MAD robust outliers
# ===========================================================================


@register(
    "q142_mad_outliers",
    """
    WITH e AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    m AS (
      SELECT event_type, v, n,
             MAX(CASE WHEN rn <= (n + 1) // 2 THEN v END)
               OVER (PARTITION BY event_type) AS med
      FROM r
    ),
    d AS (SELECT event_type, n, med, ABS(v - med) AS dev FROM m),
    r2 AS (
      SELECT event_type, n, med, dev,
             row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn2
      FROM d
    ),
    m2 AS (
      SELECT event_type, n, med, dev,
             MAX(CASE WHEN rn2 <= (n + 1) // 2 THEN dev END)
               OVER (PARTITION BY event_type) AS mad
      FROM r2
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(med) AS BIGINT) AS med,
           CAST(MAX(mad) AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM m2 GROUP BY event_type
    """,
)
def q142_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier profile of the cents value per event
    type (|v - med| > 3*MAD, exact rank-selected medians). The
    stddev-proof complement of zscore_outliers — one extreme value
    inflates a stddev enough to mask itself; it barely moves the MAD."""
    e = load_events(spark, sf_dir, spread=True).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("v")
    )
    return analytics.mad_outliers(e, "event_type", "v", k=3)


# ===========================================================================
# q143 — exact per-group least-squares trend
# ===========================================================================


@register(
    "q143_group_trend",
    """
    WITH e AS (
      SELECT event_type, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT event_type, ts_ms // 3600000 AS x_hr, y FROM e),
    c AS (
      SELECT event_type,
             x_hr - MIN(x_hr) OVER (PARTITION BY event_type) AS xc,
             y
      FROM m
    ),
    a AS (
      SELECT event_type, COUNT(*) AS n, SUM(xc) AS sx, SUM(y) AS sy,
             SUM(xc * y) AS sxy, SUM(xc * xc) AS sxx
      FROM c GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den,
           CAST((n * sxy - sx * sy)
                // NULLIF((n * sxx - sx * sx) // 1000000, 0) AS BIGINT)
             AS slope_ppm
    FROM a
    """,
)
def q143_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each event type's value drifting over the month? Exact integer
    least-squares slope per type as a rational (num, den) plus a
    truncating ppm quotient — x is HOURS since the type's first event.
    Unit choice is the int64-overflow lever (moments grow as n^2·x·y;
    the 10x linearity probe OVERFLOWED the minutes-unit version —
    analytics.group_trend's docstring carries the caller bound)."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        F.expr("ts_ms div 3600000").alias("x_hr"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    return analytics.group_trend(ev, "event_type", "x_hr", "y")


# ===========================================================================
# q144 — hour-of-day seasonal profile
# ===========================================================================


@register(
    "q144_seasonal_profile",
    """
    WITH e AS (
      SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS slot,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    p AS (
      SELECT event_type, slot, COUNT(*) AS n, SUM(v) AS sum_v
      FROM e GROUP BY event_type, slot
    )
    SELECT event_type, CAST(slot AS BIGINT) AS slot,
           CAST(n AS BIGINT) AS n, CAST(sum_v AS BIGINT) AS sum_v,
           CAST((sum_v * 1000000 // n) //
                NULLIF(SUM(sum_v) OVER (PARTITION BY event_type) //
                       SUM(n) OVER (PARTITION BY event_type), 0)
                AS BIGINT) AS idx_ppm
    FROM p
    """,
)
def q144_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC hour-of-day baseline per event type: count, sum, and the
    seasonality index (slot mean / series mean, truncating integer ppm)
    — the profile anomaly detectors diff live traffic against. The
    exchange carries at most types x 24 rows (analytics.seasonal_profile)."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_type",
        "ts_ms",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return analytics.seasonal_profile(
        ev, key_col="event_type", ts_col="ts_ms", value_col="cents",
        period=24, slot_ms=3_600_000,
    )


# ===========================================================================
# q145 — deterministic class-balance resample (exact target per class)
# ===========================================================================

_TGT145 = 120
_SEED145 = 7


@register(
    "q145_balanced_oversample",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{_SEED145}' || ':' || CAST(doc_id AS VARCHAR)),
                        doc_id
             ) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    reps AS (
      SELECT doc_id, lang,
             {_TGT145} // n
               + CASE WHEN rk <= {_TGT145} % n THEN 1 ELSE 0 END AS nrep
      FROM r
    ),
    x AS (
      SELECT doc_id, lang, unnest(generate_series(1, CAST(nrep AS BIGINT)))
               AS rep
      FROM reps WHERE nrep >= 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(rep AS VARCHAR), ',' ORDER BY
                          CAST(doc_id AS VARCHAR) || ':'
                          || CAST(rep AS VARCHAR))) AS manifest_md5
    FROM x GROUP BY lang
    """,
)
def q145_balanced_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced resample of the corpus to exactly _TGT145=120 rows
    per language — minority langs replicate deterministically, the
    majority lang subsamples, same md5-draw formula both ways
    (curation.balanced_oversample). The manifest hash pins the exact
    replica MULTISET per class, not just its size."""
    from hbase_bulkload_service_spark.operators import curation

    docs = load(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang"
    )
    s = curation.balanced_oversample(
        docs, class_col="lang", key_col="doc_id",
        target=_TGT145, seed=_SEED145,
    )
    tagged = s.select(
        "lang",
        "doc_id",
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("rep").cast("string")
        ).alias("tag"),
    )
    return tagged.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("tag")), ",")
        ).alias("manifest_md5"),
    )


# ===========================================================================
# q146 — reciprocal-rank fusion of two ANN rankings (hybrid retrieval)
# ===========================================================================

from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    DUCK_QUANT_CTES,
    duck_cos_micros as _duck_cos_micros,
    duck_quant_score,
)

_K146_IN = 20  # depth of each input ranking
_K146_OUT = 10
_KRRF = 60


@register(
    "q146_rank_fusion",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id % 100 = 0
    ),
    sf AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_duck_cos_micros("q.qvec", "e.embedding")} AS sc
      FROM q, embeddings e WHERE e.vec_id <> q.query_id
    ),
    ra AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sc DESC, neighbor_id) AS rank
      FROM sf
    ),
    {DUCK_QUANT_CTES},
    q2 AS (SELECT vec_id AS query_id, qv AS qa, sc AS sa
           FROM qq WHERE vec_id % 100 = 0),
    s2 AS (
      SELECT q2.query_id, e.vec_id AS neighbor_id,
             {duck_quant_score("q2", "e")} AS sc
      FROM q2, qq e WHERE e.vec_id <> q2.query_id
    ),
    rb AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sc DESC, neighbor_id) AS rank
      FROM s2
    ),
    contrib AS (
      SELECT query_id, neighbor_id,
             1000000000 // ({_KRRF} + rank) AS c
      FROM ra WHERE rank <= {_K146_IN}
      UNION ALL
      SELECT query_id, neighbor_id, 1000000000 // ({_KRRF} + rank)
      FROM rb WHERE rank <= {_K146_IN}
    ),
    fused AS (
      SELECT query_id, neighbor_id, SUM(c) AS rrf_score,
             COUNT(*) AS n_lists
      FROM contrib GROUP BY query_id, neighbor_id
    )
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
           CAST(rrf_score AS BIGINT) AS rrf_score,
           CAST(n_lists AS BIGINT) AS n_lists
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, neighbor_id)
                  AS rank
      FROM fused
    ) WHERE rank <= {_K146_OUT}
    """,
)
def q146_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the float-cosine top-20 and the
    int8-quantized top-20 per query by reciprocal-rank fusion
    (similarity.rank_fusion, integer RRF so fused ORDER is
    oracle-exact) into a final top-10. The two searchers disagree
    exactly where quantization distorts the space — n_lists and the
    fused order make that disagreement measurable."""
    from hbase_bulkload_service_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    ra = similarity.brute_force_topk(emb, queries, k=_K146_IN)
    rb = similarity.quantized_topk(emb, k=_K146_IN, every=100)
    return similarity.rank_fusion(
        [ra, rb], k_rrf=_KRRF, k_out=_K146_OUT, scale=1_000_000_000
    )


# ===========================================================================
# q147 — embedding-distribution drift between snapshots (per label)
# ===========================================================================


@register(
    "q147_embedding_drift",
    """
    WITH h AS (
      SELECT label,
             CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
             embedding
      FROM embeddings
    ),
    x AS (
      SELECT label, side, CAST(i AS BIGINT) AS dim,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS vm
      FROM h, (SELECT unnest(range(1, 65)) AS i)
    ),
    pd AS (
      SELECT label, dim,
             SUM(CASE WHEN side = 'a' THEN vm END) AS sa,
             SUM(CASE WHEN side = 'b' THEN vm END) AS sb,
             COUNT(CASE WHEN side = 'a' THEN 1 END) AS na,
             COUNT(CASE WHEN side = 'b' THEN 1 END) AS nb
      FROM x GROUP BY label, dim
    ),
    d AS (
      SELECT label, na, nb,
             ABS(sa // NULLIF(na, 0) - sb // NULLIF(nb, 0)) AS dd
      FROM pd
    )
    SELECT label,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(SUM(dd) AS BIGINT) AS l1_micros,
           CAST(MAX(dd) AS BIGINT) AS linf_micros
    FROM d GROUP BY label
    """,
)
def q147_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the embedding space move between two snapshots? Per-label
    centroid L1/L-inf distance in exact integer micros between the
    even-id and odd-id halves of the embeddings table
    (similarity.centroid_drift) — the monitor that catches a retrained
    encoder or a zeroed field before ANN-recall evaluation spends for
    it. 100 TB of vectors reduce at the map-side combiner."""
    from hbase_bulkload_service_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        label_col="label",
        vec_col="embedding",
    )


# ===========================================================================
# q148 — fixed-bin histogram drift (population-stability report)
# ===========================================================================


@register(
    "q148_histogram_drift",
    """
    WITH t AS (
      SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    tagged AS (
      SELECT LEAST(GREATEST(v // 1000, 0), 59) AS bucket,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS ib
      FROM t
    ),
    pb AS (
      SELECT bucket, SUM(ia) AS n_a, SUM(ib) AS n_b
      FROM tagged GROUP BY bucket
    ),
    tot AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM pb)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_a * 1000000 // NULLIF(tot_a, 0) AS BIGINT) AS ppm_a,
           CAST(n_b * 1000000 // NULLIF(tot_b, 0) AS BIGINT) AS ppm_b,
           CAST(n_a * 1000000 // NULLIF(tot_a, 0)
                - n_b * 1000000 // NULLIF(tot_b, 0) AS BIGINT) AS delta_ppm,
           ABS(n_a * 1000000 // NULLIF(tot_a, 0)
               - n_b * 1000000 // NULLIF(tot_b, 0)) > 2000 AS flagged
    FROM pb, tot
    """,
)
def q148_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability report between the even- and odd-id halves
    of the events table: 60 fixed 10-unit cents bins, per-bin share in
    truncating ppm per side, delta, and a 2000-ppm drift flag
    (analytics.histogram_drift). Edge bins absorb out-of-range tails
    loudly instead of widening the domain silently."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_id", F.floor(F.col("value") * 100).cast("long").alias("v")
    )
    return analytics.histogram_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        value_col="v",
        lo=0,
        width=1000,
        n_buckets=60,
        flag_ppm=2000,
    )


# ===========================================================================
# q149 — fixed-round k-core peel over the fuzzy-linkage graph
# ===========================================================================

from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    FUZZY_EDGES_CTE as _FUZZY_EDGES_CTE,
)

_K149 = 27
_ROUNDS149 = 3


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    # SQL-unroll the fixed-round peel (same recipe as the q114/q118/q121
    # iterative oracles): eR = edges surviving R degree-filter rounds.
    parts = [f"e0 AS (SELECT x, y FROM e)"]
    for r in range(rounds):
        parts.append(
            f"""d{r} AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT x AS node FROM e{r}
                UNION ALL SELECT y AS node FROM e{r}
              ) GROUP BY node
            ),
            k{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
            e{r + 1} AS (
              SELECT e{r}.x, e{r}.y FROM e{r}
              JOIN k{r} ka ON ka.node = e{r}.x
              JOIN k{r} kb ON kb.node = e{r}.y
            )"""
        )
    return f"""
    WITH {_FUZZY_EDGES_CTE},
    {', '.join(parts)}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      SELECT x AS node FROM e{rounds}
      UNION ALL SELECT y AS node FROM e{rounds}
    ) GROUP BY node
    """


@register("q149_kcore", _kcore_unrolled_sql(_K149, _ROUNDS149))
def q149_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-region extraction: k-core peel (k=_K149=27, _ROUNDS149=3
    fixed rounds, graph.kcore_rounds) over the same fuzzy-linkage graph
    q113/q114 analyze — surviving nodes with their in-core degree.
    Pruning by degrees only (no pair enumeration); the oracle unrolls
    each peel round as chained CTEs."""
    from hbase_bulkload_service_spark.operators import dedup, graph

    cust = load(spark, sf_dir, "customer", spread=True)
    pairs = dedup.fuzzy_self_join_k1(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return graph.kcore_rounds(pairs, k=_K149, rounds=_ROUNDS149)


# ===========================================================================
# q150 — cogrouped two-stream merge alignment (cogroup applyInPandas)
# ===========================================================================


@register(
    "q150_stream_alignment",
    """
    WITH u AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
             CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS side
      FROM events
      WHERE event_type IN ('click', 'purchase') AND ts IS NOT NULL
    ),
    o AS (
      SELECT user_id, side, ts_ms, event_id,
             lag(side) OVER (PARTITION BY user_id
                             ORDER BY ts_ms, event_id) AS prev
      FROM u
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND side <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_switches,
           md5(string_agg(side, '' ORDER BY ts_ms, event_id)) AS seq_md5
    FROM o GROUP BY user_id
    """,
)
def q150_stream_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How do each user's click and purchase streams interleave? Merged
    (ts, id)-order side-sequence hash + switch count per user via
    COGROUPED applyInPandas (analytics.cogroup_merge_stats) — the gate
    that verifies the two-sided grouped-map plumbing against a
    first-principles SQL window oracle, so genuinely imperative per-key
    mergers can build on it."""
    ev = load_events(spark, sf_dir, spread=True).filter(
        F.col("ts_ms").isNotNull()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_ms", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "event_id"
    )
    return analytics.cogroup_merge_stats(
        clicks, purchases, key_col="user_id", ts_col="ts_ms",
        id_col="event_id",
    )
