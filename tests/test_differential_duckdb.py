"""Differential testing against DuckDB on ADVERSARIAL random inputs.

The per-query oracle gates run on the fixed testdata fixtures, which are
NULL-free and value-tame — so the cross-engine contracts the operators
claim (NULL exclusion, truncating division on negatives, clamp edges,
unicode normalization) are never exercised by the gate itself. Each test
here hypothesis-generates a small table INCLUDING the adversarial cases,
writes it to parquet, and hash-compares the engine operator against a
first-principles DuckDB query over the same file — the driver-gate
mechanics, pointed at the inputs the fixtures lack.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation

pytestmark = pytest.mark.slow  # r09 slow tier: see pytest.ini

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _canon(v):
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    return f"x:{v!r}"


def _compare(spark, tmp_path, tables, engine_df, oracle_sql):
    con = duckdb.connect()
    for name, df in tables.items():
        p = str(tmp_path / f"{name}_{abs(hash(oracle_sql)) % 10**6}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    cols = sorted(engine_df.columns)
    got = sorted(tuple(_canon(r[c]) for c in cols) for r in engine_df.collect())
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    want = sorted(tuple(_canon(r[i]) for i in order) for r in res.fetchall())
    assert cols == [dcols[i] for i in order], (cols, sorted(dcols))
    assert got == want


_vals = st.one_of(st.none(), st.integers(-(10**9), 10**9))
_keys = st.sampled_from(["a", "b", "c"])


@given(rows=st.lists(st.tuples(_keys, _vals), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_mad_outliers_differential(spark, tmp_path, rows):
    if all(v is None for _, v in rows):
        return
    df = spark.createDataFrame(rows, "k string, v long")
    out = analytics.mad_outliers(df, "k", "v", k=3)
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH e AS (SELECT k, v FROM t WHERE v IS NOT NULL),
        r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) rn,
                     COUNT(*) OVER (PARTITION BY k) n FROM e),
        m AS (SELECT k, v, n, MAX(CASE WHEN rn <= (n+1)//2 THEN v END)
                OVER (PARTITION BY k) med FROM r),
        d AS (SELECT k, n, med, ABS(v - med) dev FROM m),
        r2 AS (SELECT k, n, med, dev, row_number() OVER
                 (PARTITION BY k ORDER BY dev) rn2 FROM d),
        m2 AS (SELECT k, n, med, dev, MAX(CASE WHEN rn2 <= (n+1)//2
                 THEN dev END) OVER (PARTITION BY k) mad FROM r2)
        SELECT k, CAST(MAX(n) AS BIGINT) n, CAST(MAX(med) AS BIGINT) med,
               CAST(MAX(mad) AS BIGINT) mad,
               CAST(SUM(CASE WHEN dev > 3*mad THEN 1 ELSE 0 END) AS BIGINT)
                 n_outliers
        FROM m2 GROUP BY k
        """,
    )


@given(rows=st.lists(st.tuples(_keys, _vals), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_winsorized_differential(spark, tmp_path, rows):
    if all(v is None for _, v in rows):
        return
    df = spark.createDataFrame(rows, "k string, v long")
    out = analytics.winsorized_stats(df, "k", "v", 0.05, 0.95)
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH e AS (SELECT k, v FROM t WHERE v IS NOT NULL),
        r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) rn,
                     COUNT(*) OVER (PARTITION BY k) n FROM e),
        c AS (SELECT k, v, n,
                MAX(CASE WHEN rn <= CAST(ceil(0.05*n) AS INT) THEN v END)
                  OVER (PARTITION BY k) lo,
                MAX(CASE WHEN rn <= CAST(ceil(0.95*n) AS INT) THEN v END)
                  OVER (PARTITION BY k) hi
              FROM r)
        SELECT k, CAST(MAX(n) AS BIGINT) n, CAST(MAX(lo) AS BIGINT) lo,
               CAST(MAX(hi) AS BIGINT) hi,
               CAST(SUM(LEAST(GREATEST(v, lo), hi)) AS BIGINT) win_sum,
               CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
                 n_clip_lo,
               CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
                 n_clip_hi
        FROM c GROUP BY k
        """,
    )


@given(rows=st.lists(st.tuples(_keys, _vals), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_group_mode_differential(spark, tmp_path, rows):
    if all(v is None for _, v in rows):
        return
    df = spark.createDataFrame(rows, "k string, v long")
    out = analytics.group_mode(df, "k", "v")
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH e AS (SELECT k, v FROM t WHERE v IS NOT NULL),
        c AS (SELECT k, v, COUNT(*) cnt FROM e GROUP BY 1, 2),
        r AS (SELECT k, v, cnt,
                row_number() OVER (PARTITION BY k ORDER BY cnt DESC, v ASC) rn,
                COUNT(*) OVER (PARTITION BY k) nd
              FROM c)
        SELECT k, CAST(v AS BIGINT) mode_value, CAST(cnt AS BIGINT) mode_count,
               CAST(nd AS BIGINT) n_distinct
        FROM r WHERE rn = 1
        """,
    )


@given(
    a=st.lists(_vals, min_size=0, max_size=25),
    b=st.lists(_vals, min_size=0, max_size=25),
    lo=st.integers(-100, 100),
    width=st.integers(1, 50),
    nb=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_histogram_drift_differential(spark, tmp_path, a, b, lo, width, nb):
    if not any(v is not None for v in a + b):
        return
    schema = "v long"
    da = spark.createDataFrame([(v,) for v in a], schema)
    db = spark.createDataFrame([(v,) for v in b], schema)
    # tag the union inside ONE table so DuckDB sees the same rows
    tagged = da.selectExpr("v", "0 AS side").unionByName(
        db.selectExpr("v", "1 AS side")
    )
    out = analytics.histogram_drift(
        da, db, "v", lo=lo, width=width, n_buckets=nb, flag_ppm=1000
    )
    _compare(
        spark, tmp_path, {"t": tagged}, out,
        f"""
        WITH e AS (SELECT v, side FROM t WHERE v IS NOT NULL),
        tg AS (SELECT LEAST(GREATEST((v - {lo}) // {width}, 0), {nb - 1})
                 AS bucket,
               CASE WHEN side = 0 THEN 1 ELSE 0 END ia,
               CASE WHEN side = 1 THEN 1 ELSE 0 END ib
               FROM e),
        pb AS (SELECT bucket, SUM(ia) n_a, SUM(ib) n_b FROM tg GROUP BY 1),
        tot AS (SELECT SUM(n_a) ta, SUM(n_b) tb FROM pb)
        SELECT CAST(bucket AS BIGINT) bucket, CAST(n_a AS BIGINT) n_a,
               CAST(n_b AS BIGINT) n_b,
               CAST(n_a * 1000000 // NULLIF(ta, 0) AS BIGINT) ppm_a,
               CAST(n_b * 1000000 // NULLIF(tb, 0) AS BIGINT) ppm_b,
               CAST(n_a * 1000000 // NULLIF(ta, 0)
                    - n_b * 1000000 // NULLIF(tb, 0) AS BIGINT) delta_ppm,
               ABS(n_a * 1000000 // NULLIF(ta, 0)
                   - n_b * 1000000 // NULLIF(tb, 0)) > 1000 AS flagged
        FROM pb, tot
        """,
    )
    # clamp contract on the engine side: every bucket in range
    assert all(0 <= r["bucket"] < nb for r in out.collect())


_texts = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from("ab \t\nXY12"),
        max_size=12,
    ),
)


@given(
    old=st.dictionaries(st.integers(0, 9), _texts, max_size=8),
    new=st.dictionaries(st.integers(0, 9), _texts, max_size=8),
)
@settings(**_SETTINGS)
def test_snapshot_diff_differential(spark, tmp_path, old, new):
    if not old and not new:
        return
    schema = "doc_id long, text string"
    mk = lambda d: (  # noqa: E731
        spark.createDataFrame(list(d.items()), schema)
        if d else spark.createDataFrame([], schema)
    )
    do, dn = mk(old), mk(new)
    out = curation.snapshot_diff(do, dn)
    both = do.selectExpr("doc_id", "text", "'o' AS side").unionByName(
        dn.selectExpr("doc_id", "text", "'n' AS side")
    )
    nt = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    _compare(
        spark, tmp_path, {"t": both}, out,
        f"""
        WITH od AS (SELECT doc_id AS key, md5(COALESCE({nt}, '')) old_md5
                    FROM t WHERE side = 'o'),
        nd AS (SELECT doc_id AS key, md5(COALESCE({nt}, '')) new_md5
               FROM t WHERE side = 'n')
        SELECT COALESCE(od.key, nd.key) AS key,
               CASE WHEN old_md5 IS NULL THEN 'added'
                    WHEN new_md5 IS NULL THEN 'removed'
                    WHEN old_md5 <> new_md5 THEN 'changed'
                    ELSE 'unchanged' END AS change,
               old_md5, new_md5
        FROM od FULL OUTER JOIN nd ON od.key = nd.key
        """,
    )


@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(2**50, 2**60)), min_size=1, max_size=30
    ),
    nb=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_fixed_width_histogram_differential_huge_values(
    spark, tmp_path, rows, nb
):
    """Values far beyond 2^53 — the double-division class an earlier
    review flagged: float bucket math rounds across boundaries up here,
    integer `div` must not."""
    lo, hi = 2**50, 2**60
    df = spark.createDataFrame(rows, "k string, v long")
    out = analytics.fixed_width_histogram(df, "k", "v", lo, hi, nb).select(
        "k", "bucket", "cnt"
    )
    w = -((hi - lo) // -nb)
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        SELECT k, CAST(LEAST({nb - 1}, GREATEST(0, (v - {lo}) // {w}))
                 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM t GROUP BY 1, 2
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["g1", "g2"])),
            st.integers(-(10**6), 10**6),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r,  # unique (group, value) -> unique order
    ),
    shards=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_prefix_sum_differential_with_null_groups(
    spark, tmp_path, rows, shards
):
    """prefix_sum (range exchange + frozen shard offsets + Arrow cumsum)
    vs the naive global window — including NULL group keys, which the
    operator handles via a null-safe offsets join."""
    rows = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    out = analytics.prefix_sum(
        df, "v", order_cols=["v", "id"], part_cols=["g"], n_shards=shards
    ).select("g", "v", "id", "cum")
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        SELECT g, v, id,
               CAST(SUM(v) OVER (PARTITION BY g ORDER BY v, id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t
        """,
    )


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3600_000), st.integers(-(10**4), 10**4)),
        min_size=1,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_time_weighted_avg_differential_duplicate_ts(spark, tmp_path, rows):
    """Duplicate timestamps are likely under this generator — the
    zero-hold-except-last-by-id contract must agree cross-engine."""
    rows = [("s", ts, v, i) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k string, ts long, v long, id long")
    from hbase_bulkload_service_spark.operators import tsdb

    out = tsdb.time_weighted_avg(
        df, series_col="k", ts_col="ts", value_col="v", id_col="id",
        bucket_ms=600_000,
    )
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH b AS (SELECT k, ts, v, id, ts // 600000 AS bucket FROM t),
        h AS (SELECT k, bucket, v, ts,
                COALESCE(lead(ts) OVER (PARTITION BY k, bucket
                                        ORDER BY ts, id),
                         (bucket + 1) * 600000) - ts AS hold
              FROM b)
        SELECT k, CAST(bucket AS BIGINT) bucket, CAST(COUNT(*) AS BIGINT) n,
               CAST(SUM(v * hold) AS BIGINT) num,
               CAST((MAX(bucket) + 1) * 600000 - MIN(ts) AS BIGINT) span_ms,
               CAST(SUM(v * hold)
                    // ((MAX(bucket) + 1) * 600000 - MIN(ts)) AS BIGINT) twa
        FROM h GROUP BY k, bucket
        """,
    )


@given(
    n_docs=st.integers(1, 30),
    cap=st.integers(1, 10),
    seed=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_capped_stratum_sample_differential(spark, tmp_path, n_docs, cap, seed):
    """The deterministic md5 draw replayed in DuckDB — same winners."""
    df = spark.createDataFrame(
        [(i, "s1" if i % 3 else "s2") for i in range(n_docs)],
        "doc_id long, lang string",
    )
    out = curation.capped_stratum_sample(
        df, cap=cap, strata_col="lang", key_col="doc_id", seed=seed
    ).select("doc_id", "lang")
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) rk
          FROM t
        )
        SELECT doc_id, lang FROM r WHERE rk <= {cap}
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(0, 10_000),        # ts_ms
            st.integers(0, 10**9),         # counter value (non-negative contract)
        ),
        min_size=2,
        max_size=40,
    ),
    mode=st.sampled_from(["rebase", "drop", "wrap"]),
)
@settings(**_SETTINGS)
def test_counter_rate_differential(spark, tmp_path, rows, mode):
    """Reset detection + rebase + integer rate replayed in DuckDB —
    including duplicate timestamps (zero-width intervals dropped) and
    constant runs (delta 0)."""
    rows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    from hbase_bulkload_service_spark.operators import tsdb

    cmax = 2**30
    out = tsdb.counter_rate(
        df,
        key_cols=("event_type",),
        drop_resets=(mode == "drop"),
        counter_max=(cmax if mode == "wrap" else None),
    )
    reset_clause = "AND raw_delta >= 0" if mode == "drop" else ""
    is_reset = "FALSE" if mode == "drop" else "raw_delta < 0"
    delta = {
        "drop": "raw_delta",
        "rebase": "CASE WHEN raw_delta < 0 THEN cents ELSE raw_delta END",
        "wrap": f"CASE WHEN raw_delta < 0 THEN raw_delta + {cmax} ELSE raw_delta END",
    }[mode]
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH d AS (
          SELECT event_type, event_id, ts_ms, cents,
                 cents - LAG(cents) OVER w AS raw_delta,
                 ts_ms - LAG(ts_ms) OVER w AS dt_ms
          FROM t
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id)
        )
        SELECT event_type, event_id, ts_ms, cents,
               CAST({delta} AS BIGINT) AS delta, dt_ms,
               {is_reset} AS is_reset,
               CAST(({delta} * 1000000000) // dt_ms AS BIGINT) AS rate_micros
        FROM d
        WHERE dt_ms IS NOT NULL AND dt_ms > 0 {reset_clause}
        """,
    )


@given(
    n_en=st.integers(0, 40),
    n_de=st.integers(0, 40),
    seed=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_dataset_split_differential(spark, tmp_path, n_en, n_de, seed):
    """Largest-remainder apportionment + md5 draw replayed in DuckDB —
    same rows land in the same splits for arbitrary stratum sizes
    (including empty strata and sizes below the split count)."""
    if n_en + n_de == 0:
        return
    rows = [(i, "en") for i in range(n_en)] + [
        (1000 + i, "de") for i in range(n_de)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = curation.dataset_split(
        df,
        {"train": 700_000, "valid": 200_000, "test": 100_000},
        seed=seed,
    ).select("doc_id", "lang", "split")
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM t GROUP BY lang),
        splits(idx, split, w) AS (VALUES
          (0, 'train', 700000), (1, 'valid', 200000), (2, 'test', 100000)),
        alloc AS (
          SELECT lang, n, idx, split,
                 (n * w) // 1000000 AS fl, (n * w) % 1000000 AS rem
          FROM counts CROSS JOIN splits),
        a2 AS (
          SELECT *, n - SUM(fl) OVER (PARTITION BY lang) AS leftover,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY rem DESC, idx ASC) AS rr
          FROM alloc),
        q AS (SELECT lang, idx, split,
                     fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS quota
              FROM a2),
        th AS (SELECT lang, split,
                      SUM(quota) OVER (PARTITION BY lang ORDER BY idx
                                       ROWS UNBOUNDED PRECEDING) AS hi,
                      SUM(quota) OVER (PARTITION BY lang ORDER BY idx
                                       ROWS UNBOUNDED PRECEDING) - quota AS lo
               FROM q),
        r AS (SELECT doc_id, lang,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rk
              FROM t)
        SELECT r.doc_id, r.lang, th.split
        FROM r JOIN th
          ON r.lang IS NOT DISTINCT FROM th.lang
         AND r.rk > th.lo AND r.rk <= th.hi
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 20_000),           # ts_ms
            st.integers(-(10**6), 10**6),     # value (negatives exercise trunc)
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_align_series_ratio_differential(spark, tmp_path, rows):
    """Shared-grid ZOH pivot + ppm ratio replayed in DuckDB on random
    sparse two-series inputs — span intersection, held-vs-observed
    flags, zero-denominator NULLs, and NEGATIVE values (both engines
    truncate integer division toward zero, so the ppm ratio agrees on
    the full domain)."""
    rows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    from hbase_bulkload_service_spark.operators import tsdb

    # no masking: Spark `div` and DuckDB `//` both truncate toward zero,
    # so the ppm ratio agrees cross-engine even on negative values
    out = tsdb.align_series_ratio(
        df, series_a="a", series_b="b", step_ms=1000
    )
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH e AS (
          SELECT event_type, ts_ms // 1000 AS bucket, cents, ts_ms, event_id
          FROM t WHERE event_type IN ('a', 'b')
        ),
        b AS (
          SELECT event_type, bucket, cents,
                 row_number() OVER (PARTITION BY event_type, bucket
                                    ORDER BY ts_ms DESC, event_id DESC) rn
          FROM e
        ),
        obs AS (SELECT event_type, bucket, cents FROM b WHERE rn = 1),
        span AS (SELECT event_type, MIN(bucket) lo, MAX(bucket) hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
                 FROM span),
        j AS (SELECT g.event_type, g.bucket, o.cents
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket = g.bucket),
        fl AS (
          SELECT event_type, bucket,
                 last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS filled,
                 cents IS NOT NULL AS is_observed
          FROM j
        ),
        p AS (
          SELECT bucket,
                 MAX(CASE WHEN event_type='a' THEN filled END) a_val,
                 MAX(CASE WHEN event_type='b' THEN filled END) b_val,
                 MAX(CASE WHEN event_type='a' THEN is_observed END) a_observed,
                 MAX(CASE WHEN event_type='b' THEN is_observed END) b_observed
          FROM fl GROUP BY bucket
        )
        SELECT CAST(bucket AS BIGINT) bucket,
               CAST(a_val AS BIGINT) a_val, CAST(b_val AS BIGINT) b_val,
               a_observed, b_observed,
               CASE WHEN b_val <> 0
                    THEN CAST((a_val * 1000000) // b_val AS BIGINT) END
                 AS ratio_ppm
        FROM p WHERE a_val IS NOT NULL AND b_val IS NOT NULL
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 15_000),
            st.integers(-(10**6), 10**6),
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_grid_fill_linear_differential(spark, tmp_path, rows):
    """Linear-interpolation fill replayed in DuckDB on random sparse
    series — including NEGATIVE values (both engines truncate toward
    zero) and duplicate timestamps (last-by-id representative)."""
    rows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    from hbase_bulkload_service_spark.operators import tsdb

    out = tsdb.grid_fill_linear(df, step_ms=1000)
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH b AS (
          SELECT event_type, ts_ms // 1000 AS bucket, cents,
                 row_number() OVER (PARTITION BY event_type, ts_ms // 1000
                                    ORDER BY ts_ms DESC, event_id DESC) rn
          FROM t
        ),
        obs AS (SELECT event_type, bucket, cents FROM b WHERE rn = 1),
        span AS (SELECT event_type, MIN(bucket) lo, MAX(bucket) hi
                 FROM obs GROUP BY event_type),
        grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
                 FROM span),
        j AS (SELECT g.event_type, g.bucket, o.cents
              FROM grid g LEFT JOIN obs o
                ON o.event_type = g.event_type AND o.bucket = g.bucket),
        fl AS (
          SELECT event_type, bucket,
                 cents IS NOT NULL AS is_observed,
                 last_value(cents IGNORE NULLS) OVER wf AS pv,
                 last_value(CASE WHEN cents IS NOT NULL THEN bucket END
                            IGNORE NULLS) OVER wf AS pb,
                 first_value(cents IGNORE NULLS) OVER wb AS nv,
                 first_value(CASE WHEN cents IS NOT NULL THEN bucket END
                             IGNORE NULLS) OVER wb AS nb
          FROM j
          WINDOW wf AS (PARTITION BY event_type ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING),
                 wb AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, CAST(bucket AS BIGINT) bucket,
               CAST(CASE WHEN is_observed THEN pv
                    ELSE pv + ((nv - pv) * (bucket - pb)) // (nb - pb)
                    END AS BIGINT) AS filled,
               is_observed
        FROM fl
        """,
    )


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5_000), st.integers(-(10**6), 10**6)),
        min_size=1,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_percentile_downsample_differential(spark, tmp_path, rows):
    """Exact rank selection per (series, bucket) replayed in DuckDB —
    duplicate values and negative values included."""
    df = spark.createDataFrame(
        [("s", ts, v) for ts, v in rows],
        "event_type string, ts_ms long, cents long",
    )
    from hbase_bulkload_service_spark.operators import tsdb

    out = tsdb.percentile_downsample(df, bucket_ms=1000, ps=(0.25, 0.5, 1.0))
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH r AS (
          SELECT event_type, ts_ms // 1000 AS bucket, cents,
                 row_number() OVER (PARTITION BY event_type, ts_ms // 1000
                                    ORDER BY cents) rn,
                 COUNT(*) OVER (PARTITION BY event_type, ts_ms // 1000) n
          FROM t
        ),
        ps AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                              CAST(1.0 AS DOUBLE)]) AS p)
        SELECT event_type, CAST(bucket AS BIGINT) bucket, p,
               cents AS quantile_value, CAST(n AS BIGINT) AS bucket_n
        FROM r CROSS JOIN ps WHERE rn = CAST(ceil(p * n) AS INT)
        """,
    )


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(-10, 10)),
        min_size=1,
        max_size=40,
    ),
    thr=st.integers(-5, 5),
)
@settings(**_SETTINGS)
def test_threshold_episodes_differential(spark, tmp_path, rows, thr):
    """Gaps-and-islands replayed in DuckDB — random breach patterns,
    thresholds on both sides of the value range."""
    rows = [(k, i * 10, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    from hbase_bulkload_service_spark.operators import tsdb

    out = tsdb.threshold_episodes(df, threshold=thr)
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH r AS (
          SELECT event_type, ts_ms, cents,
                 cents > {thr} AS breach,
                 row_number() OVER w AS rn,
                 SUM(CASE WHEN cents > {thr} THEN 1 ELSE 0 END) OVER w AS rnb
          FROM t
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id)
        )
        SELECT event_type,
               CAST(MIN(ts_ms) AS BIGINT) AS start_ts,
               CAST(MAX(ts_ms) AS BIGINT) AS end_ts,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(MAX(cents) AS BIGINT) AS peak
        FROM r WHERE breach GROUP BY event_type, rn - rnb
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 6),                      # user
            st.sampled_from(["a", "b", "c"]),       # type
            st.integers(0, 100),                    # ts
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_user_journeys_differential(spark, tmp_path, rows, k):
    """Path mining replayed in DuckDB — duplicate timestamps resolved by
    id, truncation to k steps, deterministic tie ranks."""
    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long, event_id long"
    )
    out = analytics.user_journeys(df, max_steps=k, top_k=10)
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH r AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts_ms, event_id) rn
          FROM t
        ),
        p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= {k} GROUP BY user_id),
        c AS (SELECT path, COUNT(*) n_users FROM p GROUP BY path),
        tt AS (SELECT path, CAST(n_users AS BIGINT) n_users,
                      CAST(row_number() OVER (ORDER BY n_users DESC, path ASC)
                           AS INT) rank
               FROM c)
        SELECT path, n_users, rank FROM tt WHERE rank <= 10
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.sampled_from(["i1", "i2", "i3", "i4", "i5"]),
            st.one_of(st.none(), st.integers(-(10**6), 10**6)),
        ),
        min_size=1,
        max_size=40,
    ),
    n=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_topn_other_differential(spark, tmp_path, rows, n):
    """Top-N fold replayed in DuckDB — NULL values (SUM skips them both
    sides), ties broken by item, tail-vs-no-tail shapes."""
    df = spark.createDataFrame(rows, "g string, item string, v long")
    out = analytics.topn_other(df, "g", "item", "v", n=n).select(
        "g", "item", "total", "n_rows",
        # Spark rank is int on top rows / lit int on other; align to long
        F.col("rank").cast("long").alias("rank"),
        "is_other",
    )
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH a AS (
          SELECT g, item, SUM(v) AS total, COUNT(*) AS n_rows
          FROM t GROUP BY g, item
        ),
        r AS (
          SELECT g, item, total, n_rows,
                 row_number() OVER (
                   PARTITION BY g ORDER BY total DESC NULLS LAST, item ASC
                 ) AS rank
          FROM a
        )
        SELECT g, item, CAST(total AS BIGINT) total,
               CAST(n_rows AS BIGINT) n_rows, CAST(rank AS BIGINT) rank,
               FALSE AS is_other
        FROM r WHERE rank <= {n}
        UNION ALL
        SELECT g, '__other__', CAST(SUM(total) AS BIGINT),
               CAST(SUM(n_rows) AS BIGINT), CAST({n + 1} AS BIGINT), TRUE
        FROM r WHERE rank > {n} GROUP BY g
        """,
    )


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.one_of(st.none(), st.sampled_from(["t1", "t2", "t3", "t4"])),
            st.integers(0, 100),
        ),
        min_size=1,
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_source_reputation_differential(spark, tmp_path, rows):
    """Dup-rate per source replayed in DuckDB — NULL text hashes as
    empty, small text pools force heavy duplication."""
    df = spark.createDataFrame(rows, "source string, text string, n_chars long")
    out = curation.source_reputation(df, dup_threshold_ppm=300_000)
    _compare(
        spark, tmp_path, {"t": df}, out,
        """
        WITH d AS (
          SELECT source, md5(COALESCE(text, '')) AS dg,
                 COALESCE(n_chars, 0) AS ch
          FROM t
        ),
        sd AS (SELECT source, dg, COUNT(*) cnt, SUM(ch) chr
               FROM d GROUP BY source, dg),
        g AS (SELECT dg, SUM(cnt) gcnt FROM sd GROUP BY dg),
        s AS (
          SELECT source, CAST(SUM(cnt) AS BIGINT) n_docs,
                 CAST(SUM(CASE WHEN gcnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   n_dup_docs,
                 CAST(SUM(chr) AS BIGINT) total_chars
          FROM sd JOIN g USING (dg) GROUP BY source
        )
        SELECT source, n_docs, n_dup_docs, total_chars,
               CAST((n_dup_docs * 1000000) // n_docs AS BIGINT) dup_ppm,
               (n_dup_docs * 1000000) // n_docs > 300000 AS flagged
        FROM s
        """,
    )


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(-(10**5), 10**5)),
        min_size=1,
        max_size=30,
    ),
    p_ppm=st.sampled_from([1, 250_000, 500_000, 999_999, 1_000_000]),
)
@settings(**_SETTINGS)
def test_time_weighted_percentile_differential(spark, tmp_path, rows, p_ppm):
    """Hold-weighted percentile replayed in DuckDB — duplicate
    timestamps (zero holds), negative values, boundary probes."""
    rows = [("s", ts, v, i) for i, (ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, cents long, event_id long"
    )
    from hbase_bulkload_service_spark.operators import tsdb

    out = tsdb.time_weighted_percentile(
        df, bucket_ms=1000, p_ppm=p_ppm
    ).select(
        "event_type", "bucket",
        F.col("p_ppm").cast("long").alias("p_ppm"),
        "twp", "total_hold_ms", "n",
    )
    _compare(
        spark, tmp_path, {"t": df}, out,
        f"""
        WITH b AS (
          SELECT event_type, event_id, ts_ms, cents,
                 ts_ms // 1000 AS bucket
          FROM t
        ),
        h AS (
          SELECT event_type, bucket, cents, ts_ms, event_id,
                 COALESCE(lead(ts_ms) OVER (PARTITION BY event_type, bucket
                                            ORDER BY ts_ms, event_id),
                          (bucket + 1) * 1000) - ts_ms AS hold
          FROM b
        ),
        c AS (
          SELECT event_type, bucket, cents, ts_ms, event_id,
                 SUM(hold) OVER (PARTITION BY event_type, bucket
                                 ORDER BY cents, ts_ms, event_id
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(hold) OVER (PARTITION BY event_type, bucket) AS total,
                 COUNT(*) OVER (PARTITION BY event_type, bucket) AS n
          FROM h
        ),
        f AS (
          SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                                       ORDER BY cents, ts_ms, event_id) rk
          FROM c WHERE cum * 1000000 >= {p_ppm} * total
        )
        SELECT event_type, CAST(bucket AS BIGINT) bucket,
               CAST({p_ppm} AS BIGINT) p_ppm, cents AS twp,
               CAST(total AS BIGINT) total_hold_ms, CAST(n AS BIGINT) n
        FROM f WHERE rk = 1
        """,
    )
