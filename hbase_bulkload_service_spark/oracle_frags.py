"""Shared DuckDB oracle SQL fragments used by MULTIPLE registry waves.

This module must stay registry-independent (no imports from registry*):
registry.py chain-imports every wave at its bottom, so a wave importing
a fragment from a LATER-initialized sibling works only when the chain
starts at registry — a test importing that sibling directly leaves it
partially initialized and the cross-wave import explodes. Fragments that
cross wave boundaries live here instead.
"""

from __future__ import annotations

# int8-quantization family (operators/similarity.py:quantize_int8
# semantics: micros -> per-vector max-abs scale -> codes by truncating
# div). Used by q122 (registry_wave8) and q146 (registry_wave13) — one
# definition so a semantics change cannot silently leave one gate
# testing stale behavior.
DUCK_QUANT_CTES = """vm AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS vm
      FROM embeddings
    ),
    qs AS (
      SELECT vec_id, vm,
             list_max(list_transform(vm, x -> abs(x))) AS sc
      FROM vm
    ),
    qq AS (
      SELECT vec_id, sc,
             CASE WHEN sc = 0
                  THEN list_transform(vm, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(vm, x -> (x * 127) // sc) END AS qv
      FROM qs
    )"""


def duck_quant_score(q: str, e: str) -> str:
    """Integer quantized score dot(qa, qv) * sa * sc between a query
    alias (with qa/sa columns) and a corpus alias over qq."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, 65), i -> {q}.qa[i] * {e}.qv[i])), "
        f"(a, b) -> a + b) * {q}.sa * {e}.sc"
    )


# float-cosine family (used by the q38/q39 family in registry_llm and by
# q146's fusion oracle in registry_wave13)
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> ({a}[i])::DOUBLE * ({b}[i])::DOUBLE), (x, y) -> x + y)"
    )


def duck_cos_micros(a: str, b: str) -> str:
    return (
        f"CAST(FLOOR({duck_dot(a, b)} / "
        f"(sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)})) * 1000000) AS BIGINT)"
    )


# deletion-neighborhood fuzzy-linkage edges over customer names
# (dedup.fuzzy_self_join_k1 semantics) — the shared graph for
# q113/q114 (registry_wave7) and q149 (registry_wave13)
FUZZY_EDGES_CTE = """
    v AS (
      SELECT c_custkey AS id, c_name AS s,
             md5(unnest(list_distinct(list_append(
               list_transform(range(1, length(c_name) + 1),
                              i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
               c_name)))) AS var
      FROM customer
    ),
    e AS (
      SELECT DISTINCT a.id AS x, b.id AS y
      FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
      WHERE levenshtein(a.s, b.s) <= 1
    )
"""


def duck_zoh_grid_ctes(step_ms: int, series_filter: str = "") -> str:
    """The dense-grid + per-bucket-representative CTE chain shared by the
    grid-fill family oracles — q141 (registry_wave13, ZOH fill), q152
    (registry_wave14, aligned ratio) and q157 (registry_wave15, linear
    fill). One definition so a representative-rule change (last sample
    by (ts, id) DESC) cannot silently leave one gate testing stale
    semantics. Produces CTEs ``e``/``b``/``obs``/``span``/``grid``/``j``;
    callers append their fill/pivot logic over ``j``.

    ``series_filter``: optional extra predicate ANDed into the base
    selection (e.g. ``AND event_type IN ('click', 'view')``).
    """
    return f"""e AS (
      SELECT event_type, event_id, epoch_ms(ts) AS ts_ms,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL {series_filter}
    ),
    b AS (
      SELECT event_type, ts_ms // {step_ms} AS bucket, cents,
             row_number() OVER (
               PARTITION BY event_type, ts_ms // {step_ms}
               ORDER BY ts_ms DESC, event_id DESC
             ) AS rn
      FROM e
    ),
    obs AS (SELECT event_type, bucket, cents FROM b WHERE rn = 1),
    span AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM obs GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
      FROM span
    ),
    j AS (
      SELECT g.event_type, g.bucket, o.cents
      FROM grid g LEFT JOIN obs o
        ON o.event_type = g.event_type AND o.bucket = g.bucket
    )"""
