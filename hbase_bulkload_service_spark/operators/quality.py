"""Declarative data-quality expectations over DataFrames (the
Deequ / Great-Expectations family of checks, re-expressed Spark-first).

The reference engine's only quality gate is the hard dirty-record drop
(empty rowkey — ``HFileGenerator.java`` filter, SURVEY §2.B4); a
production ingest pipeline needs the *audit* form too: evaluate a suite
of expectations and report per-expectation failure counts without
mutating the data. That is what this module provides.

Expectation kinds:

- **row checks** — any boolean Column per row (not-null, range,
  accepted values, regex, cross-column predicates). A NULL predicate
  counts as a FAILURE (SQL three-valued logic would otherwise let a
  NULL-laden column pass every range check).
- **uniqueness** — key (or composite key) duplication. ``n_failed`` is
  the duplicate SURPLUS (rows beyond the first per key group,
  ``COUNT(*) - COUNT(DISTINCT key)``), computed over rows whose key
  parts are all non-null (pair with a not-null row check to cover the
  rest).
- **referential integrity** — child FK values that have no match in a
  parent key column; NULL FKs are not checked (SQL FK semantics —
  cover them with a not-null row check if they are illegal).

Scale shape (the 100 TB contract):

- ALL row checks over one DataFrame fuse into a SINGLE aggregate pass —
  one scan of the fact table no matter how many predicates, map-side
  partial aggregation, a one-row result that is then unpivoted
  driver-free with ``stack``.
- each uniqueness check is its own key-pruned scan + ONE width-pinned
  keyed aggregation. The first cut used ``count_distinct`` branches
  inside the fused agg; the r05 stage audit + 10× linearity probe
  measured that shape as the AQE byte-coalesce trap (wall 3.62× at 10×
  data): the expand's post-shuffle distinct aggregation is byte-small
  (keys only) but CPU-heavy, so AQE squeezed it onto 3-6 tasks. A
  user-numbered ``repartition(width, keys)`` is exempt from AQE
  coalescing AND satisfies the groupBy's required distribution, so the
  heavy distinct aggregation runs at full width with no extra exchange
  — the same fix q36/q42/q102 carry. The extra scan is column-pruned to
  the key columns (parquet reads nothing else).
- each FK check is one left join keyed on the FK — the parent side is
  reduced to distinct keys first (dimension-sized, distinct width-pinned
  the same way), so Catalyst/AQE broadcasts it in the common dim-table
  case; the fact side never re-shuffles more than once per FK column.
- the result is a tiny per-expectation frame (one row per expectation);
  everything stays lazy — no ``collect`` anywhere, the audit composes
  into larger jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.session import pinned_width

__all__ = ["expectations_audit", "label_majority"]


def expectations_audit(
    df: DataFrame,
    row_checks: list[tuple[str, Column]] | None = None,
    unique_keys: list[tuple[str, list[str]]] | None = None,
    fk_checks: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate a suite of data-quality expectations against ``df``.

    Args:
        df: the table under audit.
        row_checks: ``(name, predicate)`` pairs; the predicate is a
            boolean Column evaluated per row, NULL counted as failed.
        unique_keys: ``(name, [key_col, ...])`` pairs; duplicate-surplus
            uniqueness over non-null key tuples.
        fk_checks: ``(name, child_col, parent_df, parent_col)`` —
            non-null ``child_col`` values must exist in
            ``parent_df[parent_col]``.

    Returns one row per expectation:
    ``(expectation string, n_checked long, n_failed long, ok boolean)``.
    """
    row_checks = list(row_checks or [])
    unique_keys = list(unique_keys or [])
    fk_checks = list(fk_checks or [])
    if not (row_checks or unique_keys or fk_checks):
        raise ValueError("expectations_audit: no expectations given")
    names = [n for n, _ in row_checks] + [n for n, _ in unique_keys] + [
        n for n, *_ in fk_checks
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in {names}")
    # names are spliced into the stack(...) SQL below as string literals —
    # reject anything that could escape the quoting
    import re

    bad_names = [n for n in names if not re.fullmatch(r"[A-Za-z0-9_.\- ]+", n)]
    if bad_names:
        raise ValueError(
            f"expectation names must be alphanumeric/_/./-/space: {bad_names}"
        )

    width = pinned_width(df.sparkSession)
    parts: list[DataFrame] = []
    if row_checks:
        aggs: list[Column] = [F.count(F.lit(1)).alias("_n_all")]
        for i, (_, cond) in enumerate(row_checks):
            # NULL predicate == failure: ~coalesce(cond, false)
            aggs.append(
                F.sum(
                    F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
                ).alias(f"_rf_{i}")
            )
        one = df.agg(*aggs)
        # driver-free unpivot of the 1-row aggregate into one row per
        # expectation: stack(n, name, checked, failed, ...)
        stack_args: list[str] = []
        for i, (name, _) in enumerate(row_checks):
            stack_args += [f"'{name}'", "_n_all", f"_rf_{i}"]
        parts.append(
            one.selectExpr(
                f"stack({len(row_checks)}, {', '.join(stack_args)})"
                " AS (expectation, n_checked, n_failed)"
            )
        )
    for name, keys in unique_keys:
        if not keys:
            raise ValueError("unique_keys entry with empty key list")
        nonnull = F.lit(True)
        for k in keys:
            nonnull = nonnull & F.col(k).isNotNull()
        # width-pinned keyed agg (see module doc): repartition(width,
        # keys) feeds groupBy(keys) with zero extra exchange and keeps
        # AQE from coalescing the CPU-heavy distinct count onto few
        # tasks; the surplus is then a tiny global agg over group rows
        per_key = (
            df.filter(nonnull)
            .select(*keys)
            .repartition(width, *keys)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        parts.append(
            per_key.agg(
                F.lit(name).alias("expectation"),
                F.sum("_c").alias("n_checked"),
                (F.sum("_c") - F.count(F.lit(1))).alias("n_failed"),
            )
        )
    for name, child_col, parent, parent_col in fk_checks:
        # parent reduced to distinct keys (dim-sized -> broadcastable);
        # the distinct is width-pinned for the same AQE-coalesce reason;
        # the marker column survives the left join iff the key matched
        pk = (
            parent.select(F.col(parent_col).alias("_k"))
            .repartition(width, "_k")
            .distinct()
            .select("_k", F.lit(1).alias("_hit"))
        )
        j = (
            df.select(F.col(child_col).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .join(pk, "_k", "left")
        )
        parts.append(
            j.agg(
                F.lit(name).alias("expectation"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias(
                    "n_failed"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # SUM over an empty table is NULL — both counters normalize to 0
    return out.select(
        "expectation",
        F.coalesce(F.col("n_checked"), F.lit(0)).cast("long").alias("n_checked"),
        F.coalesce(F.col("n_failed"), F.lit(0)).cast("long").alias("n_failed"),
        (F.coalesce(F.col("n_failed"), F.lit(0)) == 0).alias("ok"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list,
    k: int = 5,
) -> DataFrame:
    """k-anonymity risk audit (Sweeney 2002): group the table by its
    quasi-identifier columns — the attributes an adversary can link to
    an external dataset — and report every equivalence class smaller
    than ``k``: each such row is a re-identification risk (a group of
    one IS an identification). The governance gate a training corpus
    with user-derived records runs before release, complementing the
    PII scrub (q58: remove direct identifiers) with the INDIRECT
    identifier audit suppression/generalization decisions are based on.

    Output: one row per risky equivalence class — the quasi-identifier
    values plus ``group_n`` (< k). Scale shape: ONE map-side-combined
    keyed agg (output = class cardinality, then filtered to the risky
    tail) — the same cost as any groupBy; no row-level data leaves the
    executors.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 flags nothing, ever)")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_n"))
        .filter(F.col("group_n") < k)
    )


def forget_plan(
    events: DataFrame,
    cohort_pred: Column,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    slot_ms: int = 300_000,
) -> DataFrame:
    """Right-to-be-forgotten work order: for every key in the deletion
    cohort, the per-table impact summary a targeted erasure job needs —
    raw row count, the count of derived 5-minute rollup slots that must
    be recomputed (deleting raw rows silently invalidates downstream
    aggregates; the slot list IS the recompute work order), and the
    affected time span (which HFile regions / partitions to rewrite).

    Output: (key, n_rows, n_rollup_slots, first_ts, last_ts) per cohort
    member. Scale shape: the cohort predicate prunes at the scan, then
    ONE keyed agg computes rows/span and the distinct slot count rides
    the same exchange (count_distinct over the already-keyed groups) —
    output is cohort-sized.
    """
    if slot_ms < 1:
        raise ValueError("slot_ms must be >= 1")
    return (
        events.filter(cohort_pred)
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(
                F.expr(f"{ts_col} div {slot_ms}")
            ).alias("n_rollup_slots"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
    )


def column_profile(df: DataFrame, canon: dict[str, Column]) -> DataFrame:
    """ANALYZE-style table profiler — the catalog/statistics pass a
    lakehouse runs before cost-based planning and data-contract checks:
    one row per column with row count, null count and ppm, EXACT
    distinct count, and lexicographic min/max of the column's CANONICAL
    string form.

    ``canon`` maps output column name -> a Column expression producing
    an engine-portable STRING (the caller chooses the canonicalization:
    integers as decimal strings, doubles as floor-cents, timestamps as
    epoch millis — the registry conventions — because raw float/
    timestamp formatting differs between engines and would poison the
    min/max verdict). NULLs must stay NULL through the expression.

    Scale shape for 100 TB: the profile is ONE pass — every column's
    canonical value melts into a (col_name, val) stream map-side
    (|cols| x rows, the unpivot price every profiler pays) and
    collapses through a (col, val)-keyed pre-agg (map-side combined;
    bounds the exact-NDV shuffle by per-column cardinality, not row
    count) before the |cols|-row rollup. No windows, no joins; output
    is catalog-sized.
    """
    if not canon:
        raise ValueError("canon must be non-empty")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        expr.cast("string").alias("val"),
                    )
                    for name, expr in sorted(canon.items())
                ]
            )
        ).alias("kv")
    ).select("kv.col_name", "kv.val")
    # (col, val) pre-agg first: the exact-NDV shuffle then carries one
    # row per DISTINCT value per column instead of one per input row
    per_val = melted.groupBy("col_name", "val").agg(
        F.count("*").alias("__c")
    )
    return (
        per_val.groupBy("col_name")
        .agg(
            F.sum("__c").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), F.col("__c")).otherwise(0))
            .alias("n_nulls"),
            F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .withColumn("null_ppm", F.expr("n_nulls * 1000000 div n_rows"))
    )


def reconcile_rollup(
    expected: DataFrame,
    stored: DataFrame,
    keys: list[str],
    measure: str,
) -> DataFrame:
    """Rollup reconciliation audit — the backfill-validation pass a
    pipeline runs after recomputing an aggregate from raw data: full
    outer join of the EXPECTED rollup (recomputed) against the STORED
    one on the grain keys, emitting only the disagreements, each
    classified: ``missing_in_stored`` (raw has a slot the store lost),
    ``missing_in_expected`` (the store has a slot raw no longer
    produces — late deletes, retention bugs), or ``value_mismatch``
    (both present, measures differ). Agreeing slots are dropped — the
    healthy state is an empty report.

    Scale shape: both sides are already rollup-grain (slots, not raw
    rows); ONE keyed full-outer sort-merge/shuffle join on the grain,
    classification and delta are map-side, output is
    discrepancy-sized. At 100 TB the raw->expected recompute upstream
    dominates; the audit itself adds a single rollup-sized exchange.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    e = expected.select(
        *keys, F.col(measure).alias("expected_" + measure)
    ).withColumn("__e", F.lit(1))
    s = stored.select(
        *keys, F.col(measure).alias("stored_" + measure)
    ).withColumn("__s", F.lit(1))
    j = e.join(s, keys, "full_outer")
    status = (
        F.when(F.col("__s").isNull(), F.lit("missing_in_stored"))
        .when(F.col("__e").isNull(), F.lit("missing_in_expected"))
        .otherwise(F.lit("value_mismatch"))
    )
    return (
        j.filter(
            F.col("__s").isNull()
            | F.col("__e").isNull()
            | (F.col("expected_" + measure) != F.col("stored_" + measure))
        )
        .select(
            *keys,
            F.col("expected_" + measure),
            F.col("stored_" + measure),
            status.alias("status"),
        )
    )


def column_profile_sketch(
    df: DataFrame, canon: dict[str, Column], rel_err_ppm: int = 50_000
) -> DataFrame:
    """Sketch-mode table profiler — q198's scale companion: at 100 TB a
    catalog pass usually estimates NDV with HLL++ instead of paying the
    exact distinct shuffle; this operator runs BOTH on the same melted
    stream and emits, per column, the exact count plus a boolean
    verdict that the sketch landed within ``rel_err_ppm`` of it — the
    q115 device (sketch STATES can't cross an engine oracle; their
    ACCURACY can: the oracle asserts the boolean as literal TRUE, so a
    sketch drifting out of contract breaks the hash).

    The HLL probe runs over the (col, val) pre-agg — HLL is
    duplicate-insensitive, so estimating on distinct values is
    identical to estimating on the raw stream, and the pre-agg bounds
    both paths' shuffle by per-column cardinality at once.
    """
    if not canon:
        raise ValueError("canon must be non-empty")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        expr.cast("string").alias("val"),
                    )
                    for name, expr in sorted(canon.items())
                ]
            )
        ).alias("kv")
    ).select("kv.col_name", "kv.val")
    per_val = melted.filter(F.col("val").isNotNull()).groupBy(
        "col_name", "val"
    ).agg(F.lit(1).alias("__one"))
    return (
        per_val.groupBy("col_name")
        .agg(
            F.count("*").alias("n_distinct"),
            F.approx_count_distinct("val", 0.02).alias("__hll"),
        )
        .select(
            "col_name",
            "n_distinct",
            (
                F.abs(F.col("__hll") - F.col("n_distinct")) * 1_000_000
                <= F.lit(rel_err_ppm) * F.col("n_distinct")
            ).alias("hll_within_bound"),
        )
    )


def label_majority(
    votes,
    item_col: str = "doc_id",
    ann_col: str = "annotator",
    label_col: str = "label",
):
    """Majority-vote label aggregation — the annotation-consolidation
    step of a labeling/RLHF pipeline: per item, the label with the most
    votes, ties broken deterministically to the lexicographically
    smallest label (the Dawid-Skene initialization every aggregation
    scheme starts from; kappa_agreement then scores annotators against
    the consolidated labels).

    Output per item: ``(item, maj_label, n_votes, maj_votes,
    unanimous)``.

    Scale shape: one (item, label) map-side-combined hash agg collapses
    the vote stream, then ONE item-keyed agg computes the argmax via
    ``min_by(lbl, struct(-c, lbl))`` — max count, then min label,
    single pass, no join-back, no window over raw votes.
    """
    from pyspark.sql import functions as F

    counts = votes.groupBy(
        F.col(item_col).alias("item"), F.col(label_col).alias("lbl")
    ).agg(F.count("*").alias("c"))
    return (
        counts.groupBy("item")
        .agg(
            F.expr("min_by(lbl, struct(-c, lbl))").alias("maj_label"),
            F.sum("c").cast("long").alias("n_votes"),
            F.max("c").cast("long").alias("maj_votes"),
        )
        .select(
            F.col("item").alias(item_col),
            "maj_label",
            "n_votes",
            "maj_votes",
            (F.col("maj_votes") == F.col("n_votes")).alias("unanimous"),
        )
    )
