"""Registry wave 9 (q126+) — round-4 late additions: the scalable
prefix-sum primitive and the three corpus-construction operators built
on the new wave-9 engine surface:

- q126 output-shard planning (global cumulative bytes -> size-targeted
  shards, NO single-partition window anywhere in the engine path — the
  oracle uses the naive ``SUM() OVER (ORDER BY)`` the operator refuses
  to plan);
- q127 token-budget data mix (largest-remainder integer allocation +
  greedy prefix-sum cut per source);
- q128 boilerplate line removal (CCNet-style cross-document repeated
  line suppression, md5-rebuilt clean text verified hash-exact);
- q129 inverted-index posting lists (df/cf stats + doc-sorted postings
  with stopword elision above a df cap).

Same portability rules as registry.py: integer outputs, identical
aliases both sides, DuckDB SUMs cast back to BIGINT, md5 for text
round-trip equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics, curation, textops
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.sources.tables import load


# ===========================================================================
# q126 — output-shard planning via the scalable global prefix sum
# ===========================================================================

_SHARD_BYTES = 4000


@register(
    "q126_output_shards",
    f"""
    WITH c AS (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      FROM documents
    )
    SELECT CAST((greatest(cum, 1) - 1) // {_SHARD_BYTES} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM c GROUP BY 1
    """,
)
def q126_output_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-targeted output sharding — assign docs (in a stable global
    order) to ~4 KB output shards by cumulative byte count, the planning
    step before writing N-GB training shards. The engine path is
    analytics.prefix_sum's one-range-exchange plan; the oracle is the
    naive global window (Exchange SinglePartition — exactly the plan the
    operator exists to avoid; the 100 TB argument is the plan contract
    pinned in tests, the hash match proves the two agree bit-for-bit)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    cum = analytics.prefix_sum(
        docs.select("doc_id", "n_chars"), "n_chars", ["doc_id"],
        n_shards=16, out_col="cum",
    )
    # pure-integer shard id: greatest(cum,1)-1 keeps the numerator
    # non-negative so truncating `div` == floor `//` in BOTH engines
    # (a leading zero-byte doc would otherwise hit -1/W: 0 vs -1), and
    # no double quotient that could round across a boundary at ~4e15
    shard = F.expr(f"(greatest(cum, 1L) - 1L) div {_SHARD_BYTES}")
    return (
        cum.groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ===========================================================================
# q127 — token-budget data mix (largest remainder + greedy prefix cut)
# ===========================================================================

_BUDGET = 3_000
_MIX_W = {"src0": 3, "src1": 2, "src2": 2, "src3": 1}


def _mix_w_sql() -> str:
    return (
        "CASE source "
        + " ".join(f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_W.items()))
        + " ELSE 0 END"
    )


@register(
    "q127_token_budget_mix",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS n_tokens
      FROM documents
    ),
    src AS (
      SELECT source, {_mix_w_sql()} AS w FROM d GROUP BY source
      HAVING {_mix_w_sql()} > 0
    ),
    a0 AS (
      SELECT source,
             ({_BUDGET}::BIGINT * w) // SUM(w) OVER () AS base,
             ({_BUDGET}::BIGINT * w) % SUM(w) OVER () AS rem
      FROM src
    ),
    a1 AS (
      SELECT source, base, rem,
             {_BUDGET} - SUM(base) OVER () AS extra,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM a0
    ),
    a2 AS (
      SELECT source,
             CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_tokens
      FROM a1
    ),
    cut AS (
      SELECT d.doc_id, d.source, d.n_tokens, a2.alloc_tokens,
             SUM(d.n_tokens) OVER (
               PARTITION BY d.source ORDER BY d.doc_id
             ) AS cum
      FROM d JOIN a2 USING (source)
    )
    SELECT source,
           CAST(MAX(alloc_tokens) AS BIGINT) AS alloc_tokens,
           CAST(COUNT(CASE WHEN cum <= alloc_tokens THEN 1 END) AS BIGINT)
             AS kept_docs,
           CAST(SUM(CASE WHEN cum <= alloc_tokens THEN n_tokens END) AS BIGINT)
             AS kept_tokens
    FROM cut GROUP BY source
    """,
)
def q127_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3k-token training-mix build over 4 weighted sources:
    largest-remainder integer allocation (3:2:2:1), then each source
    keeps docs in doc_id order while whole docs still fit. Verifies the
    allocation arithmetic AND the grouped prefix-sum cut hash-exactly
    against the window-function twin."""
    docs = load(spark, sf_dir, "documents", spread=True)
    d = docs.select(
        "doc_id",
        "source",
        F.size(textops.words_of(F.col("text"))).cast("long").alias("n_tokens"),
    )
    out = curation.token_budget_mix(
        d, _BUDGET, token_col="n_tokens", source_col="source",
        order_cols=["doc_id"], weights=_MIX_W, n_shards=8,
    )
    return out.groupBy("source").agg(
        F.max("alloc_tokens").alias("alloc_tokens"),
        F.count(F.when(F.col("keep"), 1)).alias("kept_docs"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens"))).alias("kept_tokens"),
    )


# ===========================================================================
# q128 — CCNet-style boilerplate line removal
# ===========================================================================

_LINE_W = 2  # words per synthetic line
_MIN_DF = 2


@register(
    "q128_boilerplate_lines",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    lines AS (
      SELECT doc_id, source, t.i AS pos,
             array_to_string(ws[t.i*{_LINE_W}+1 : t.i*{_LINE_W}+{_LINE_W}], ' ')
               AS line
      FROM w, unnest(range(0, CAST(ceil(len(ws)/{_LINE_W}.0) AS INT))) AS t(i)
    ),
    freq AS (
      SELECT source, line, COUNT(DISTINCT doc_id) AS line_df
      FROM lines GROUP BY 1, 2
    )
    SELECT l.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(CASE WHEN f.line_df < {_MIN_DF} THEN 1 END) AS BIGINT)
             AS n_kept,
           md5(COALESCE(string_agg(
             CASE WHEN f.line_df < {_MIN_DF} THEN l.line END,
             chr(10) ORDER BY l.pos
           ), '')) AS clean_md5
    FROM lines l JOIN freq f USING (source, line)
    GROUP BY l.doc_id
    """,
)
def q128_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal gate: the flat word-soup corpus is reshaped
    into deterministic 2-word 'lines' (the corpus has no newlines, so
    line structure is manufactured identically on both sides), then
    lines repeated across >= 2 distinct docs of the same source are
    stripped and the doc rebuilt in order. The md5 of the rebuilt text
    proves order-preserving reassembly, not just counts."""
    docs = load(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull()  # mirrors the oracle's WHERE: a NULL
        # text would otherwise reshape to '' here but to zero oracle rows
    )
    ws = textops.words_of(F.col("text"))
    n_lines = F.ceil(F.size(ws) / F.lit(float(_LINE_W))).cast("int")
    lined = docs.select(
        "doc_id",
        "source",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * _LINE_W + 1, _LINE_W), " "
                ),
            ),
            "\n",
        ).alias("lined_text"),
    )
    out = textops.strip_boilerplate(
        lined, text_col="lined_text", min_df=_MIN_DF, source_col="source",
    )
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5("clean_text").alias("clean_md5")
    )


# ===========================================================================
# q129 — inverted-index posting lists with stopword elision
# ===========================================================================

_MAX_DF = 400


@register(
    "q129_postings",
    f"""
    WITH w AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               AS ws
      FROM documents
    ),
    t AS (
      SELECT doc_id, unnest(ws) AS term FROM w
    ),
    tf AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM t
      WHERE term <> '' GROUP BY 1, 2
    ),
    posts AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS cf,
             string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS plist
      FROM tf GROUP BY term
    )
    SELECT term, df, cf,
           CASE WHEN df <= {_MAX_DF} THEN md5(plist) END AS postings_md5
    FROM posts
    """,
)
def q129_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build gate: per-term df/cf plus the md5 of the
    doc_id-sorted '(doc:tf,...)' posting string; terms above the df cap
    keep stats but get NULL postings (stopword elision — the skew cap).
    The md5 proves the posting list content AND its sort order."""
    docs = load(spark, sf_dir, "documents", spread=True)
    posts = textops.build_postings(docs, text_col="text", max_df=_MAX_DF)
    plist = F.array_join(
        F.transform(
            F.col("postings"),
            lambda s: F.concat(
                s["doc_id"].cast("string"), F.lit(":"), s["tf"].cast("string")
            ),
        ),
        ",",
    )
    return posts.select(
        "term",
        "df",
        "cf",
        F.when(F.col("postings").isNotNull(), F.md5(plist)).alias(
            "postings_md5"
        ),
    )
