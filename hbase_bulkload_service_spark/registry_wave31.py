"""Registry wave 31 (round 8) — sequence packing: the concat-then-chunk
token layout a LM training pipeline runs just before writing training
shards (documents -> one global token stream -> fixed context-length
bins). New capability beyond the reference (which stops at HBase cell
layout); the Spark shape is a distributed two-pass prefix sum (no
global-window single-task trap) — see operators/curation.pack_sequences.

Same portability rules as registry.py: integer token offsets, identical
aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import curation
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import NT
from hbase_bulkload_service_spark.sources.tables import load

_CTX = 256  # tokens per training bin

_PACK_CTE = f"""
    toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split({NT}, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents d
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    ),
    spans AS (
      SELECT doc_id, n_tokens,
             CAST(cum - n_tokens AS BIGINT) AS start_tok,
             CAST(cum AS BIGINT) AS end_tok,
             CASE WHEN n_tokens = 0 THEN NULL
                  ELSE CAST((cum - n_tokens) // {_CTX} AS BIGINT) END
               AS first_bin,
             CASE WHEN n_tokens = 0 THEN NULL
                  ELSE CAST((cum - 1) // {_CTX} AS BIGINT) END AS last_bin,
             CASE WHEN n_tokens = 0 THEN 0
                  ELSE CAST((cum - 1) // {_CTX} - (cum - n_tokens) // {_CTX}
                            + 1 AS BIGINT) END AS n_bins
      FROM c
    )
"""


@register(
    "q225_sequence_packing",
    f"WITH {_PACK_CTE} SELECT * FROM spans",
)
def q225_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing over the documents table
    (curation.pack_sequences): each document's global token span and the
    {_CTX}-token training bins it lands in, documents freely straddling
    bin boundaries (GPT-style pack). The global offset is a distributed
    prefix sum — per-part local cumsums in parallel + a <=n_parts-row
    offsets broadcast — never a single-task global window."""
    return curation.pack_sequences(
        load(spark, sf_dir, "documents", spread=True), context_len=_CTX
    )


@register(
    "q226_packed_bins",
    f"""
    WITH {_PACK_CTE},
    contrib AS (
      SELECT b.bin AS bin,
             GREATEST(start_tok, b.bin * {_CTX}) AS seg_start,
             LEAST(end_tok, (b.bin + 1) * {_CTX}) AS seg_end
      FROM spans, unnest(range(first_bin, last_bin + 1)) AS b(bin)
      WHERE n_tokens > 0
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(seg_end - seg_start) AS BIGINT) AS n_tokens
    FROM contrib GROUP BY bin
    """,
)
def q226_packed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest derived from q225's packing: per bin, how
    many documents touch it and how many tokens it holds (== {_CTX} for
    every bin except the ragged last — the invariant a shard writer
    checks before serializing). The bounded explode is
    sequence(first_bin, last_bin) — ~n_tokens/{_CTX} rows per doc, i.e.
    the output token stream itself, nothing quadratic."""
    spans = curation.pack_sequences(
        load(spark, sf_dir, "documents", spread=True), context_len=_CTX
    ).filter(F.col("n_tokens") > 0)
    seg = spans.select(
        F.explode(F.expr("sequence(first_bin, last_bin)")).alias("bin"),
        "start_tok",
        "end_tok",
    )
    return seg.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.least(F.col("end_tok"), (F.col("bin") + 1) * _CTX)
            - F.greatest(F.col("start_tok"), F.col("bin") * _CTX)
        ).cast("long").alias("n_tokens"),
    )
