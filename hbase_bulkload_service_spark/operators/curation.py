"""Corpus curation pipeline (north-star surface) — the composed
training-data funnel: language filter → quality gate → exact dedup →
near-dup cluster resolution, emitting a per-document verdict ledger.

This is the end-to-end shape a 100 TB pretraining pipeline actually runs;
the individual operators (textops, dedup) are its tested building blocks.

Design notes for 100 TB:
- lang-ID, token counting, and the content hash are FUSED into one scan
  (single select over `documents`) — no self-joins of per-doc derivations;
- the exact-dedup keeper is a window min over content_md5 (one shuffle);
- the MinHash/LSH near-dup stage runs only on exact-stage SURVIVORS (the
  funnel shrinks the expensive stage's input);
- the final verdict is a broadcast-sized left join of near-dup drops back
  onto the ledger (drop set ≪ corpus by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hbase_bulkload_service_spark.operators.dedup import (
    minhash_lsh_neardups,
    neardup_clusters,
)
from hbase_bulkload_service_spark.operators.textops import (
    lang_cols,
    norm_text,
    words_of,
)

# funnel verdicts, in decision order: a doc gets the FIRST stage it fails
VERDICTS = ("lang", "quality", "exact_dup", "near_dup", "kept")


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    keep_lang: str = "en",
    min_tokens: int = 25,
    max_tokens: int = 2000,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Per-document curation ledger: (doc_id, pred_lang, n_tokens, verdict).

    Stages (each applies only to survivors of the previous):
    1. ``lang``      — predicted language != ``keep_lang``;
    2. ``quality``   — token count outside [min_tokens, max_tokens];
    3. ``exact_dup`` — not the min-doc_id holder of its normalized-content
                       md5 among stage-2 survivors;
    4. ``near_dup``  — a non-canonical member of a verified MinHash-LSH
                       near-dup cluster among stage-3 survivors;
    5. ``kept``.
    """
    text = F.col(text_col)
    pred_lang, _hits = lang_cols(text)
    enriched = docs.select(
        "doc_id",
        text.alias(text_col),
        pred_lang.alias("pred_lang"),
        F.size(words_of(text)).cast("long").alias("n_tokens"),
        F.md5(norm_text(text)).alias("content_md5"),
    ).withColumn(
        "lang_ok", F.col("pred_lang") == keep_lang
    ).withColumn(
        "tok_ok", F.col("n_tokens").between(min_tokens, max_tokens)
    )
    # exact-dedup keeper among lang+quality survivors (one keyed shuffle)
    keeper = F.min(
        F.when(F.col("lang_ok") & F.col("tok_ok"), F.col("doc_id"))
    ).over(Window.partitionBy("content_md5"))
    enriched = enriched.withColumn(
        "exact_ok", F.col("lang_ok") & F.col("tok_ok") & (F.col("doc_id") == keeper)
    ).persist()  # ledger read twice: near-dup input + final verdict join

    survivors = enriched.filter(F.col("exact_ok")).select("doc_id", text_col)
    pairs = minhash_lsh_neardups(
        survivors, text_col=text_col, threshold=jaccard_threshold
    ).select("doc_a", "doc_b")
    near_drops = (
        neardup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id", F.lit(True).alias("near_dup"))
    )
    verdict = (
        F.when(~F.col("lang_ok"), "lang")
        .when(~F.col("tok_ok"), "quality")
        .when(~F.col("exact_ok"), "exact_dup")
        .when(F.col("near_dup").isNotNull(), "near_dup")
        .otherwise("kept")
    )
    return (
        enriched.join(F.broadcast(near_drops), "doc_id", "left")
        .select("doc_id", "pred_lang", "n_tokens", verdict.alias("verdict"))
    )
