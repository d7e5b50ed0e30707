"""Deduplication family (north-star surface): exact, MinHash+LSH, SimHash,
n-gram Jaccard — Spark-first, deterministic, oracle-checkable.

Design notes for 100 TB:
- exact dedup is a hash aggregate on a content hash — one shuffle, the
  md5 computed map-side;
- MinHash signatures are per-row expression folds (no shuffle); LSH
  banding turns near-dup search into an equi-join on band buckets (shuffle
  keyed on bucket — the join that replaces the quadratic pair scan);
- candidate verification joins shingle sets only for candidate pairs;
- hashes are md5-string based: engine-portable, deterministic, and
  seed-parameterized (``min(md5(seed || ':' || shingle))`` is a valid
  min-wise hash family for Jaccard estimation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators.textops import norm_text, words_of

MINHASH_K = 8  # signature length
LSH_BANDS = 4  # bands of 2 rows each
SHINGLE_WORDS = 3


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content md5; keep the min doc_id as the
    canonical representative (deterministic winner)."""
    return (
        docs.groupBy(F.md5(norm_text(F.col(text_col))).alias("content_md5"))
        .agg(F.count("*").alias("copies"), F.min("doc_id").alias("keep_doc_id"))
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(docs: DataFrame, text_col: str = "text", k: int = SHINGLE_WORDS) -> DataFrame:
    """Distinct k-word shingles per document (doc_id, shingle). Documents
    shorter than k words contribute their whole normalized text."""
    w = words_of(F.col(text_col))
    n = F.size(w)
    shingles = F.when(
        n < k, F.array(norm_text(F.col(text_col)))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        )
    )
    return docs.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(shingles: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """K min-wise hashes per doc: mh_j = min(md5(j || ':' || shingle)).
    One hash aggregate; signature columns mh0..mh{k-1}."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_buckets(signatures: DataFrame, bands: int = LSH_BANDS, k: int = MINHASH_K) -> DataFrame:
    """Band the signature (rows = k/bands) and hash each band to a bucket.
    (doc_id, band, bucket)."""
    rows_per_band = k // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("bucket"),
            )
        )
    return signatures.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "e.band", "e.bucket")


def candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Docs sharing any band bucket → distinct (doc_a < doc_b) pairs —
    the LSH equi-join that replaces the O(n²) scan."""
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def pair_jaccard(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("union_n"),
            (
                F.col("inter") * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_neardups(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    exact-Jaccard verify → filter ≥ threshold."""
    sh = word_shingles(docs, text_col)
    sig = minhash_signatures(sh)
    cand = candidate_pairs(lsh_buckets(sig))
    return pair_jaccard(cand, sh).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked exact near-dup)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    block_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Character n-gram Jaccard for pairs sharing a blocking key (length
    band), exact. The blocking keeps the pair join linear-ish; at 100 TB
    swap the block key for an LSH bucket."""
    t = norm_text(F.col(text_col))
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.length(t) - (n - 1)), lambda i: t.substr(i, F.lit(n)))
    )
    g = docs.filter(F.length(t) >= n).select(
        "doc_id",
        (F.floor(F.length(t) / 50)).cast("int").alias("len_block"),
        F.explode(grams).alias("gram"),
    )
    sizes = g.groupBy("doc_id", "len_block").agg(F.count("*").alias("sz"))
    a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("len_block"), F.col("sz").alias("na"))
    b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("len_block"), F.col("sz").alias("nb"))
    pairs = a.join(b, "len_block").filter(F.col("doc_a") < F.col("doc_b"))
    ga = g.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = g.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"])
        .withColumn("jaccard", F.col("inter") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over word occurrences: per bit, sum ±1 weighted by
    the word-hash bit; fingerprint bit = sign. Word hash = first 8 md5 hex
    chars as uint32 — portable across engines. Pure expression fold."""
    w = words_of(F.col(text_col))
    hashes = F.transform(
        w, lambda word: F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")
    )
    def bit_vote(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(1) == 1, 1).otherwise(-1),
        )

    bit_cols = [
        F.when(bit_vote(i) >= 0, F.lit(1).cast("long")).otherwise(0) * F.lit(1 << i)
        for i in range(32)
    ]
    fp = sum(bit_cols[1:], start=bit_cols[0])
    return docs.select("doc_id", fp.alias("simhash"))
