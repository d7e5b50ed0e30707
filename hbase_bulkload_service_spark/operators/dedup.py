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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hbase_bulkload_service_spark import cachereg
from hbase_bulkload_service_spark.session import pinned_width
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

def shingle_arrays(docs: DataFrame, text_col: str = "text", k: int = SHINGLE_WORDS) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct k-word shingles per doc.
    Documents shorter than k words contribute their whole normalized text.

    The normalized text and word array are materialized as bound columns
    BEFORE any higher-order function touches them: Catalyst does not
    common-subexpression-eliminate across lambda boundaries, so inlining
    the regex normalization into `element_at` would re-run it per array
    element (~100× slowdown measured)."""
    base = docs.select(
        "doc_id", norm_text(F.col(text_col)).alias("nt")
    ).withColumn("ws", F.split("nt", " "))
    n = F.size("ws")
    w = F.col("ws")
    shingles = F.when(n < k, F.array(F.col("nt"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        )
    )
    return base.select("doc_id", F.array_distinct(shingles).alias("shingles"))


def word_shingles(docs: DataFrame, text_col: str = "text", k: int = SHINGLE_WORDS) -> DataFrame:
    """Exploded long form of :func:`shingle_arrays` — (doc_id, shingle).

    ``explode_outer`` on purpose: plain ``explode`` lets Catalyst infer a
    ``size(shingles) > 0`` filter from the Generate and push it below the
    scan-spreading Exchange — with the whole shingle expression INLINED
    (projection collapse + no CSE across lambdas), so every element_at
    re-runs the regex-normalize+split and the entire k-gram construction
    serializes onto the scan's partitioning (9× slower measured at sf0.1,
    one task on a single-row-group file). Shingle arrays are non-empty by
    construction (short docs contribute ``[nt]``), so outer == inner
    here and the inference is blocked."""
    return shingle_arrays(docs, text_col, k).select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    )


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


def minhash_signatures_arr(sh_arr: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Signatures from the array form — per-row `array_min(transform(...))`
    projections, NO shuffle at all (vs. the explode+groupBy form, which pays
    an exchange on doc_id). The preferred shape at scale: signatures are
    computed map-side in the same stage as the scan."""

    def mh(j: int) -> Column:
        return F.array_min(
            F.transform(
                F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))
            )
        )

    return sh_arr.select(
        "doc_id", *[mh(j).alias(f"mh{j}") for j in range(k)]
    )


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
    """Exact shingle-set Jaccard for candidate pairs (verification step).

    Scale shape: semi-join the shingle table down to candidate docs, then
    an inverted-index co-occurrence self-join on the shingle — never the
    `pairs × shingles` product (that's |pairs| × doc-size rows; the
    co-occurrence join only materializes actual shingle matches)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select("doc_b"))
        .distinct()
    )
    sh_c = shingles.join(cand_docs, "doc_id")
    sa = sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh_c.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
        .join(pairs, ["doc_a", "doc_b"])  # restrict to LSH candidates
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


def pair_jaccard_arrays(pairs: DataFrame, sh_arr: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs via `array_intersect` on the
    per-doc shingle sets: one row per pair, no per-shingle join rows.
    Right shape when |pairs| ≪ |pairs| × doc-size (LSH-verified dedup)."""
    a = sh_arr.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh_arr.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    na, nb = F.size(F.col("sh_a")), F.size(F.col("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            (na + nb - inter).alias("union_n"),
            (inter * F.lit(1.0) / (na + nb - inter)).alias("jaccard"),
        )
    )


def minhash_lsh_neardups(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    exact-Jaccard verify → filter ≥ threshold.

    Shuffle census: signatures are map-side projections (no exchange);
    the only data-sized shuffles are the LSH band-bucket self-join and the
    two pair→array joins — all keyed, all AQE-coalesced. The shingle-array
    table is persisted: signatures and verification both branch from it."""
    arr = shingle_arrays(docs, text_col).persist()
    # bounded release path for long-lived sessions (same contract as the
    # incremental_dedup/containment families): without registration every
    # call leaks one persisted shingle table until the session dies
    cachereg.register(arr, family="minhash")
    sig = minhash_signatures_arr(arr)
    cand = candidate_pairs(lsh_buckets(sig))
    return pair_jaccard_arrays(cand, arr).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked exact near-dup)
# ---------------------------------------------------------------------------

# rare-gram blocking cap: index only grams appearing in ≤ this many docs.
# Governs candidate volume (Σ df² over indexed grams); 10 keeps candidates
# near-linear in corpus size even on template-heavy corpora where median
# gram DF is high. Recall: near-dups share doc-specific (rare) grams.
NGRAM_DF_MAX = 10


def gram_arrays(docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """(doc_id, len_block, grams: array<string>) — distinct character
    n-grams of the normalized text.

    Gram slicing runs in an Arrow-batched pandas UDF: a per-character
    Catalyst `transform(sequence(...), substr)` is interpreted per element
    (~4× slower measured); one Python set-comprehension per doc over the
    Arrow batch is the cheaper path. Array ORDER is arbitrary (set
    iteration) — every consumer is order-independent (explode,
    array_intersect sizes); sorting here measurably costs ~20% of the
    whole UDF at 2k grams/doc and buys nothing."""

    @pandas_udf("array<string>")
    def slice_grams(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: list({s[i : i + n] for i in range(len(s) - (n - 1))})
        )

    base = docs.select("doc_id", norm_text(F.col(text_col)).alias("nt")).filter(
        F.length("nt") >= n
    )
    return base.select(
        "doc_id",
        (F.floor(F.length("nt") / 50)).cast("int").alias("len_block"),
        slice_grams(F.col("nt")).alias("grams"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    df_max: int = NGRAM_DF_MAX,
) -> DataFrame:
    """Character n-gram Jaccard near-dup pairs with rare-gram blocking.

    Candidate pairs = same length band AND ≥1 shared gram whose document
    frequency in that band is ≤ df_max; candidates then get EXACT Jaccard
    over the full gram sets (array_intersect). The DF cap is the classic
    blocking move: common grams (' the ' appears in every doc) generate
    df² candidate rows but zero selectivity — dropping them from the
    *index* (never from the verified sets) bounds the join at
    Σ_{df≤cap} df² instead of Σ df². Near-dups share doc-specific grams,
    so recall loss is negligible at any realistic threshold."""
    # persist the array table and the rare-gram index: the candidate
    # self-join and the two verify joins are branches over the SAME
    # sub-DAG, and aliased branches defeat Spark's ReuseExchange — without
    # persist the gram explode is recomputed once per branch (~8×)
    garr = gram_arrays(docs, text_col, n).persist()
    g = garr.select("doc_id", "len_block", F.explode("grams").alias("gram"))
    rare = (
        g.groupBy("len_block", "gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_max)
        .select("len_block", "gram")
    )
    gr = g.join(rare, ["len_block", "gram"]).persist()
    # bounded release path (see cachereg): caps long-session storage
    cachereg.register(garr, gr, family="ngram")
    # candidate pairs carry their rare-gram co-occurrence count for free
    # (groupBy replaces distinct at the same shuffle cost)
    cand = (
        gr.alias("a")
        .join(gr.alias("b"), ["len_block", "gram"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter_rare"))
    )
    # lossless prune BEFORE the expensive array join: a pair's intersection
    # is at most inter_rare + min(common_a, common_b), where common = grams
    # above the DF cap; if even that bound can't reach the threshold, skip.
    # Cuts the array-shuffle volume ~100× with identical output.
    stats = garr.select(
        "doc_id", F.size("grams").alias("n")
    ).join(
        gr.groupBy("doc_id").agg(F.count("*").alias("n_rare")), "doc_id", "left"
    ).na.fill({"n_rare": 0}).withColumn("n_common", F.col("n") - F.col("n_rare"))
    sa = stats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("n_common").alias("ca"),
    )
    sb = stats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("n_common").alias("cb"),
    )
    ub = F.col("inter_rare") + F.least(F.col("ca"), F.col("cb"))
    # explicit numbered repartition of the surviving pairs: they are
    # BYTE-small (AQE coalesces the whole downstream verify onto ONE
    # partition — measured as a 2.2 s single-task stage at sf0.1, the
    # q69 trap's CPU-shaped sibling) but each pair costs an
    # array_intersect over thousand-gram arrays, and the verify joins
    # broadcast garr onto THIS stream's partitioning. A user-specified
    # partition count is exempt from AQE coalescing, so the verify
    # compute spreads across the cluster.
    pruned = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(ub * F.lit(1.0) / (F.col("na") + F.col("nb") - ub) >= threshold)
        .select("doc_a", "doc_b")
        .repartition(pinned_width(docs.sparkSession), "doc_a", "doc_b")
    )
    a = garr.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a"))
    b = garr.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("g_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    na, nb = F.size(F.col("g_a")), F.size(F.col("g_b"))
    return (
        pruned.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            na.alias("na"),
            nb.alias("nb"),
            (inter * F.lit(1.0) / (na + nb - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over word occurrences: per bit, sum ±1 weighted by
    the word-hash bit; fingerprint bit = sign. Word hash = first 8 md5 hex
    chars as uint32 — portable across engines.

    Physical shape: explode words → hash each word ONCE → single
    whole-stage-codegen hash aggregate with 32 conditional sums (partial
    agg map-side, one shuffle on doc_id). The array-fold alternative
    (32 interpreted HOF folds, each re-hashing every word) is ~10× slower."""
    wh = docs.select(
        "doc_id", F.explode(words_of(F.col(text_col))).alias("word")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    votes = wh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    bit_cols = [
        F.when(F.col(f"b{i}") >= 0, F.lit(1).cast("long")).otherwise(0) * F.lit(1 << i)
        for i in range(32)
    ]
    fp = sum(bit_cols[1:], start=bit_cols[0])
    return votes.select("doc_id", fp.alias("simhash"))


# ---------------------------------------------------------------------------
# cluster resolution — pairs → connected components → canonical doc
# ---------------------------------------------------------------------------

def neardup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Resolve verified near-dup PAIRS into clusters and pick a canonical
    representative — the step that turns pair detection into an actionable
    dedup decision (pairs alone over-delete: {A~B, B~C} must keep exactly
    one of {A,B,C}, not "drop the right side of every pair").

    Connected components by iterative min-label propagation: every node
    starts as its own component; each round every node takes the min label
    among itself and its neighbors; converged when no label changes.
    Output: (doc_id, cluster_id = min doc_id in component, cluster_size,
    is_canonical).

    100 TB posture: each round is ONE keyed shuffle (edge⋈label join +
    min-aggregate); rounds needed = graph diameter, and near-dup clusters
    are near-cliques (diameter 2-3), so this settles in ~3 rounds where
    generic graphs would need the alternating large-star/small-star
    variant. ``localCheckpoint`` truncates the per-round lineage so plan
    size stays O(1) across iterations; the convergence probe is a
    LIMIT-1 existence check, not a full count."""
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .persist()
    )
    # Round-1 state computed directly: comp = min(node, neighbors) — one
    # aggregate instead of an identity round + join (saves a full
    # join+checkpoint+probe cycle; on diameter-2 near-cliques the loop
    # below then runs 1-2 rounds instead of 2-3).
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("mb")).alias("comp"),
        )
        .localCheckpoint(eager=True)
    )
    # NOTE (r09): the graph.py static-broadcast-hint pattern was tried
    # here too and REVERTED — measured q44 1.43x slower (hints on both
    # per-round joins) and still 1.12x slower with the edge-join hint
    # alone (interleaved A/B vs the pre-change commit, min-of-4). Unlike
    # graph.py's lazy-checkpoint loops, labels here is EAGER-checkpointed
    # each round, and the forced per-round broadcast build serializes
    # against the convergence probe's cache scan instead of overlapping
    # with it. AQE's runtime broadcast remains the right call here.
    for _ in range(max_iter):
        # min neighbor label per node (map-side-combined agg over the
        # propagated rows only — the old `labels ∪ prop` union fed the
        # same agg |V| extra rows for the identical result, since the
        # left join below folds the node's own label back in via least)
        prop_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(edges.a.alias("node"))
            .agg(F.min("comp").alias("pcomp"))
        )
        # new label + changed flag in ONE pass: least(own, neighbors-min)
        # is exactly the union-min, and the flag rides the checkpointed
        # frame so the convergence probe becomes a cache-scan
        # filter+limit (optimization r08: the old probe re-JOINED the
        # new and old label tables every round — one extra job with two
        # exchanges per round, measured as pure driver/scheduler tax on
        # diameter-2 blocking graphs).
        new = (
            labels.join(prop_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.col("pcomp")).alias("comp"),
                # null pcomp (no neighbor rows) compares NULL -> filter
                # drops it, same as "unchanged"
                (F.col("pcomp") < F.col("comp")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("__chg")).limit(1).count()
        labels = new.select("node", "comp")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"neardup_clusters did not converge within max_iter={max_iter} "
            "label-propagation rounds (component diameter exceeds max_iter); "
            "labels would be wrong — raise max_iter"
        )
    edges.unpersist()
    from pyspark.sql.window import Window

    return (
        labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id"))
        .withColumn(
            "cluster_size", F.count("*").over(Window.partitionBy("cluster_id"))
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination detection — the train/eval hygiene op: for
    each corpus document, the fraction (ppm) of its distinct k-word
    shingles that appear ANYWHERE in the benchmark set. Directional
    containment, not symmetric Jaccard: a 10k-token document that embeds
    a whole 100-token benchmark item scores low on Jaccard but is still
    contaminated.

    Output: (doc_id, n_shingles, n_contaminated, contamination_ppm).

    Scale shape: the corpus shingle stream is generated ONCE and consumed
    by a single broadcast LEFT join (benchmark sets are tiny next to a
    training corpus — the distinct benchmark shingles ship to every task,
    so the 100-TB side is never shuffled for the membership test),
    followed by ONE doc_id-keyed aggregate computing total and hit counts
    together. No cross join, no per-pair comparison, no double scan.
    ``broadcast_benchmark=False`` falls back to a plain equi-join (keyed
    shuffle, uniform keys — shingles are near-unique) for benchmark sets
    too large to broadcast.
    """
    c = word_shingles(corpus, text_col, k)
    b = (
        word_shingles(benchmark, text_col, k)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    flagged = c.join(F.broadcast(b) if broadcast_benchmark else b, "shingle", "left")
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.expr("(n_contaminated * 1000000) div n_shingles").alias(
            "contamination_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (corpus-internal repeated spans)
# ---------------------------------------------------------------------------

def positional_spans(
    docs: DataFrame, text_col: str = "text", k: int = SHINGLE_WORDS
) -> DataFrame:
    """Every k-word span occurrence per document — (doc_id, span), NOT
    distinct: exact substring dedup counts occurrences, so a span repeated
    inside one document is as duplicated as one repeated across documents.
    Documents shorter than k words contribute their whole normalized text.

    Same construction discipline as :func:`shingle_arrays`: the normalized
    text and word array are bound columns before the lambda (no CSE across
    lambda boundaries), and the explode is ``explode_outer`` to block the
    ``size(..) > 0`` inference that would inline + serialize the span
    expression below the scan-spreading Exchange (see word_shingles)."""
    base = docs.select(
        "doc_id", norm_text(F.col(text_col)).alias("nt")
    ).withColumn("ws", F.split("nt", " "))
    n = F.size("ws")
    w = F.col("ws")
    spans = F.when(n < k, F.array(F.col("nt"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        )
    )
    return base.select("doc_id", F.explode_outer(spans).alias("span"))


def span_dup_stats(
    docs: DataFrame, text_col: str = "text", k: int = SHINGLE_WORDS
) -> DataFrame:
    """Exact substring-span dedup signals — the corpus-internal twin of
    benchmark contamination, after the ExactSubstr dedup of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): a span is *duplicated* when the same k-word window
    occurs at least twice anywhere in the corpus (other documents or the
    same one). Reported per document so a curation pass can cull or trim
    high-duplication docs.

    Output: (doc_id, n_spans, dup_spans, dup_span_ppm) where dup_spans
    counts this document's span occurrences whose text occurs >= 2 times
    corpus-wide and dup_span_ppm = dup_spans * 1e6 div n_spans.

    Scale shape — three linear keyed exchanges, no pair join anywhere:
    (1) per-(doc, span-hash) occurrence counts (partial agg collapses
    within-doc repeats map-side); (2) corpus totals per span-hash over the
    already-collapsed per-doc counts; (3) the per-doc rollup. Spans are
    md5-hashed before the first exchange so shuffle rows carry a fixed
    32-byte key instead of the span text. Suffix-array ExactSubstr finds
    *maximal* repeats; fixed-k windows are its shuffle-friendly
    approximation (any repeat of length >= k words is detected)."""
    per = (
        positional_spans(docs, text_col, k)
        .groupBy("doc_id", F.md5("span").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    tot = per.groupBy("h").agg(F.sum("c").alias("tot"))
    return (
        per.join(tot, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_spans"),
            F.sum(F.when(F.col("tot") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "dup_spans"
            ),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.expr("(dup_spans * 1000000) div n_spans").alias("dup_span_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental ingest dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    jaccard_ppm: int = 500_000,
    k: int = SHINGLE_WORDS,
) -> DataFrame:
    """Dedup a NEW ingest batch against the EXISTING corpus — the shape
    every production crawl pipeline actually runs (dedup today's batch
    against yesterday's 100 TB, not the corpus against itself):

    1. exact layer — content-md5 left join against the corpus hash set;
       a hit is an ``exact_dup`` (match_doc = smallest matching corpus
       doc);
    2. near layer, exact-survivors only — MinHash-LSH band buckets of the
       batch joined against the corpus bucket index, candidates verified
       with exact shingle Jaccard; ``inter * 1e6 >= jaccard_ppm *
       union_n`` (integer algebra — no float crosses the verdict) makes
       it a ``near_dup`` (match_doc = smallest verified corpus doc);
    3. everything else is a ``keep``.

    Output: one row per new-batch doc — (doc_id, verdict, match_doc),
    verdict in {'exact_dup', 'near_dup', 'keep'}; match_doc NULL for
    keeps. Directional on purpose: batch-internal duplicates are the
    self-dedup operators' job (exact_dedup_groups / minhash_lsh_neardups)
    and flagging them here would double-drop.

    Scale shape: the corpus side never rescans raw text in steady state —
    the hash set, signatures, and band buckets are exactly the artifacts
    an ingest pipeline persists and appends to batch over batch (compute
    them here only because the operator takes raw frames); the joins are
    all keyed equi-joins (hash, then band+bucket, then shingle verify
    restricted to candidates). The batch side is small next to the
    corpus, so every per-batch structure broadcasts or shuffles cheaply.
    """
    nh = new_docs.select("doc_id", F.md5(norm_text(F.col(text_col))).alias("h"))
    ch = (
        corpus.select(
            F.md5(norm_text(F.col(text_col))).alias("h"),
            F.col("doc_id").alias("c_id"),
        )
        .groupBy("h")
        .agg(F.min("c_id").alias("exact_match"))
    )
    # ex feeds two branches (survivor filter + final verdict join); persist
    # it so the corpus-wide md5 hash-agg underneath runs once, not twice
    ex = nh.join(ch, "h", "left").select("doc_id", "exact_match").persist()
    survivors = ex.filter(F.col("exact_match").isNull()).select("doc_id")

    # each array table feeds two branches (its bucket index + its verify
    # side) — persist so the shingle construction runs once per side
    # (persist, not localCheckpoint: the DAG is shallow so truncation
    # buys nothing, and lazy checkpoints materializing inside the
    # consuming job emit spurious accumulator-update errors)
    arr_new = shingle_arrays(
        new_docs.join(survivors, "doc_id"), text_col, k
    ).persist()
    arr_cor = shingle_arrays(corpus, text_col, k).persist()
    # bounded release path for long-lived sessions (cachereg evicts the
    # oldest registrations; evicted frames recompute correctly)
    cachereg.register(ex, arr_new, arr_cor, family="incremental_dedup")
    bk_new = lsh_buckets(minhash_signatures_arr(arr_new))
    bk_cor = lsh_buckets(minhash_signatures_arr(arr_cor))
    cand = (
        bk_new.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(
            bk_cor.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # side-correct verify: doc_a resolves against the BATCH arrays and
    # doc_b against the CORPUS arrays, so overlapping id spaces between
    # batch and corpus cannot cross-wire the Jaccard inputs
    a_sh = arr_new.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b_sh = arr_cor.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    na, nb = F.size(F.col("sh_a")), F.size(F.col("sh_b"))
    ver = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            (na + nb - inter).alias("union_n"),
        )
    )
    near = (
        ver.filter(
            F.col("inter") * 1_000_000 >= F.lit(jaccard_ppm) * F.col("union_n")
        )
        .groupBy("doc_a")
        .agg(F.min("doc_b").alias("near_match"))
        .withColumnRenamed("doc_a", "doc_id")
    )
    return ex.join(near, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
        .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        F.coalesce("exact_match", "near_match").alias("match_doc"),
    )


# ---------------------------------------------------------------------------
# Edit-distance-1 fuzzy join (deletion-neighborhood record linkage)
# ---------------------------------------------------------------------------

def deletion_variants(s: Column) -> Column:
    """All strings obtainable by deleting exactly one character of ``s``,
    plus ``s`` itself — the k=1 deletion neighborhood. Two strings are
    within Levenshtein distance 1 iff their neighborhoods intersect
    (substitution: both delete the differing position; insert/delete:
    the longer side deletes the extra character and meets the shorter
    side's identity variant)."""
    n = F.length(s)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1), F.substr(s, i + 1, n)),
    )
    return F.array_distinct(F.concat(dels, F.array(s)))


def fuzzy_self_join_k1(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """Record-linkage self-join: all (a, b) id pairs (a < b) whose
    ``str_col`` values are within Levenshtein distance 1 — the
    typo/OCR-variant matcher of entity-resolution pipelines.

    Exact, not approximate: candidates come from equi-joining the k=1
    DELETION NEIGHBORHOODS (each string yields len+1 variants; two
    strings at distance <= 1 always share a variant, and the final
    ``levenshtein`` check discards the distance-2 delete+insert
    collisions the neighborhood admits). Compare: a naive theta-join on
    levenshtein(a,b) <= 1 is a cross product — BroadcastNestedLoopJoin
    over n^2 pairs — while this is linear expansion (~avg_len variants
    per row, md5-fixed-width keys) into one keyed equi-join, the same
    blocking discipline as the LSH/rare-gram/IVF families.

    Output: (id_a, id_b, dist), id_a < id_b, dist in {0, 1} (dist 0 =
    exact duplicates, reported too — drop them upstream with
    exact_dedup_groups if only typos are wanted).
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
    # xxhash64 (8-byte long), not md5 (32-char string): the variant key
    # only BLOCKS candidates and every candidate is verified exactly with
    # levenshtein below, so a hash collision can only add a candidate
    # that the verify then discards — the output is hash-independent
    # (r09, guide §2.3 narrower shuffle keys: 4x fewer key bytes through
    # the candidate join's exchanges).
    vx = base.select(
        "_id", "_s", F.explode(deletion_variants(F.col("_s"))).alias("_v")
    ).withColumn("_v", F.xxhash64("_v"))
    a = vx.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_v")
    b = vx.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_v")
    return (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
        .select("id_a", "id_b", F.levenshtein("_sa", "_sb").alias("dist"))
        .filter(F.col("dist") <= 1)
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    threshold_ppm: int = 600_000,
    df_max: int = NGRAM_DF_MAX,
) -> DataFrame:
    """Asymmetric near-SUPERSET detection: directional containment
    ``|grams(inner) ∩ grams(outer)| / |grams(inner)|`` — the quote /
    excerpt / wrapped-repost shape that symmetric Jaccard structurally
    misses (a 100-word doc quoted inside a 10k-word doc has Jaccard
    ≈ 0.01 but containment ≈ 1.0). The second detection axis of the
    ExactSubstr family (span_dedup catches verbatim spans; this catches
    high-overlap gram sets without requiring contiguity).

    Output: one row per ORDERED pair above the threshold —
    (doc_inner, doc_outer, inter, n_inner, containment_ppm), integer
    ppm so no float crosses the verdict.

    Scale shape mirrors ngram_jaccard_pairs: rare-gram blocking (global
    df ≤ df_max caps the candidate join at Σ_{df≤cap} df², immune to
    template-heavy corpora), then a LOSSLESS upper-bound prune before
    the array verify — inter ≤ inter_rare + common(inner), so a pair
    that cannot reach the threshold even in the best case never ships
    its gram arrays. Unlike the Jaccard variant there is NO length-band
    blocking: containment pairs live at wildly different lengths by
    nature, so the rare index is global. Recall trade (documented, same
    as q36): an inner doc built ENTIRELY of above-cap grams has no rare
    gram to collide on; near-supersets share doc-specific grams in
    practice. Directionality is free: candidates are generated ordered
    (a ≠ b), so both directions of an overlapping pair are scored
    independently and a symmetric near-dup simply yields two rows.
    """
    if not (0 < threshold_ppm <= 1_000_000):
        raise ValueError("threshold_ppm must be in (0, 1e6]")
    garr = gram_arrays(docs, text_col, n).persist()
    g = garr.select("doc_id", F.explode("grams").alias("gram"))
    rare = (
        g.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_max)
        .select("gram")
    )
    gr = g.join(rare, "gram").persist()
    cachereg.register(garr, gr, family="containment")
    cand = (
        gr.alias("a")
        .join(gr.alias("b"), "gram")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_inner"),
            F.col("b.doc_id").alias("doc_outer"),
        )
        .agg(F.count("*").alias("inter_rare"))
    )
    stats = (
        garr.select("doc_id", F.size("grams").alias("sz"))
        .join(
            gr.groupBy("doc_id").agg(F.count("*").alias("n_rare")),
            "doc_id",
            "left",
        )
        .na.fill({"n_rare": 0})
        .withColumn("n_common", F.col("sz") - F.col("n_rare"))
    )
    si = stats.select(
        F.col("doc_id").alias("doc_inner"),
        F.col("sz").alias("n_inner"),
        F.col("n_common").alias("c_inner"),
    )
    # lossless prune: inter <= inter_rare + common(inner) — grams of the
    # inner doc above the df cap may all be present in the outer doc,
    # rare ones beyond inter_rare cannot be
    pruned = (
        cand.join(si, "doc_inner")
        .filter(
            (F.col("inter_rare") + F.col("c_inner")) * 1_000_000
            >= F.lit(threshold_ppm) * F.col("n_inner")
        )
        .select("doc_inner", "doc_outer", "n_inner")
        # survivors are byte-small but verify-expensive: spread them out
        # explicitly (user partition counts are AQE-coalesce-exempt —
        # the q36 single-task-verify trap)
        .repartition(pinned_width(docs.sparkSession), "doc_inner", "doc_outer")
    )
    a = garr.select(
        F.col("doc_id").alias("doc_inner"), F.col("grams").alias("g_in")
    )
    b = garr.select(
        F.col("doc_id").alias("doc_outer"), F.col("grams").alias("g_out")
    )
    inter = F.size(F.array_intersect(F.col("g_in"), F.col("g_out")))
    return (
        pruned.join(a, "doc_inner")
        .join(b, "doc_outer")
        .select(
            "doc_inner",
            "doc_outer",
            inter.cast("long").alias("inter"),
            F.col("n_inner").cast("long").alias("n_inner"),
            F.expr("inter * 1000000L div n_inner").alias("containment_ppm"),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )


def split_leakage(
    docs: DataFrame,
    test_mod: int = 10,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/test split-leakage audit: near-duplicate pairs that CROSS
    the split boundary — the eval-hygiene check every benchmark release
    runs (a test document whose near-twin sits in train silently
    inflates every score; Lee et al. 2022 measured the effect on
    perplexity). The split is the standard deterministic hash split
    (md5 bucket of the id: 1-in-``test_mod`` -> test), so the audit is
    reproducible without materializing the split assignment.

    Pipeline: :func:`minhash_lsh_neardups` supplies the verified
    near-dup pairs (banded LSH candidates + exact-Jaccard verify — the
    corpus-scale path, never all-pairs); split labels are computed
    map-side from the ids on the SURVIVING pairs (no join), and pairs
    with equal labels drop. Output: (doc_a, doc_b, split_a, split_b,
    inter, union_n, jaccard) — empty is the healthy state.
    """
    if test_mod < 2:
        raise ValueError("test_mod must be >= 2")
    from hbase_bulkload_service_spark.operators.curation import hash_bucket

    def split_of(c: Column) -> Column:
        return F.when(
            hash_bucket(F.concat(F.lit("s:"), c.cast("string")), test_mod)
            == 0,
            F.lit("test"),
        ).otherwise(F.lit("train"))

    pairs = minhash_lsh_neardups(docs, text_col, threshold)
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            split_of(F.col("doc_a")).alias("split_a"),
            split_of(F.col("doc_b")).alias("split_b"),
            "inter",
            "union_n",
            "jaccard",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )


def dup_source_matrix(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — the governance rollup over the
    verified near-dup pairs: for every unordered source pair, how many
    near-duplicate document pairs connect them. This is the "which
    crawls copy which" report a curation review reads before weighting
    sources (a source whose rows mostly duplicate another adds tokens,
    not information — q155 scores sources in isolation, this exposes
    the BETWEEN-source structure), and the diagonal (same-source pairs)
    is the internal-redundancy signal.

    Pipeline: :func:`minhash_lsh_neardups` supplies the pairs (banded
    LSH + exact-Jaccard verify — never all-pairs); source labels ride
    two thin id-keyed joins onto the surviving pairs only (pair count
    << corpus at any sane threshold); least/greatest folds the pair to
    unordered before the |sources|^2-bounded rollup.
    """
    pairs = minhash_lsh_neardups(docs, text_col, threshold)
    labels = docs.select(F.col(id_col), F.col(group_col))
    return (
        pairs.join(
            labels.select(
                F.col(id_col).alias("doc_a"), F.col(group_col).alias("__ga")
            ),
            "doc_a",
        )
        .join(
            labels.select(
                F.col(id_col).alias("doc_b"), F.col(group_col).alias("__gb")
            ),
            "doc_b",
        )
        .select(
            F.least("__ga", "__gb").alias("source_a"),
            F.greatest("__ga", "__gb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def cluster_split(
    docs: DataFrame,
    n_folds: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Cluster-aware (GroupKFold-style) split assignment — the FIX for
    the leakage :func:`split_leakage` audits: folds are drawn per
    near-duplicate CLUSTER, not per document, so a test doc can never
    have a train near-twin by construction (Lee et al. 2022's
    deduplicate-across-splits recommendation, as an assignment operator
    rather than a post-hoc check).

    Pipeline: :func:`minhash_lsh_neardups` (banded LSH + exact-Jaccard
    verify — never all-pairs) → :func:`neardup_clusters` (min-label
    components); every document then takes
    ``fold = md5_bucket('f:' ‖ cluster_id) % n_folds`` — singletons are
    their own cluster (``cluster_id = doc_id``), and fold identity is a
    pure function of the cluster label, so re-runs, retries, and
    incremental additions to OTHER clusters never move a document.

    Scale shape: the cluster ledger is bounded by the near-dup docs
    (≪ corpus at sane dup rates); the docs⋈ledger join is doc_id-keyed
    and AQE broadcasts the ledger when it is small. Fold hashing is
    map-side. Output: (doc_id, cluster_id, cluster_size, fold).
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    from hbase_bulkload_service_spark.operators.curation import hash_bucket

    pairs = minhash_lsh_neardups(docs, text_col, threshold).select(
        "doc_a", "doc_b"
    )
    ledger = neardup_clusters(pairs).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    return (
        docs.select("doc_id")
        .join(ledger, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1).cast("long")).alias(
                "cluster_size"
            ),
        )
        .withColumn(
            "fold",
            hash_bucket(
                F.concat(F.lit("f:"), F.col("cluster_id").cast("string")),
                n_folds,
            ),
        )
    )
