"""Registry wave 7 (q101-q114) — corpus-internal exact substring-span
dedup (Lee et al. 2022 ExactSubstr family), SemDeDup-style semantic
dedup over embedding clusters, the deterministic training-order shuffle,
BM25-family ranked retrieval over the inverted index, incremental ingest
dedup, weighted importance resampling, edit-distance-1 fuzzy record
linkage, event-transition matrices, perceptual-hash media near-dup, BPE
vocabulary induction + tokenizer apply, zone-map file stats, and graph
analytics (triangle counts, integer-exact PageRank) over linkage graphs.

Same portability rules as the other registry files: integer ppm/micros
everywhere a float would cross the oracle boundary, identical aliases
both sides, DuckDB SUMs cast to BIGINT before they reach the pandas
fetch path (HUGEINT renders as float64 and breaks the value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.session import local_frame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import (
    curation,
    dedup,
    similarity,
    textops,
)
from hbase_bulkload_service_spark.operators import graph as graph_mod
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import (
    DOCS_NORM_CTE,
    NEARDUP_THRESHOLD_MICROS,
    NT,
    _duck_cos_micros,
)
from hbase_bulkload_service_spark.sources.tables import load

# ===========================================================================
# q101 — exact substring-span dedup (corpus-internal repeated k-word spans)
# ===========================================================================

SPAN_K = 8

_SPAN_EXPR = " || ' ' || ".join(f"ws[i + {j}]" for j in range(SPAN_K))


@register(
    "q101_span_dedup",
    f"""
    WITH {DOCS_NORM_CTE},
    sp AS (
      SELECT doc_id,
             unnest(CASE WHEN len(ws) < {SPAN_K} THEN [nt]
                         ELSE list_transform(range(1, len(ws) - {SPAN_K - 2}),
                                             i -> {_SPAN_EXPR})
                    END) AS span
      FROM w
    ),
    per AS (
      SELECT doc_id, md5(span) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM sp GROUP BY 1, 2
    ),
    tot AS (SELECT h, CAST(SUM(c) AS BIGINT) AS tot FROM per GROUP BY 1)
    SELECT per.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN tot >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS dup_spans,
           CAST(SUM(CASE WHEN tot >= 2 THEN c ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(SUM(c) AS BIGINT) AS dup_span_ppm
    FROM per JOIN tot USING (h)
    GROUP BY 1
    """,
)
def q101_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal exact substring dedup signals: per document, how
    many of its 8-word span occurrences appear >= 2 times anywhere in the
    corpus (operators/dedup.py:span_dup_stats — the shuffle-friendly
    fixed-k approximation of suffix-array ExactSubstr)."""
    return dedup.span_dup_stats(
        load(spark, sf_dir, "documents", spread=True), k=SPAN_K
    )


# ===========================================================================
# q102 — SemDeDup-style semantic dedup (cluster-blocked embedding dedup)
# ===========================================================================


@register(
    "q102_semantic_dedup",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    co AS (
      SELECT centroid_id AS coarse_id, cvec AS covec FROM (
        SELECT centroid_id, cvec,
               row_number() OVER (ORDER BY centroid_id) AS crn,
               CAST(ceil(sqrt(COUNT(*) OVER ())) AS BIGINT) AS ce
        FROM c
      ) WHERE (crn - 1) % ce = 0
    ),
    c2c AS (
      SELECT centroid_id, cvec, coarse_id FROM (
        SELECT k.centroid_id, k.cvec, o.coarse_id,
               row_number() OVER (PARTITION BY k.centroid_id
                 ORDER BY {_duck_cos_micros("k.cvec", "o.covec")} DESC,
                          o.coarse_id) AS rn
        FROM c k, co o
      ) WHERE rn = 1
    ),
    vc AS (
      SELECT vec_id, embedding, coarse_id FROM (
        SELECT e.vec_id, e.embedding, o.coarse_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_duck_cos_micros("e.embedding", "o.covec")} DESC,
                          o.coarse_id) AS rn
        FROM embeddings e, co o
      ) WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, f.centroid_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY {_duck_cos_micros("v.embedding", "f.cvec")} DESC,
                          f.centroid_id) AS rn
        FROM vc v JOIN c2c f ON f.coarse_id = v.coarse_id
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT a.vec_id AS vec_id, MIN(b.vec_id) AS dup_of
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE {_duck_cos_micros("ea.embedding", "eb.embedding")}
              >= {NEARDUP_THRESHOLD_MICROS}
      GROUP BY 1
    )
    SELECT a.vec_id, a.cell, dup.dup_of, dup.dup_of IS NULL AS keep
    FROM assign a LEFT JOIN dup USING (vec_id)
    """,
)
def q102_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdict per vector: IVF-cell-blocked lowest-id-wins
    semantic dedup at the q42 threshold
    (operators/similarity.py:semantic_dedup). Centroids follow the
    k ∝ n rule (similarity.k_for via pseudo_centroids every=50) and the
    oracle mirrors the engine's two-level coarse-quantizer assignment
    CTE-for-CTE (coarse set = every ceil(sqrt(k))-th centroid by id
    rank; both levels argmax by cos desc, id asc)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.semantic_dedup(
        emb, NEARDUP_THRESHOLD_MICROS, similarity.pseudo_centroids(emb)
    )


# ===========================================================================
# q103 — deterministic training-order shuffle
# ===========================================================================

SHUFFLE_SEED = 7
SHUFFLE_SHARDS = 64


@register(
    "q103_corpus_shuffle",
    f"""
    WITH h AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS ok
      FROM documents
    ),
    s AS (
      SELECT doc_id, ok,
             ('0x' || substr(ok, 1, 8))::BIGINT % {SHUFFLE_SHARDS} AS shard
      FROM h
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id) AS pos
    FROM s
    """,
)
def q103_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random epoch ordering of the corpus: md5
    shard + in-shard rank (operators/curation.py:deterministic_shuffle —
    one keyed exchange, per-shard parallel sorts, reproducible across
    retries)."""
    return curation.deterministic_shuffle(
        load(spark, sf_dir, "documents", spread=True).select("doc_id"),
        seed=SHUFFLE_SEED,
        n_shards=SHUFFLE_SHARDS,
    ).select("doc_id", "shard", "pos")


# ===========================================================================
# q104 — BM25-family ranked retrieval
# ===========================================================================

BM25_TERMS = ("vector", "stream", "window")
BM25_TOPK = 20

_TERM_LIST = ", ".join(f"'{t}'" for t in BM25_TERMS)


@register(
    "q104_bm25_topk",
    f"""
    WITH {DOCS_NORM_CTE},
    base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             (10 * CAST(SUM(dl) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
               AS a10
      FROM base
    ),
    tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({_TERM_LIST}) GROUP BY 1, 2
    ),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT doc_id,
             ((1000 * (n_docs - df)) // (df + 1))
               * ((1000 * 22 * a10 * tf)
                  // (10 * a10 * tf + 3 * a10 + 90 * dl)) AS contrib
      FROM tf JOIN dfs USING (term) JOIN base USING (doc_id)
      CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM contrib GROUP BY 1
    ),
    top AS (SELECT * FROM agg ORDER BY score DESC, doc_id LIMIT {BM25_TOPK})
    SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
           doc_id, score, n_terms_hit
    FROM top
    """,
)
def q104_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, integer-rational form) top-20 documents for
    a 3-term query over the inverted index
    (operators/textops.py:bm25_scores)."""
    return textops.bm25_scores(
        load(spark, sf_dir, "documents", spread=True),
        list(BM25_TERMS),
        top_k=BM25_TOPK,
    )


# ===========================================================================
# q105 — incremental ingest dedup (new batch vs existing corpus)
# ===========================================================================

INC_JACCARD_PPM = 500_000

from hbase_bulkload_service_spark.registry_llm import _sh_cte  # noqa: E402


def _bands_sql(src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || ',' || mh{2 * b + 1})"
        f" AS bucket FROM {src}"
        for b in range(dedup.LSH_BANDS)
    )


from hbase_bulkload_service_spark.registry_llm import (  # noqa: E402
    _SIG_COLS as _SIG_COLS_W7,
)


@register(
    "q105_incremental_dedup",
    f"""
    WITH {DOCS_NORM_CTE},
    nd AS (SELECT doc_id, nt, ws FROM w WHERE doc_id % 10 = 7),
    cd AS (SELECT doc_id, nt, ws FROM w WHERE doc_id % 10 <> 7),
    ch AS (SELECT md5(nt) AS h, MIN(doc_id) AS exact_match FROM cd GROUP BY 1),
    ex AS (
      SELECT n.doc_id, ch.exact_match
      FROM (SELECT doc_id, md5(nt) AS h FROM nd) n LEFT JOIN ch USING (h)
    ),
    surv AS (SELECT doc_id, nt, ws FROM nd
             WHERE doc_id IN (SELECT doc_id FROM ex WHERE exact_match IS NULL)),
    {_sh_cte("surv").replace("sh AS", "sh_n AS")},
    {_sh_cte("cd").replace("sh AS", "sh_c AS")},
    sig_n AS (SELECT doc_id, {_SIG_COLS_W7} FROM sh_n GROUP BY doc_id),
    sig_c AS (SELECT doc_id, {_SIG_COLS_W7} FROM sh_c GROUP BY doc_id),
    bk_n AS ({_bands_sql("sig_n")}),
    bk_c AS ({_bands_sql("sig_c")}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk_n a JOIN bk_c b ON a.band = b.band AND a.bucket = b.bucket
    ),
    szn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh_n GROUP BY 1),
    szc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh_c GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM cand c
      JOIN sh_n sa ON sa.doc_id = c.doc_a
      JOIN sh_c sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    near AS (
      SELECT doc_a AS doc_id, MIN(doc_b) AS near_match
      FROM inter i
      JOIN szn ON szn.doc_id = i.doc_a
      JOIN szc ON szc.doc_id = i.doc_b
      WHERE i.inter * 1000000 >= {INC_JACCARD_PPM} * (szn.n + szc.n - i.inter)
      GROUP BY 1
    )
    SELECT ex.doc_id,
           CASE WHEN ex.exact_match IS NOT NULL THEN 'exact_dup'
                WHEN near.near_match IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           COALESCE(ex.exact_match, near.near_match) AS match_doc
    FROM ex LEFT JOIN near USING (doc_id)
    """,
)
def q105_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: docs with doc_id % 10 = 7 play the new
    batch, the rest the existing corpus; exact-hash layer then
    MinHash-LSH near layer, integer-Jaccard verdicts
    (operators/dedup.py:incremental_dedup)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    return dedup.incremental_dedup(
        batch, corpus, jaccard_ppm=INC_JACCARD_PPM
    )


# ===========================================================================
# q106 — quality-weighted importance resampling
# ===========================================================================

WS_SEED = 11


@register(
    "q106_weighted_sample",
    f"""
    WITH wgt AS (
      SELECT doc_id, lang, n_chars,
             LEAST(1000000, CAST(n_chars AS BIGINT) * 4000) AS weight_ppm,
             ('0x' || substr(md5('{WS_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, n_chars, weight_ppm
    FROM wgt WHERE bucket < weight_ppm
    """,
)
def q106_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance resampling: keep probability scales
    with document length (weight_ppm = min(1e6, n_chars * 4000)) via the
    deterministic md5 bucket (operators/curation.py:weighted_sample —
    zero-shuffle map filter; retries/reruns keep the identical subset)."""
    docs = load(spark, sf_dir, "documents")
    w = F.least(F.lit(1_000_000), F.col("n_chars").cast("long") * 4000)
    return curation.weighted_sample(docs, w, seed=WS_SEED).select(
        "doc_id", "lang", "n_chars", w.alias("weight_ppm")
    )


# ===========================================================================
# q107 — edit-distance-1 fuzzy self-join (deletion-neighborhood linkage)
# ===========================================================================


@register(
    "q107_fuzzy_linkage",
    """
    WITH v AS (
      SELECT c_custkey AS id, c_name AS s,
             md5(unnest(list_distinct(list_append(
               list_transform(range(1, length(c_name) + 1),
                              i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
               c_name)))) AS var
      FROM customer
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           levenshtein(a.s, b.s) AS dist
    FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
    WHERE levenshtein(a.s, b.s) <= 1
    """,
)
def q107_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join on customer names: all pairs
    within Levenshtein distance 1, blocked EXACTLY by k=1 deletion
    neighborhoods — linear variant expansion + one keyed equi-join, no
    cross product (operators/dedup.py:fuzzy_self_join_k1)."""
    cust = load(spark, sf_dir, "customer", spread=True)
    return dedup.fuzzy_self_join_k1(cust, "c_custkey", "c_name")


# ===========================================================================
# q108 — first-order event-transition matrix (user-journey profile)
# ===========================================================================


@register(
    "q108_event_transitions",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
      FROM events
    ),
    nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts_ms, event_id
             ) AS to_type
      FROM e
    ),
    t AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, cnt,
           cnt * 1000000
             // CAST(SUM(cnt) OVER (PARTITION BY from_type) AS BIGINT)
             AS share_ppm
    FROM t
    """,
)
def q108_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of per-user event sequences with
    per-from-state integer-ppm shares
    (operators/analytics.py:event_transitions)."""
    from hbase_bulkload_service_spark.operators import analytics
    from hbase_bulkload_service_spark.sources.tables import load_events

    return analytics.event_transitions(load_events(spark, sf_dir, spread=True))


# ===========================================================================
# q109 — perceptual-hash near-dup pairs (image-dedup family)
# ===========================================================================

_CODES = (
    "list_transform(range(1, length(text) + 1),"
    " i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))"
)
_LSUM = "list_reduce(list_prepend(CAST(0 AS BIGINT), {lst}), (a, b) -> a + b)"

from hbase_bulkload_service_spark.operators.multimodal import (  # noqa: E402
    PHASH_BANDS,
    PHASH_MIN_BAND_BITS,
    PHASH_SLACK_BITS,
)

# cell g = k*bb + j (band k, in-band bit j), nc = PHASH_BANDS*bb cells
_PHASH_CELL = (
    "CASE WHEN (((k * bb + j) + 1) * L) // nc > ((k * bb + j) * L) // nc"
    " AND "
    + _LSUM.format(
        lst="codes[((k * bb + j) * L) // nc + 1"
        " : (((k * bb + j) + 1) * L) // nc]"
    )
    + " * L > total * ((((k * bb + j) + 1) * L) // nc"
    " - ((k * bb + j) * L) // nc)"
    " THEN CAST(1 AS BIGINT) << j ELSE 0 END"
)
_PHASH_HAM = _LSUM.format(
    lst=f"list_transform(range(1, {PHASH_BANDS + 1}),"
    " i -> CAST(bit_count(xor(ba[i], bb2[i])) AS BIGINT))"
)


@register(
    "q109_phash_neardups",
    f"""
    WITH nb AS MATERIALIZED (
      SELECT CAST(greatest({PHASH_MIN_BAND_BITS},
                           ceil(log2(COUNT(*))) + {PHASH_SLACK_BITS})
                  AS BIGINT) AS bb,
             CAST({PHASH_BANDS} * greatest({PHASH_MIN_BAND_BITS},
                           ceil(log2(COUNT(*))) + {PHASH_SLACK_BITS})
                  AS BIGINT) AS nc
      FROM documents
    ),
    c AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS L, {_CODES} AS codes
      FROM documents
    ),
    t AS (SELECT doc_id, L, codes, {_LSUM.format(lst="codes")} AS total FROM c),
    ph AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, {PHASH_BANDS}), k ->
               {_LSUM.format(lst=f"list_transform(range(0, bb), j -> {_PHASH_CELL})")})
               AS bs
      FROM t, nb
    ),
    bands AS (
      SELECT doc_id, bs, b AS band, bs[b + 1] AS val
      FROM ph, unnest({list(range(PHASH_BANDS))}) AS u(b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.bs AS ba, b.bs AS bb2
      FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
                               AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b, CAST({_PHASH_HAM} AS INT) AS hamming FROM pairs
    ) WHERE hamming <= 3
    """,
)
def q109_phash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate image pairs over the binary media
    column: integer aHash (cross-multiplied threshold — no float),
    multi-index Hamming blocking with the band width DERIVED from corpus
    size (multimodal.phash_band_bits_for: 2^band_bits >= 4n keeps random
    band collisions <= n/4 per band; pigeonhole-exact for distance <= 3
    at ANY width), per-band bit_count verify
    (operators/multimodal.py:phash_signature / phash_neardups; ASCII
    corpus => byte values == codepoints, so the oracle recomputes the
    banded hash from text with the same derived width)."""
    from hbase_bulkload_service_spark.operators import multimodal

    media = multimodal.attach_media(load(spark, sf_dir, "documents", spread=True))
    return multimodal.phash_neardups(media, max_hamming=3)


# ===========================================================================
# q110 — BPE vocabulary induction (oracle: 12 merge rounds unrolled as CTEs)
# ===========================================================================

# The oracle's merge-apply step encodes a symbol sequence as
# SEP2·sym·SEP2·sym·…·SEP2 (SEP = chr(1), absent from the ASCII corpus;
# SEP2 = SEP·SEP) and replaces SEP·l·SEP2·r·SEP with SEP·l·r·SEP.
# DuckDB's replace() scans left-to-right over non-overlapping
# occurrences — exactly the engine's greedy fold (_merge_pair):
# * boundary-safe: a match needs l preceded by a single SEP and followed
#   by SEP2, which in the normalized encoding forces l (and symmetrically
#   r) to be a FULL symbol, never a symbol suffix/prefix;
# * chain-safe: each match consumes one SEP from each flanking SEP2 run
#   and the replacement restores both, so the result stays normalized and
#   an adjacent occurrence still matches ([a,a,a,a] -> [aa,aa],
#   [a,a,a] -> [aa,a] — pinned in tests/test_wave7.py).
_BPE_N = 12
_SEP = "chr(1)"
_SEP2 = "(chr(1) || chr(1))"


def _bpe_round_ctes(n_rounds: int) -> str:
    """CTE chain learning ``n_rounds`` sequential BPE merges: w0 is the
    weighted distinct-word symbol table; each round k counts adjacent
    pairs (every adjacency, weighted by word count), takes the argmax
    with the engine's exact tie-break (count DESC, l ASC, r ASC; count
    >= 2), and applies it via the replace() encoding above. An empty
    r{k} (no pair repeats) empties w{k} via the cross join, so later
    rounds yield no merge rows — the engine's early ``break``."""
    parts = [
        f"""t AS MATERIALIZED (SELECT {NT} AS nt FROM documents),
    wd AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(nt, ' ')) AS word FROM t)
      WHERE word <> '' GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT cnt,
             list_append(string_split(word, ''), '</w>') AS syms
      FROM wd
    )"""
    ]
    for k in range(1, n_rounds + 1):
        parts.append(f"""r{k} AS MATERIALIZED (
      SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT syms[i] AS l, syms[i + 1] AS r, cnt
        FROM (SELECT cnt, syms,
                     unnest(generate_series(1, len(syms) - 1)) AS i
              FROM w{k - 1})
      )
      GROUP BY l, r HAVING SUM(cnt) >= 2
      ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
    )""")
        parts.append(f"""w{k} AS MATERIALIZED (
      SELECT cnt, parts[2:len(parts) - 1] AS syms FROM (
        SELECT w.cnt,
               str_split(
                 replace({_SEP2} || array_to_string(w.syms, {_SEP2}) || {_SEP2},
                         {_SEP} || m.l || {_SEP2} || m.r || {_SEP},
                         {_SEP} || m.l || m.r || {_SEP}),
                 {_SEP2}) AS parts
        FROM w{k - 1} w, r{k} m
      )
    )""")
    return ",\n    ".join(parts)


_BPE_MERGES_SQL = (
    "WITH "
    + _bpe_round_ctes(_BPE_N)
    + "\n    "
    + "\n    UNION ALL ".join(
        f'SELECT CAST({k} AS INTEGER) AS "rank", l AS "left",'
        f' r AS "right", pair_count FROM r{k}'
        for k in range(1, _BPE_N + 1)
    )
)


@register("q110_bpe_merges", _BPE_MERGES_SQL)
def q110_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 12 BPE merges learned from the corpus
    (operators/textops.py:bpe_merges). The merge loop is iterative with
    a data-dependent argmax each round; the oracle unrolls the 12 rounds
    as chained CTEs (same device as q114 PageRank / q118 k-means /
    q121 CC) with a separator-encoded replace() reproducing the greedy
    fold exactly (see _bpe_round_ctes). Exactness is additionally pinned
    in tests/test_wave7.py against a plain-Python reference (weighted
    counts, tie-breaks, overlap semantics). batch=8/exact=True exercises
    the batched scale path — provably identical output to the sequential
    walk the oracle unrolls (_pick_safe_batch docstring carries the
    argument), fewer driver rounds."""
    return textops.bpe_merges(
        load(spark, sf_dir, "documents", spread=True),
        n_merges=12,
        batch=8,
        exact=True,
    )


# ===========================================================================
# q111 — BPE encode (apply learned merges; oracle re-learns + applies)
# ===========================================================================

_BPE_ENCODE_SQL = (
    "WITH "
    + _bpe_round_ctes(_BPE_N)
    + f""",
    dw AS MATERIALIZED (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split({NT}, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    v0 AS MATERIALIZED (
      SELECT word,
             {_SEP2} || array_to_string(
               list_append(string_split(word, ''), '</w>'), {_SEP2})
                     || {_SEP2} AS s
      FROM (SELECT DISTINCT word FROM dw)
    ),
    """
    + ",\n    ".join(
        f"""v{k} AS MATERIALIZED (
      SELECT v.word,
             CASE WHEN m.l IS NULL THEN v.s
                  ELSE replace(v.s,
                               {_SEP} || m.l || {_SEP2} || m.r || {_SEP},
                               {_SEP} || m.l || m.r || {_SEP}) END AS s
      FROM v{k - 1} v LEFT JOIN r{k} m ON TRUE
    )"""
        for k in range(1, _BPE_N + 1)
    )
    + f""",
    enc AS MATERIALIZED (
      SELECT word, len(str_split(s, {_SEP2})) - 2 AS n_tok FROM v{_BPE_N}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_tok) AS BIGINT) AS n_tokens,
           CAST((SUM(e.n_tok) * 1000000) // COUNT(*) AS BIGINT)
             AS tokens_per_word_ppm
    FROM dw JOIN enc e USING (word) GROUP BY doc_id
    """
)


@register("q111_bpe_encode", _BPE_ENCODE_SQL)
def q111_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the q110-learned merge table and report
    per-document token counts + tokens/word ppm
    (operators/textops.py:bpe_encode — merges are driver metadata bound
    into a pure-map fold chain over the DISTINCT-WORD table; no shuffle
    before the output agg). The oracle re-learns the 12 merges with
    q110's CTE chain, then applies them in rank order to the distinct
    vocabulary with the same replace() encoding (LEFT JOIN ON TRUE so a
    merge-starved corpus no-ops the round instead of emptying the
    vocabulary) and aggregates per document. Apply-step exactness is
    also pinned in tests/test_wave7.py against the Python reference."""
    docs = load(spark, sf_dir, "documents", spread=True)
    merges = textops.bpe_merges(docs, n_merges=12, batch=8, exact=True)
    return textops.bpe_encode(docs, merges)


# ===========================================================================
# q112 — file-skipping stats manifest (zone map) over a written layout
# ===========================================================================


@register(
    "q112_file_stats",
    """
    SELECT l_returnflag AS rf,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_l_orderkey,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_l_orderkey,
           CAST(MIN(FLOOR(l_extendedprice * 100)) AS BIGINT) AS min_cents,
           CAST(MAX(FLOOR(l_extendedprice * 100)) AS BIGINT) AS max_cents
    FROM lineitem GROUP BY 1
    """,
)
def q112_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map manifest end-to-end: write lineitem partitioned by
    return flag (one file per partition), build the per-file stats
    manifest from the REAL files with
    operators/maintenance.py:collect_file_stats, key it back by the
    partition value — the oracle recomputes the same stats straight
    from the source table, proving manifest == data."""
    import shutil
    import tempfile

    from hbase_bulkload_service_spark.operators import maintenance

    li = load(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_returnflag",
    )
    d = tempfile.mkdtemp(prefix="q112zonemap")
    try:
        li.repartition("l_returnflag").write.partitionBy(
            "l_returnflag"
        ).mode("overwrite").parquet(d)
        manifest = maintenance.collect_file_stats(
            spark, d, ["l_orderkey", "cents"]
        )
        rows = manifest.select(
            F.regexp_extract("file", r"l_returnflag=([^/]+)", 1).alias("rf"),
            "n_rows",
            "min_l_orderkey",
            "max_l_orderkey",
            F.col("min_cents").alias("min_cents"),
            F.col("max_cents").alias("max_cents"),
        ).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_frame(spark,
        rows,
        "rf string, n_rows long, min_l_orderkey long, max_l_orderkey long,"
        " min_cents long, max_cents long",
    )


# ===========================================================================
# q113 — per-node triangle counts over the fuzzy-linkage graph
# ===========================================================================

# shared with q149 (registry_wave13) via the registry-independent
# oracle_frags module (circular-import-proof — see its module docstring)
from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    FUZZY_EDGES_CTE as _FUZZY_EDGES_CTE,
)


@register(
    "q113_triangle_counts",
    f"""
    WITH {_FUZZY_EDGES_CTE},
    t AS (
      SELECT e1.x AS n1, e1.y AS n2, e2.y AS n3
      FROM e e1
      JOIN e e2 ON e2.x = e1.y
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    ),
    c AS (
      SELECT n1 AS node FROM t
      UNION ALL SELECT n2 FROM t
      UNION ALL SELECT n3 FROM t
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM c GROUP BY 1
    """,
)
def q113_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the q107 near-identical-name graph —
    duplicate-clique detection (triangle-dense neighborhoods are true
    entity clusters; triangle-free hubs are blocking false positives).
    Engine side uses the degree-ordered orientation algorithm
    (operators/graph.py:triangle_counts — out-degree bounded ~sqrt(2m),
    hub-skew-proof); the oracle counts each x<y<z triangle once via the
    ordered 3-way join."""
    from hbase_bulkload_service_spark.operators import graph

    cust = load(spark, sf_dir, "customer", spread=True)
    pairs = dedup.fuzzy_self_join_k1(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return graph.triangle_counts(pairs)


# ===========================================================================
# q114 — integer-exact PageRank over the linkage graph (oracle unrolls the
# same fixed iterations as plain SQL — an ORACLE-GATED iterative algorithm)
# ===========================================================================

PR_ITERS = 5


def _pr_step(prev: str, nxt: str) -> str:
    return f"""
    {nxt} AS (
      SELECT e.dst AS node,
             tele + (85 * CAST(SUM({prev}.r // dg.deg) AS BIGINT)) // 100 AS r
      FROM {prev}
      JOIN dg ON dg.node = {prev}.node
      JOIN e ON e.src = {prev}.node
      CROSS JOIN tp
      GROUP BY 1, tele
    )"""


_PR_CHAIN = ",".join(_pr_step(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS))


@register(
    "q114_pagerank",
    f"""
    WITH {_FUZZY_EDGES_CTE},
    ed AS (
      SELECT x AS src, y AS dst FROM e
      UNION ALL SELECT y AS src, x AS dst FROM e
    ),
    dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM ed GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dg),
    tp AS (SELECT ((15 * CAST({graph_mod.PR_MASS} AS BIGINT) // 100) // n)
             AS tele,
           (CAST({graph_mod.PR_MASS} AS BIGINT) // n) AS r0 FROM nn),
    e2 AS (SELECT src, dst FROM ed),
    r0 AS (SELECT node, r0 AS r FROM dg CROSS JOIN tp),
    {_PR_CHAIN.replace("JOIN e ON", "JOIN e2 ON").replace("e.src", "e2.src").replace("e.dst", "e2.dst")}
    SELECT node, r AS rank_ppb FROM r{PR_ITERS}
    """,
)
def q114_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 integer-exact rounds, 85/100 damping, ppb mass) over
    the q107 near-identical-name graph — centrality-based canonical-copy
    selection (operators/graph.py:pagerank). The oracle unrolls the SAME
    five rounds as chained SQL CTEs: a fully oracle-gated iterative
    algorithm, unlike the argmax-per-round families (kmeans/BPE) where
    only rows-only checks are possible."""
    from hbase_bulkload_service_spark.operators import graph

    cust = load(spark, sf_dir, "customer", spread=True)
    pairs = dedup.fuzzy_self_join_k1(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return graph.pagerank(pairs, iters=PR_ITERS)
