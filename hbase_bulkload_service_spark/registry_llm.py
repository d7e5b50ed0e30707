"""Registry wave 2 — LLM-data-pipeline operators (dedup family, text
analysis, similarity search, multimodal) + maintenance catalogs, each with
a DuckDB oracle mirroring the exact same deterministic arithmetic.

Portability rules used here (see registry.py for the general ones):
- DuckDB ``regexp_replace`` needs the 'g' flag to match Spark's
  replace-all default;
- hex→int is ``conv(h,16,10)`` in Spark and ``('0x'||h)::BIGINT`` in DuckDB;
- float folds are sequential left-to-right in both engines
  (``aggregate`` with 0.0 init vs ``list_reduce`` — IEEE-identical since
  0.0 + x == x);
- float outputs are floored to integer micros, never rounded (round
  half-even vs half-up varies across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_bulkload_service_spark.session import local_frame
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.operators import dedup, multimodal, similarity, textops
from hbase_bulkload_service_spark.operators import maintenance as mnt
from hbase_bulkload_service_spark.functions.codec import epoch_millis
from hbase_bulkload_service_spark.sources.tables import load

# ---------------------------------------------------------------------------
# shared DuckDB fragments
# ---------------------------------------------------------------------------

NT = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

DOCS_NORM_CTE = f"""
t AS (SELECT doc_id, text, {NT} AS nt FROM documents),
w AS (SELECT doc_id, text, nt, string_split(nt, ' ') AS ws FROM t)
"""

def _sh_cte(src: str) -> str:
    """The 3-word-shingle CTE body over any source exposing (doc_id, nt, ws)."""
    return f"""sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) < 3 THEN [nt]
                ELSE list_transform(range(1, len(ws) - 1),
                                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
           END)) AS shingle
  FROM {src}
)"""


SHINGLES_CTE = f"""
{DOCS_NORM_CTE},
{_sh_cte("w")}
"""


def _occ(hay: str, needle: str) -> str:
    """substring occurrence count — same length arithmetic as
    textops.occurrences."""
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({hay}) - length(replace({hay}, '{esc}', ''))) / {len(needle)} AS INT)"
    )


# ===========================================================================
# q30-q34 — exact dedup + text analysis
# ===========================================================================

@register(
    "q30_dedup_exact",
    f"""
    WITH {DOCS_NORM_CTE}
    SELECT md5(nt) AS content_md5, COUNT(*) AS copies, MIN(doc_id) AS keep_doc_id
    FROM w GROUP BY md5(nt)
    """,
)
def q30_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash group (min doc_id kept)."""
    return dedup.exact_dedup_groups(load(spark, sf_dir, "documents", spread=True))


@register(
    "q31_text_stats",
    f"""
    WITH {DOCS_NORM_CTE}
    SELECT doc_id,
           length(nt) AS n_chars_norm,
           len(ws) AS n_tokens,
           (length(nt) - len(ws) + 1) * 1.0 / len(ws) AS mean_token_len,
           {_occ("text", ".")} AS n_periods,
           {_occ("text", ",")} AS n_commas,
           {_occ("' ' || nt || ' '", " the ")} + {_occ("' ' || nt || ' '", " a ")} AS stopword_hits,
           ({_occ("' ' || nt || ' '", " the ")} + {_occ("' ' || nt || ' '", " a ")}) * 1.0 / len(ws)
             AS stopword_ratio
    FROM w
    """,
)
def q31_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_stats(load(spark, sf_dir, "documents", spread=True))


_LANG_SCORE_SQL = " UNION ALL ".join(
    f"SELECT doc_id, '{lang}' AS lang, "
    + " + ".join(_occ("pt", f" {m} ") for m in markers)
    + " AS score FROM padded"
    for lang, markers in sorted(textops.LANG_MARKERS.items())
    if lang != "zh"
)


@register(
    "q32_lang_id",
    f"""
    WITH {DOCS_NORM_CTE},
    padded AS (SELECT doc_id, text, ' ' || nt || ' ' AS pt FROM w),
    scores AS ({_LANG_SCORE_SQL}),
    best AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
      FROM scores
    )
    SELECT b.doc_id,
           CASE WHEN octet_length(encode(d.text)) > length(d.text) * 2
                THEN 'zh' ELSE b.lang END AS pred_lang,
           b.score AS marker_hits
    FROM best b JOIN documents d ON d.doc_id = b.doc_id
    WHERE rn = 1
    """,
)
def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(load(spark, sf_dir, "documents", spread=True))


@register(
    "q33_token_count",
    f"""
    WITH {DOCS_NORM_CTE}
    SELECT doc_id,
           len(ws) AS ws_tokens,
           CAST(ceil(length(nt) / 4) AS BIGINT) AS bpe_est_tokens,
           length(nt) * 1.0 / len(ws) AS chars_per_token
    FROM w
    """,
)
def q33_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_counts(load(spark, sf_dir, "documents", spread=True))


@register(
    "q34_fingerprint",
    f"""
    WITH {DOCS_NORM_CTE},
    h AS (
      SELECT doc_id, nt,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(nt) + 1),
                                i -> CAST(ascii(substr(nt, i, 1)) AS BIGINT))),
               (acc, c) -> ((acc * 31 + c) % 4294967296 + 4294967296) % 4294967296
             ) AS hu
      FROM w
    )
    SELECT doc_id,
           CAST(CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END AS INT)
             AS rolling_hash,
           md5(nt) AS content_md5
    FROM h
    """,
)
def q34_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint — same 31-fold kernel as the salting hash."""
    return textops.fingerprint(load(spark, sf_dir, "documents", spread=True))


# ===========================================================================
# q35-q37 — near-dup families
# ===========================================================================

_SIG_COLS = ", ".join(
    f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(dedup.MINHASH_K)
)
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(mh{2*b} || ',' || mh{2*b+1}) AS bucket FROM sig"
    for b in range(dedup.LSH_BANDS)
)


@register(
    "q35_minhash_lsh",
    f"""
    WITH {SHINGLES_CTE},
    sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
    bk AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.inter,
           (za.n + zb.n - i.inter) AS union_n,
           i.inter * 1.0 / (za.n + zb.n - i.inter) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE i.inter * 1.0 / (za.n + zb.n - i.inter) >= 0.5
    """,
)
def q35_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures → LSH band-bucket join → exact-Jaccard verify."""
    return dedup.minhash_lsh_neardups(load(spark, sf_dir, "documents", spread=True))


@register(
    "q44_neardup_clusters",
    f"""
    WITH RECURSIVE {SHINGLES_CTE},
    sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
    bk AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE i.inter * 1.0 / (za.n + zb.n - i.inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    lab AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM lab
    """,
)
def q44_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: verified MinHash-LSH pairs → connected
    components (iterative min-label propagation) → canonical doc per
    cluster. The oracle resolves the same components with a recursive CTE."""
    docs = load(spark, sf_dir, "documents", spread=True)
    pairs = dedup.minhash_lsh_neardups(docs).select("doc_a", "doc_b")
    return dedup.neardup_clusters(pairs)


@register(
    "q45_corpus_curation",
    f"""
    WITH RECURSIVE {DOCS_NORM_CTE},
    padded AS (SELECT doc_id, text, ' ' || nt || ' ' AS pt FROM w),
    scores AS ({_LANG_SCORE_SQL}),
    best AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
      FROM scores
    ),
    li AS (
      SELECT b.doc_id,
             CASE WHEN octet_length(encode(d.text)) > length(d.text) * 2
                  THEN 'zh' ELSE b.lang END AS pred_lang
      FROM best b JOIN documents d ON d.doc_id = b.doc_id
      WHERE rn = 1
    ),
    led AS (
      SELECT w.doc_id, li.pred_lang, len(w.ws) AS n_tokens, md5(w.nt) AS content_md5,
             li.pred_lang = 'en' AS lang_ok,
             len(w.ws) BETWEEN 25 AND 2000 AS tok_ok
      FROM w JOIN li ON li.doc_id = w.doc_id
    ),
    ex AS (
      SELECT *, MIN(CASE WHEN lang_ok AND tok_ok THEN doc_id END)
                  OVER (PARTITION BY content_md5) AS keeper
      FROM led
    ),
    s2 AS (SELECT doc_id FROM ex WHERE lang_ok AND tok_ok AND doc_id = keeper),
    {_sh_cte("w JOIN s2 USING (doc_id)")},
    sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
    bk AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE i.inter * 1.0 / (za.n + zb.n - i.inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    lab AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node),
    drop3 AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
    SELECT e.doc_id, e.pred_lang, e.n_tokens,
           CASE WHEN NOT e.lang_ok THEN 'lang'
                WHEN NOT e.tok_ok THEN 'quality'
                WHEN e.doc_id <> e.keeper THEN 'exact_dup'
                WHEN e.doc_id IN (SELECT doc_id FROM drop3) THEN 'near_dup'
                ELSE 'kept' END AS verdict
    FROM ex e
    """,
)
def q45_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation funnel: language filter → token-count
    quality gate → exact dedup (content-md5 keeper) → MinHash-LSH near-dup
    cluster resolution — one verdict per document."""
    from hbase_bulkload_service_spark.operators.curation import curate_corpus

    return curate_corpus(load(spark, sf_dir, "documents", spread=True))


@register(
    "q36_ngram_jaccard",
    f"""
    WITH {DOCS_NORM_CTE},
    g AS (
      SELECT doc_id,
             CAST(floor(length(nt) / 50) AS INT) AS len_block,
             unnest(list_distinct(
               list_transform(range(1, length(nt) - 3),
                              i -> substr(nt, i, 5)))) AS gram
      FROM w WHERE length(nt) >= 5
    ),
    rare AS (
      SELECT len_block, gram FROM g
      GROUP BY len_block, gram HAVING COUNT(*) <= {dedup.NGRAM_DF_MAX}
    ),
    gr AS (SELECT g.* FROM g JOIN rare USING (len_block, gram)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM gr a JOIN gr b ON a.len_block = b.len_block AND a.gram = b.gram
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN g ga ON ga.doc_id = c.doc_a
      JOIN g gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS na, sb.sz AS nb,
           i.inter * 1.0 / (sa.sz + sb.sz - i.inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.4
    """,
)
def q36_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard with rare-gram blocking (df ≤ {NGRAM_DF_MAX}
    index cap) + exact array_intersect verification."""
    return dedup.ngram_jaccard_pairs(load(spark, sf_dir, "documents", spread=True))


_SIMHASH_BITS_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {i}) & 1 = 1 "
    f"THEN 1 ELSE -1 END)) >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(32)
)


@register(
    "q37_simhash",
    f"""
    WITH {DOCS_NORM_CTE},
    sig AS (
      SELECT doc_id,
             list_transform(ws, wd -> ('0x' || substr(md5(wd), 1, 8))::BIGINT) AS hs
      FROM w
    )
    SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash FROM sig
    """,
)
def q37_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint (±1 bit votes over word hashes)."""
    return dedup.simhash32(load(spark, sf_dir, "documents", spread=True))


# ===========================================================================
# q38-q39 — similarity search
# ===========================================================================

# shared with other waves via the registry-independent oracle_frags
# module (circular-import-proof — see its module docstring)
from hbase_bulkload_service_spark.oracle_frags import (  # noqa: E402
    duck_cos_micros as _duck_cos_micros,
    duck_dot as _duck_dot,  # noqa: F401
)


@register(
    "q38_embedding_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0
    ),
    s AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_duck_cos_micros("q.qvec", "e.embedding")} AS cos_micros
      FROM q, embeddings e WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_micros FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_micros DESC, neighbor_id) AS rank
      FROM s
    ) WHERE rank <= 5
    """,
)
def q38_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (every 100th vector)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.brute_force_topk(emb, queries, k=5)


@register(
    "q39_ivf_assign",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0
    ),
    s AS (
      SELECT e.vec_id, c.centroid_id,
             {_duck_cos_micros("e.embedding", "c.cvec")} AS cos_micros
      FROM embeddings e, c
    )
    SELECT vec_id, centroid_id AS cell, cos_micros FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos_micros DESC, centroid_id) AS rn
      FROM s
    ) WHERE rn = 1
    """,
)
def q39_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment (nearest pseudo-centroid per vector)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.ivf_assign(emb, similarity.pseudo_centroids(emb))


NEARDUP_THRESHOLD_MICROS = 350000  # calibrated to the synthetic corpus
                                   # (max pairwise cos ≈ 0.51, p99.9 ≈ 0.38)


@register(
    "q42_cosine_neardup",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0
    ),
    s AS (
      SELECT e.vec_id, c.centroid_id,
             {_duck_cos_micros("e.embedding", "c.cvec")} AS cm
      FROM embeddings e, c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cm DESC, centroid_id) AS rn
        FROM s
      ) WHERE rn = 1
    )
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_duck_cos_micros("ea.embedding", "eb.embedding")} AS cos_micros
      FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ) WHERE cos_micros >= {NEARDUP_THRESHOLD_MICROS}
    """,
)
def q42_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-cell-blocked (the dedup-family
    scale path: equi-join on cell instead of an O(n²) cross product)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    return similarity.cosine_neardup_pairs(
        emb, NEARDUP_THRESHOLD_MICROS, similarity.pseudo_centroids(emb)
    )


@register(
    "q39b_ivf_topk",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0
    ),
    s AS (
      SELECT e.vec_id, c.centroid_id,
             {_duck_cos_micros("e.embedding", "c.cvec")} AS cm
      FROM embeddings e, c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cm DESC, centroid_id) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    qc AS (
      SELECT q.query_id, c.centroid_id,
             {_duck_cos_micros("q.qvec", "c.cvec")} AS qc_cos
      FROM q, c
    ),
    probe AS (
      SELECT query_id, centroid_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY qc_cos DESC, centroid_id) AS rn
        FROM qc
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             {_duck_cos_micros("q.qvec", "e.embedding")} AS cos_micros
      FROM probe p
      JOIN q USING (query_id)
      JOIN assign a ON a.cell = p.cell
      JOIN embeddings e ON e.vec_id = a.vec_id
      WHERE p.query_id <> e.vec_id
    )
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_micros FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_micros DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q39b_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probed ANN search, FULL exact oracle: with deterministic
    centroids the whole search — assignment, nprobe cell ranking, in-cell
    scoring, top-k — is reproducible SQL. The oracle replays it verbatim
    (recall<1 vs brute force is a property of the algorithm, not
    nondeterminism; the q39b-vs-q38 recall bound is pinned in tests)."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ivf_topk(emb, queries, similarity.pseudo_centroids(emb))


# ===========================================================================
# q40-q41 — multimodal columns
# ===========================================================================

@register(
    "q40_multimodal_features",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum_md5,
           CAST(doc_id % 640 + 64 AS INT) AS decoded_w,
           CAST(doc_id % 480 + 48 AS INT) AS decoded_h,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
             (a, b) -> a + b) * 1.0 / octet_length(encode(text)) AS mean_luma
    FROM documents
    """,
)
def q40_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → Arrow-batched mapInPandas feature extraction
    (decode kernel stubbed; plumbing real). ASCII corpus ⇒ byte values ==
    codepoints, so the oracle can recompute mean_luma."""
    media = multimodal.attach_media(load(spark, sf_dir, "documents", spread=True))
    return multimodal.extract_features(media)


@register(
    "q41_frame_sample",
    """
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
           CAST(LEAST(64, nb - fi * 64) AS INT) AS frame_len
    FROM (
      SELECT doc_id, octet_length(encode(text)) AS nb,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS fi
      FROM documents
    )
    """,
)
def q41_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque payloads — JVM-side binary slicing."""
    media = multimodal.attach_media(load(spark, sf_dir, "documents", spread=True))
    frames = multimodal.frame_sample(media, every_n_bytes=64)
    return frames.select(
        "doc_id", "frame_idx", F.octet_length("frame_bytes").alias("frame_len")
    )


@register(
    "q43_waveform_stats",
    """
    WITH s AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS bs
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id,
           CAST(len(bs) AS BIGINT) AS n_samples,
           CAST(list_max(bs) AS INT) AS peak,
           list_aggregate(bs, 'sum') * 1.0 / len(bs) AS mean_amp,
           sqrt(list_aggregate(list_transform(bs, x -> x * x), 'sum') * 1.0
                / len(bs)) AS rms
    FROM s
    """,
)
def q43_waveform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio multimodal: payload-as-PCM stats via numpy over Arrow batches
    (exact int accumulation ⇒ engine-stable doubles; ASCII corpus makes
    the oracle recomputable from codepoints)."""
    media = multimodal.attach_media(load(spark, sf_dir, "documents", spread=True))
    return multimodal.waveform_stats(media)


@register(
    "q46_media_resize",
    """
    WITH t AS (
      SELECT doc_id, encode(text) AS bl FROM documents WHERE doc_id % 3 = 0
    ),
    h AS (SELECT doc_id, hex(bl) AS hx, octet_length(bl) AS n FROM t),
    s AS (
      SELECT doc_id, n,
             list_transform(range(0, 256),
               k -> ('0x' || substr(hx, CAST(k * n // 256 AS INT) * 2 + 1, 2))::BIGINT)
               AS samples
      FROM h
    )
    SELECT doc_id, 16 AS out_w, 16 AS out_h, CAST(256 AS BIGINT) AS n_out,
           CAST(list_sum(samples) AS BIGINT) AS sample_sum,
           CAST(samples[1] AS INT) AS first_byte,
           CAST(samples[256] AS INT) AS last_byte
    FROM s
    """,
)
def q46_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-class multimodal operator: nearest-neighbor byte resample of
    opaque image payloads to 16x16 via mapInPandas; the oracle recomputes
    the same index map byte-for-byte over hex(payload) in SQL."""
    media = multimodal.attach_media(load(spark, sf_dir, "documents", spread=True))
    return multimodal.resize(media).drop("resized")


# ===========================================================================
# q50 — maintenance catalog queries (K3 policy over a derived region catalog)
# ===========================================================================

MAINT_NOW_MS = 1754006400000  # 2025-08-01T00:00:00Z (fixed for determinism)


def _derived_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic region catalog derived from orders (shared by the
    maintenance-policy queries)."""
    o = load(spark, sf_dir, "orders")
    o = o.withColumn("od_ms", epoch_millis(o, "o_orderdate"))
    return (
        o.groupBy((F.col("o_custkey") % 64).cast("int").alias("bucket"))
        .agg(
            F.expr("min(od_ms) div 1000").alias("start_time_sec"),
            F.expr("max(od_ms) div 1000").alias("end_time_sec"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("size_bytes"),
        )
        .select(
            F.concat(F.lit("r"), F.col("bucket")).alias("region_name"),
            F.col("bucket").alias("start_bucket"),
            F.col("bucket").alias("end_bucket"),
            "start_time_sec",
            "end_time_sec",
            "size_bytes",
        )
    )


@register(
    "q50_backup_candidates",
    f"""
    WITH regions AS (
      SELECT 'r' || CAST(o_custkey % 64 AS VARCHAR) AS region_name,
             CAST(o_custkey % 64 AS INT) AS start_bucket,
             CAST(o_custkey % 64 AS INT) AS end_bucket,
             MIN(epoch_ms(o_orderdate)) // 1000 AS start_time_sec,
             MAX(epoch_ms(o_orderdate)) // 1000 AS end_time_sec,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS size_bytes
      FROM orders GROUP BY o_custkey % 64
    )
    SELECT * FROM regions
    WHERE start_bucket = end_bucket
      AND end_time_sec * 1000 < {MAINT_NOW_MS - mnt.LONG_INTERVAL_MS}
      AND size_bytes > {mnt.BACKUP_MIN_BYTES}
    """,
)
def q50_backup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 backup qualification over a deterministic region catalog derived
    from orders (HBaseManager.backupHFileToOSS:186-263 policy)."""
    return mnt.backup_candidates(_derived_regions(spark, sf_dir), MAINT_NOW_MS)


@register(
    "q51_removal_plan",
    f"""
    WITH regions AS (
      SELECT 'r' || CAST(o_custkey % 64 AS VARCHAR) AS region_name,
             CAST(o_custkey % 64 AS INT) AS start_bucket,
             CAST(o_custkey % 64 AS INT) AS end_bucket,
             MIN(epoch_ms(o_orderdate)) // 1000 AS start_time_sec,
             MAX(epoch_ms(o_orderdate)) // 1000 AS end_time_sec,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS size_bytes
      FROM orders GROUP BY o_custkey % 64
    ),
    status AS (
      SELECT region_name,
             CASE WHEN start_bucket % 3 = 0 THEN 'SUCCEEDED'
                  WHEN start_bucket % 3 = 1 THEN 'RUNNING'
                  ELSE 'FAILED' END AS status
      FROM regions
    )
    SELECT r.* FROM regions r JOIN status s USING (region_name)
    WHERE s.status = 'SUCCEEDED'
    """,
)
def q51_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — backed-up-region removal plan (HBaseManager.removeBackupedHFile
    :268-288): joins the catalog to a deterministic DistCp status table."""
    regions = _derived_regions(spark, sf_dir)
    status = regions.select(
        "region_name",
        F.element_at(
            F.array(F.lit("SUCCEEDED"), F.lit("RUNNING"), F.lit("FAILED")),
            (F.col("start_bucket") % 3 + 1).cast("int"),
        ).alias("status"),
    )
    return mnt.removal_plan(regions, status)


MERGE_NOW_MS = 946684800000  # 2000-01-01Z: hot window covers the order dates

# the three deterministic size classes exercise every branch of the K2 walk:
# 50 MB (< lowerSize -> pending/absorbed), 1 GB (in-window merge candidate),
# 6 GB (> upperSize -> resets the pending region)
_SIZE_CLASSES = (50_000_000, 1_000_000_000, 6_000_000_000)

_MERGE_REGIONS_SQL = f"""
  SELECT 'r' || CAST(o_custkey % 64 AS VARCHAR) AS region_name,
         CAST(o_custkey % 64 AS INT) AS start_bucket,
         CAST(o_custkey % 64
              + CASE WHEN (o_custkey % 64) % 11 = 5 THEN 1 ELSE 0 END AS INT)
           AS end_bucket,
         MIN(epoch_ms(o_orderdate)) // 1000 AS start_time_sec,
         MAX(epoch_ms(o_orderdate)) // 1000 AS end_time_sec,
         [{_SIZE_CLASSES[0]}, {_SIZE_CLASSES[1]}, {_SIZE_CLASSES[2]}]
           [CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) % 3 + 1 AS INT)]
           AS size_bytes
  FROM orders GROUP BY o_custkey % 64
"""

# one step of the HBaseManager.mergeSmallRegion walk, as shared CASE arms:
# branch order mirrors maintenance.plan_merges exactly.
_W_CROSS = "o.start_bucket != o.end_bucket"
_W_ADOPT_SMALL = f"w.a_name IS NULL AND o.size_bytes < {mnt.LOWER_SIZE}"
_W_MERGE_PENDING = f"w.a_name IS NOT NULL AND w.a_size < {mnt.LOWER_SIZE}"
_W_RESET = (
    f"o.end_time_sec * 1000 < {MERGE_NOW_MS - mnt.LONG_INTERVAL_MS} "
    f"OR o.start_time_sec * 1000 > {MERGE_NOW_MS - mnt.SHORT_INTERVAL_MS} "
    f"OR o.size_bytes > {mnt.UPPER_SIZE}"
)


def _walk_case(on_cross, on_adopt, on_merge, on_reset, on_a_null, on_else) -> str:
    return f"""CASE WHEN {_W_CROSS} THEN {on_cross}
         WHEN {_W_ADOPT_SMALL} THEN {on_adopt}
         WHEN {_W_MERGE_PENDING} THEN {on_merge}
         WHEN {_W_RESET} THEN {on_reset}
         WHEN w.a_name IS NULL THEN {on_a_null}
         ELSE {on_else} END"""


@register(
    "q53_merge_plan",
    f"""
    WITH RECURSIVE regions AS ({_MERGE_REGIONS_SQL}),
    ordered AS (
      SELECT *, row_number() OVER (ORDER BY start_bucket) AS rn FROM regions
    ),
    walk(rn, a_name, a_size, merge_a, merge_b) AS (
      SELECT 0, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      UNION ALL
      SELECT o.rn,
        {_walk_case("NULL", "o.region_name", "NULL", "NULL", "o.region_name", "NULL")},
        {_walk_case("NULL", "o.size_bytes", "NULL", "NULL", "o.size_bytes", "NULL")},
        {_walk_case("NULL", "NULL", "w.a_name", "NULL", "NULL", "w.a_name")},
        {_walk_case("NULL", "NULL", "o.region_name", "NULL", "NULL", "o.region_name")}
      FROM walk w JOIN ordered o ON o.rn = w.rn + 1
    )
    SELECT merge_a AS region_a, merge_b AS region_b
    FROM walk WHERE merge_a IS NOT NULL
    """,
)
def q53_merge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — adjacent-region merge plan (HBaseManager.mergeSmallRegion:75-181)
    over a deterministic catalog derived from orders. The walk itself is a
    sequential state machine over the *region catalog* — metadata, O(regions)
    rows (thousands at 100 TB), so it runs driver-side after a distributed
    catalog aggregation; the oracle mirrors it with a recursive CTE."""
    o = load(spark, sf_dir, "orders")
    o = o.withColumn("od_ms", epoch_millis(o, "o_orderdate"))
    catalog = (
        o.groupBy((F.col("o_custkey") % 64).cast("int").alias("bucket"))
        .agg(
            F.expr("min(od_ms) div 1000").alias("start_time_sec"),
            F.expr("max(od_ms) div 1000").alias("end_time_sec"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.concat(F.lit("r"), F.col("bucket")).alias("region_name"),
            F.col("bucket").alias("start_bucket"),
            (
                F.col("bucket")
                + F.when(F.col("bucket") % 11 == 5, 1).otherwise(0)
            ).cast("int").alias("end_bucket"),
            "start_time_sec",
            "end_time_sec",
            F.element_at(
                F.array(*[F.lit(s) for s in _SIZE_CLASSES]),
                (F.col("sum_cents") % 3 + 1).cast("int"),
            ).alias("size_bytes"),
        )
        .orderBy("start_bucket")
        .collect()
    )
    regions = [
        mnt.Region(
            r.region_name,
            r.start_bucket,
            r.end_bucket,
            r.start_time_sec,
            r.end_time_sec,
            r.size_bytes,
        )
        for r in catalog
    ]
    merges = mnt.plan_merges(regions, MERGE_NOW_MS)
    return local_frame(spark, merges, "region_a string, region_b string")


@register(
    "q52_restore_plan",
    f"""
    WITH regions AS (
      SELECT 'r' || CAST(o_custkey % 64 AS VARCHAR) AS region_name,
             CAST(o_custkey % 64 AS INT) AS start_bucket,
             CAST(o_custkey % 64 AS INT) AS end_bucket,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS size_bytes
      FROM orders GROUP BY o_custkey % 64
    ),
    live AS (
      SELECT 'live' || CAST(g AS VARCHAR) AS region_name,
             CAST(g * 8 AS INT) AS start_bucket,
             CAST(g * 8 + 7 AS INT) AS end_bucket
      FROM (SELECT unnest(range(0, 8)) AS g)
    )
    SELECT 'b_' || r.region_name AS backup_name, r.start_bucket AS bucket,
           r.size_bytes, l.region_name AS target_region
    FROM regions r JOIN live l
      ON r.start_bucket >= l.start_bucket AND r.start_bucket <= l.end_bucket
    """,
)
def q52_restore_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/K6 — restore grafting plan (HbaseRepairRunner.java:41-121): map
    each backup's bucket to the live region whose range covers it."""
    regions = _derived_regions(spark, sf_dir)
    backups = regions.select(
        F.concat(F.lit("b_"), F.col("region_name")).alias("backup_name"),
        F.col("start_bucket").alias("bucket"),
        "size_bytes",
    )
    live = spark.range(8).select(
        F.concat(F.lit("live"), F.col("id")).alias("region_name"),
        (F.col("id") * 8).cast("int").alias("start_bucket"),
        (F.col("id") * 8 + 7).cast("int").alias("end_bucket"),
    )
    return mnt.restore_plan(backups, live)


# ===========================================================================
# q47-q48 — corpus subsampling + inverted-index term ranking
# ===========================================================================

SAMPLE_RATES = {"en": 250, "zh": 900}
SAMPLE_DEFAULT = 600

_RATE_CASE = (
    "CASE lang WHEN 'en' THEN 250 WHEN 'zh' THEN 900 ELSE 600 END"
)


@register(
    "q47_stratified_sample",
    f"""
    WITH hb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
               AS sample_bucket
      FROM documents
    )
    SELECT doc_id, lang, sample_bucket
    FROM hb WHERE sample_bucket < {_RATE_CASE}
    """,
)
def q47_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus subsampling (class balancing):
    keep-rate per language stratum, decided by a portable md5 hash bucket.
    Map-side filter, ZERO shuffle — the sampling shape that survives
    100 TB (see operators/curation.py:stratified_sample)."""
    from hbase_bulkload_service_spark.operators.curation import (
        hash_bucket,
        stratified_sample,
    )

    docs = load(spark, sf_dir, "documents", spread=True)
    return stratified_sample(docs, SAMPLE_RATES, SAMPLE_DEFAULT).select(
        "doc_id", "lang", hash_bucket(F.col("doc_id")).alias("sample_bucket")
    )


@register(
    "q48_distinctive_terms",
    f"""
    WITH {DOCS_NORM_CTE},
    tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    wd AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
    r AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC
             ) AS rnk
      FROM wd
    )
    SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 3
    """,
)
def q48_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by (tf DESC, df ASC, term ASC)
    over the inverted index — integer twin of tf-idf ranking (same argsort
    for any monotone idf; no float crosses the oracle)."""
    return textops.distinctive_terms(load(spark, sf_dir, "documents", spread=True))


@register(
    "q49_label_centroids",
    """
    SELECT label, CAST(pos - 1 AS INT) AS pos, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY label, pos - 1
    """,
)
def q49_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label fixed-point centroid accumulators — one Lloyd's-iteration
    reduce (the IVF/k-means training primitive) as a single keyed hash
    aggregate; integer accumulators keep the oracle exact."""
    return similarity.label_centroids(load(spark, sf_dir, "embeddings", spread=True))


# ===========================================================================
# q66 — the K2 merge walk through the DISTRIBUTED planner (plan_merges_df):
# same deterministic catalog and the same recursive-CTE oracle as q53, but
# the walk runs as the partition-parallel transfer-function scan — catalog
# rows never reach the driver (million-region posture).
# ===========================================================================

from hbase_bulkload_service_spark import registry as _registry_mod


@register(
    "q66_merge_plan_df",
    _registry_mod.ORACLE["q53_merge_plan"],
)
def q66_merge_plan_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 at catalog scale (HBaseManager.mergeSmallRegion:75-181): the
    exact walk of q53 executed by maintenance.plan_merges_df — per
    partition, the 3-tag automaton runs once per possible entry state;
    the driver composes only 3-rows-per-partition summaries. Matching
    q53's oracle proves the distributed scan is value-identical to the
    sequential walk on the driver gate, not just in unit tests."""
    o = load(spark, sf_dir, "orders")
    o = o.withColumn("od_ms", epoch_millis(o, "o_orderdate"))
    catalog = (
        o.groupBy((F.col("o_custkey") % 64).cast("int").alias("bucket"))
        .agg(
            F.expr("min(od_ms) div 1000").alias("start_time_sec"),
            F.expr("max(od_ms) div 1000").alias("end_time_sec"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.concat(F.lit("r"), F.col("bucket")).alias("region_name"),
            F.col("bucket").alias("start_bucket"),
            (
                F.col("bucket")
                + F.when(F.col("bucket") % 11 == 5, 1).otherwise(0)
            ).cast("int").alias("end_bucket"),
            "start_time_sec",
            "end_time_sec",
            F.element_at(
                F.array(*[F.lit(s) for s in _SIZE_CLASSES]),
                (F.col("sum_cents") % 3 + 1).cast("int"),
            ).alias("size_bytes"),
        )
    )
    return mnt.plan_merges_df(
        catalog, MERGE_NOW_MS,
        order_cols=("start_bucket",), num_partitions=4,
    )


# ===========================================================================
# q68/q69 — training-data segmentation + benchmark contamination
# ===========================================================================

@register(
    "q68_doc_chunks",
    f"""
    WITH {DOCS_NORM_CTE},
    c AS (SELECT doc_id, ws, len(ws) AS n FROM w),
    x AS (SELECT doc_id, ws, greatest(1, (n - 10 + 39) // 40) AS n_chunks FROM c),
    e AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_idx FROM x)
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(ws[chunk_idx*40+1 : chunk_idx*40+50]) AS INT) AS n_tok,
           md5(array_to_string(ws[chunk_idx*40+1 : chunk_idx*40+50], ' ')) AS chunk_md5
    FROM e
    """,
)
def q68_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (50-token windows, stride 40) over the whole
    documents table — pure map, no shuffle (textops.chunk_documents). The
    oracle recomputes windowing, clamped slicing, and the chunk md5 from
    the same normalization."""
    return textops.chunk_documents(
        load(spark, sf_dir, "documents", spread=True),
        chunk_tokens=50, stride=40,
    )


_SH8 = (
    "CASE WHEN len(ws) < 8 THEN [nt] ELSE list_transform(range(1, len(ws) - 6), "
    "i -> " + " || ' ' || ".join(f"ws[i+{j}]" for j in range(8)) + ") END"
)


@register(
    "q69_contamination",
    f"""
    WITH {DOCS_NORM_CTE},
    cb AS (SELECT * FROM w WHERE doc_id % 97 = 0),
    cc AS (SELECT * FROM w WHERE doc_id % 97 <> 0),
    shc AS (
      SELECT doc_id, unnest(list_distinct({_SH8})) AS shingle FROM cc
    ),
    shb AS (
      SELECT DISTINCT unnest(list_distinct({_SH8})) AS shingle FROM cb
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM shc GROUP BY doc_id),
    hit AS (
      SELECT shc.doc_id, COUNT(*) AS n_cont
      FROM shc JOIN shb USING (shingle) GROUP BY shc.doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_cont, 0) AS BIGINT) AS n_contaminated,
           CAST((COALESCE(h.n_cont, 0) * 1000000) // t.n_shingles AS BIGINT)
             AS contamination_ppm
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)
def q69_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: every 97th document plays the
    benchmark set; each remaining document reports the ppm of its
    distinct 8-word shingles found anywhere in the benchmark
    (dedup.benchmark_contamination — directional containment, ONE
    shingle-keyed equi-join, never a pair scan)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.benchmark_contamination(corpus, bench, k=8)
