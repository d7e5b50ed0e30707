"""Registry wave 27 (round 6, session 4): the split-hygiene FIX and the
layout-decision planner, plus two tokenizer/quality audits — q210
cluster-aware GroupKFold split (the assignment operator complementing
q190's leakage audit), q211 sort-key pruning planner (the
files-touched-per-probe simulation that prices a 100 TB cluster
rewrite), q212 Gini character-diversity gate (exact rational integer —
no float entropy), q213 tokenizer fertility per language (the
multilingual vocabulary-fairness readout over the q110/q111 BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import dedup, maintenance, textops
from hbase_bulkload_service_spark.registry import ORACLE as _ORACLE
from hbase_bulkload_service_spark.registry import register
from hbase_bulkload_service_spark.registry_llm import NT
from hbase_bulkload_service_spark.sources.tables import load, load_events

# ===========================================================================
# q210 — cluster-aware (GroupKFold) split assignment
# ===========================================================================

_CS_FOLDS = 5


@register(
    "q210_cluster_split",
    f"""
    WITH cl AS ({_ORACLE["q44_neardup_clusters"]}),
    a AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             COALESCE(c.cluster_size, 1) AS cluster_size
      FROM documents d LEFT JOIN cl c USING (doc_id)
    )
    SELECT doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(('0x' || substr(md5('f:' || CAST(cluster_id AS VARCHAR)),
                                1, 8))::BIGINT % {_CS_FOLDS} AS BIGINT)
             AS fold
    FROM a
    """,
)
def q210_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware GroupKFold split (operators/dedup.py:cluster_split):
    every document gets a deterministic fold, but near-dup CLUSTERS
    (q44's verified-LSH components) are assigned atomically via
    ``md5('f:' ‖ cluster_id) % {_CS_FOLDS}`` — the construction that
    makes q190's leakage audit empty by design. Singletons are their own
    cluster; the oracle nests q44's full recursive-CTE component
    resolution so the ledger and the fix can never drift."""
    return dedup.cluster_split(
        load(spark, sf_dir, "documents", spread=True), n_folds=_CS_FOLDS
    )


# ===========================================================================
# q211 — sort-key pruning planner (zone-map layout simulation)
# ===========================================================================

_LP_FILES = 64
# (probe_id, lo, hi) inclusive cent-ranges on value_cents; p3 is empty at
# sf0.001 (max 32752) and p5 everywhere — the zero-touch branch stays live
_LP_PROBES = [
    (0, 0, 499),
    (1, 2500, 2999),
    (2, 10000, 19999),
    (3, 40000, 10_000_000),
    (4, 0, 10_000_000),
    (5, -1000, -1),
]
_LP_PROBES_SQL = ", ".join(f"({p}, {lo}, {hi})" for p, lo, hi in _LP_PROBES)


@register(
    "q211_layout_pruning",
    f"""
    WITH base AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS k, event_id AS nat
      FROM events
    ),
    bounds AS (
      SELECT MIN(k) AS kmin, MAX(k) AS kmax,
             MIN(nat) AS nmin, MAX(nat) AS nmax
      FROM base
    ),
    tagged AS (
      SELECT k,
             CAST(LEAST({_LP_FILES - 1},
                  (k - kmin) * {_LP_FILES} // (kmax - kmin + 1)) AS INT)
               AS f_key,
             CAST(LEAST({_LP_FILES - 1},
                  (nat - nmin) * {_LP_FILES} // (nmax - nmin + 1)) AS INT)
               AS f_nat
      FROM base, bounds
    ),
    melted AS (
      SELECT k, 'keysorted' AS layout, f_key AS file_id FROM tagged
      UNION ALL
      SELECT k, 'natural', f_nat FROM tagged
    ),
    stats AS (
      SELECT layout, file_id, MIN(k) AS fmin, MAX(k) AS fmax,
             COUNT(*) AS n_rows
      FROM melted GROUP BY 1, 2
    ),
    per_layout AS (
      SELECT layout, COUNT(*) AS files_total FROM stats GROUP BY 1
    ),
    probes(probe_id, lo, hi) AS (VALUES {_LP_PROBES_SQL}),
    touched AS (
      SELECT s.layout, p.probe_id,
             COUNT(*) AS files_touched, SUM(s.n_rows) AS rows_scanned
      FROM stats s JOIN probes p ON s.fmin <= p.hi AND s.fmax >= p.lo
      GROUP BY 1, 2
    ),
    matched AS (
      SELECT p.probe_id, COUNT(*) AS rows_matched
      FROM base b JOIN probes p ON b.k >= p.lo AND b.k <= p.hi
      GROUP BY 1
    )
    SELECT g.layout, g.probe_id,
           CAST(g.lo AS BIGINT) AS lo, CAST(g.hi AS BIGINT) AS hi,
           CAST(g.files_total AS BIGINT) AS files_total,
           CAST(COALESCE(t.files_touched, 0) AS BIGINT) AS files_touched,
           CAST(COALESCE(t.rows_scanned, 0) AS BIGINT) AS rows_scanned,
           CAST(COALESCE(m.rows_matched, 0) AS BIGINT) AS rows_matched,
           CAST((g.files_total - COALESCE(t.files_touched, 0)) * 1000000
                // g.files_total AS BIGINT) AS skip_ppm,
           CAST(CASE WHEN COALESCE(t.rows_scanned, 0) = 0 THEN 0
                ELSE (t.rows_scanned - COALESCE(m.rows_matched, 0)) * 1000000
                     // t.rows_scanned END AS BIGINT) AS waste_ppm
    FROM (SELECT * FROM per_layout, probes) g
    LEFT JOIN touched t USING (layout, probe_id)
    LEFT JOIN matched m USING (probe_id)
    """,
)
def q211_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-key pruning planner
    (operators/maintenance.py:layout_pruning_audit): prices a cluster
    rewrite BEFORE paying its shuffle — per (layout, probe), how many
    zone-map files a range scan touches under the natural
    (insertion-order) vs value-sorted layout, plus the exact read
    amplification (rows_scanned vs rows_matched). File assignment is
    the equi-width simulation off broadcast global bounds — pure
    map-side, no global sort; one melt + one (layout, file) agg. The
    planner-level complement of q112's per-file manifest (which proves
    manifest == data on real files) and q72's z-order key (the
    multi-dimension device this planner would price)."""
    ev = load_events(spark, sf_dir, spread=True).select(
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return maintenance.layout_pruning_audit(
        ev, "value_cents", "event_id", probes=_LP_PROBES, n_files=_LP_FILES
    )


# ===========================================================================
# q212 — Gini character-diversity quality gate (exact rational, no floats)
# ===========================================================================

_CD_LOW_PPM = 920000  # measured sf0.01 span: 899945..931841 — both branches live


@register(
    "q212_char_diversity",
    f"""
    WITH c AS (
      SELECT doc_id, unnest(string_split({NT}, '')) AS ch FROM documents
    ),
    g AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM c WHERE ch <> '' GROUP BY 1, 2
    ),
    a AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS dc, SUM(c * c) AS ss,
             MAX(c) AS topc
      FROM g GROUP BY 1
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_norm,
           CAST(dc AS BIGINT) AS distinct_chars,
           CAST((n * n - ss) * 1000000 // (n * n) AS BIGINT) AS gini_ppm,
           CAST(topc * 1000000 // n AS BIGINT) AS top_char_ppm,
           (n * n - ss) * 1000000 // (n * n) < {_CD_LOW_PPM}
             AS low_diversity
    FROM a
    """,
)
def q212_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini character-diversity gate (operators/textops.py:char_diversity):
    per document, ``1 - Σ(c_i/n)²`` over the normalized character
    distribution as the exact rational ``(n² - Σc²)·1e6 // n²`` — an
    integer-exact stand-in for character entropy that catches the same
    degenerate tails (mash, padding, separator spam) with zero float
    drift; plus the distinct-char census and top-char share. Explode →
    two partial-agg levels, no joins/windows."""
    return textops.char_diversity(
        load(spark, sf_dir, "documents", spread=True), low_ppm=_CD_LOW_PPM
    )


# ===========================================================================
# q213 — tokenizer fertility per language (BPE vocabulary fairness)
# ===========================================================================


@register(
    "q213_tokenizer_fertility",
    f"""
    WITH enc AS ({_ORACLE["q111_bpe_encode"]}),
    j AS (
      SELECT d.lang, e.n_words, e.n_tokens,
             octet_length(encode(d.text)) AS nbytes
      FROM enc e JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(nbytes) AS BIGINT) AS n_bytes,
           CAST((SUM(n_tokens) * 1000000) // SUM(n_words) AS BIGINT)
             AS tokens_per_word_ppm,
           CAST((SUM(nbytes) * 1000000) // SUM(n_tokens) AS BIGINT)
             AS bytes_per_token_ppm
    FROM j GROUP BY 1
    """,
)
def q213_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit
    (operators/textops.py:tokenizer_fertility): per language, the
    corpus-level tokens-per-word and bytes-per-token ratios under the
    q110-trained BPE — the multilingual-fairness readout run before
    freezing a vocabulary (a language with high fertility pays
    disproportionate sequence length per byte of text). The oracle
    nests q111's full re-learn+apply chain so the tokenizer gate and
    the fertility gate cannot drift; ratios are truncating ppm on the
    per-language SUMS (corpus fertility, not mean-of-docs)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    merges = textops.bpe_merges(docs, n_merges=12, batch=8, exact=True)
    return textops.tokenizer_fertility(docs, merges)
