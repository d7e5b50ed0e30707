"""Multimodal columns (north-star surface): image/audio/video as opaque
binary columns + typed metadata, with Arrow-batched mapInPandas plumbing
for decode / feature-extract / resize / frame-sample.

The container has no image/audio libraries, so the *decode* kernel is a
deterministic stub (clearly marked); everything Spark-side — schema,
binary payload handling, batch iteration, UDF signatures, partitioning —
is real and tested. Swap `_decode_stub` for a PIL/libav call in a real
deployment; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<bytes: long, checksum_md5: string, declared_w: int, declared_h: int>"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum_md5 string, "
    "decoded_w int, decoded_h int, mean_luma double"
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from documents: payload = UTF-8 bytes of the
    text (deterministic fake image), metadata derived from content. At
    scale the payload column stays opaque binary in parquet — never parsed
    by the JVM, only sliced/passed to Arrow batches."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("bytes"),
            F.md5(payload).alias("checksum_md5"),
            (F.col("doc_id") % 640 + 64).cast("int").alias("declared_w"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, w: int, h: int) -> tuple[int, int, float]:
    """STUB decode kernel — deterministic fake for the missing image libs.

    Real deployment: ``img = PIL.Image.open(io.BytesIO(payload))`` etc.
    Raises (like a real decoder) on empty payloads.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("cannot decode empty payload")
    # fake luma: mean byte value — deterministic, library-free
    mean = sum(payload) / len(payload)
    return w, h, mean


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real plumbing for decode-class operators: columnar
    batches in, columnar batches out, no row-at-a-time Python."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["meta"]
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "checksum_md5": [
                    hashlib.md5(bytes(p)).hexdigest() if p is not None else None
                    for p in pdf["payload"]
                ],
            }
            decoded = [
                _decode_stub(bytes(p), m["declared_w"], m["declared_h"])
                for p, m in zip(pdf["payload"], metas)
            ]
            out["decoded_w"] = [d[0] for d in decoded]
            out["decoded_h"] = [d[1] for d in decoded]
            out["mean_luma"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload: one sample per N bytes,
    sliced JVM-side (``substring`` on binary — no Python). Yields
    (doc_id, frame_idx, frame_bytes) — the shape a video pipeline needs."""
    n_frames = F.ceil(F.octet_length("payload") / every_n_bytes).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    return media.select("doc_id", idx, F.col("payload")).select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(payload, frame_idx * {every_n_bytes} + 1, {every_n_bytes})").alias(
            "frame_bytes"
        ),
    )


WAVEFORM_SCHEMA = (
    "doc_id long, n_samples long, peak int, mean_amp double, rms double"
)


def waveform_stats(media: DataFrame) -> DataFrame:
    """Audio-family feature extraction: treat the opaque payload as 8-bit
    PCM samples and compute per-clip stats with numpy over Arrow batches
    (the vectorized path a real resample/spectrogram kernel would use —
    swap the frombuffer line for an actual audio decode in deployment).

    Sum/sum-of-squares accumulate in exact int64 before ONE float divide /
    sqrt, so results are bit-stable across engines and batch splits."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "n_samples": [], "peak": [],
                   "mean_amp": [], "rms": []}
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                n = int(arr.size)
                s = int(arr.sum(dtype=np.int64))
                sq = int((arr.astype(np.int64) ** 2).sum())
                out["n_samples"].append(n)
                out["peak"].append(int(arr.max()))
                out["mean_amp"].append(s / n)
                out["rms"].append(float(np.sqrt(sq / n)))
            yield pd.DataFrame(out)

    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    return audio.mapInPandas(batches, schema=WAVEFORM_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, n_out long, sample_sum long, "
    "first_byte int, last_byte int, resized binary"
)


def resize(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Resize-class operator over opaque image payloads: numpy
    nearest-neighbor byte resample as the STUB kernel (real deployment:
    ``PIL.Image.resize``; only the kernel line changes). Emits the resized
    payload plus an engine-portable fingerprint (sample_sum/first/last) so
    the deterministic stub is fully oracle-checkable.

    Plumbing is the real thing: Arrow batches in/out via mapInPandas, the
    payload never materializes JVM-side, output is again opaque binary +
    typed metadata — the storage shape of a 100 TB image pipeline."""
    import numpy as np

    n_out = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "out_w": out_w, "out_h": out_h,
                   "n_out": n_out, "sample_sum": [], "first_byte": [],
                   "last_byte": [], "resized": []}
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                if arr.size == 0:
                    raise ValueError("cannot resize empty payload")
                # nearest-neighbor index map (up- or down-sampling)
                idx = (np.arange(n_out, dtype=np.int64) * arr.size) // n_out
                r = arr[idx]
                out["sample_sum"].append(int(r.sum(dtype=np.int64)))
                out["first_byte"].append(int(r[0]))
                out["last_byte"].append(int(r[-1]))
                out["resized"].append(r.tobytes())
            yield pd.DataFrame(out)

    images = media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    return images.mapInPandas(batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (image-dedup family)
# ---------------------------------------------------------------------------

PHASH_BANDS = 4  # pigeonhole-exact for hamming <= 3
PHASH_MIN_BAND_BITS = 15  # floor: 32768 buckets/band even on tiny corpora
PHASH_SLACK_BITS = 2  # 2^band_bits >= 4n -> random collisions <= n/4/band
# Band width is the scale lever: with band_bits >= log2(n) + 2 the
# random band-collision term n²/2^band_bits stays <= n/4 per band —
# LINEAR in the corpus, at any corpus size. The original fixed layouts
# degenerated measurably (4-bit bands: ~82x shuffle at 10x docs; fixed
# 15-bit bands: a residual n²/32768 term the r04 probe still saw at
# 53x) — the width must be DERIVED from n, not pinned.


def phash_band_bits_for(n_docs: int) -> int:
    """Derived band width: max(15, ceil(log2(n)) + 2). Integer-exact via
    bit_length ((n-1).bit_length() == ceil(log2(n)) for n >= 2); the
    oracle mirrors it as greatest(15, ceil(log2(n)) + 2) — float log2 is
    correctly rounded and agrees with bit_length at every n (powers of
    two are exact doubles; elsewhere the true log sits > 1 ulp from the
    integer boundary at any feasible corpus size)."""
    if n_docs < 2:
        return PHASH_MIN_BAND_BITS
    return max(
        PHASH_MIN_BAND_BITS, (n_docs - 1).bit_length() + PHASH_SLACK_BITS
    )


def _phash_stub(payload: bytes, cells: int = PHASH_BANDS * PHASH_MIN_BAND_BITS) -> int:
    """STUB perceptual hash over the fake decode — the aHash recipe on
    the byte stream instead of pixels: split the payload into ``cells``
    cells, set bit j when cell j's mean byte value exceeds the global
    mean (strict, integer cross-multiplied — no float anywhere, so the
    hash is bit-identical in any engine). Real deployment: decode,
    grayscale, ``cells``-cell downsample, same thresholding — nothing
    downstream changes.
    """
    n = len(payload)
    if n == 0:
        return 0  # well-defined, unlike decode: zero cells -> all bits clear
    total = sum(payload)
    h = 0
    for j in range(cells):
        lo = j * n // cells
        hi = (j + 1) * n // cells
        if hi > lo and sum(payload[lo:hi]) * n > total * (hi - lo):
            h |= 1 << j
    return h


def _phash_bands(payload: bytes, band_bits: int) -> list[int]:
    """The hash split into PHASH_BANDS contiguous bit bands (band k =
    bits [k*band_bits, (k+1)*band_bits)) — kept as separate int64 values
    so the total width PHASH_BANDS*band_bits is NOT capped by one
    signed long (the fixed-60-bit ceiling the derived width outgrows)."""
    h = _phash_stub(payload, PHASH_BANDS * band_bits)
    mask = (1 << band_bits) - 1
    return [(h >> (band_bits * k)) & mask for k in range(PHASH_BANDS)]


def phash_signature(
    media: DataFrame,
    band_bits: int | None = None,
    corpus_size: int | None = None,
) -> DataFrame:
    """(doc_id, bands) — Arrow-batched perceptual hashing of the binary
    payload column (mapInPandas; the payload never crosses the JVM as
    anything but opaque bytes). ``bands`` is the PHASH_BANDS-element
    band-value array; width defaults to :func:`phash_band_bits_for` of
    the corpus size. Callers that know the corpus size pass it via
    ``corpus_size`` and skip the sizing job entirely; otherwise the
    count runs over an id-only projection so column pruning drops the
    payload synthesis even when ``media`` is a black-box (Python-UDF)
    upstream that a bare ``media.count()`` would fully re-evaluate
    (ADVICE r05)."""
    if band_bits is None:
        if corpus_size is None:
            corpus_size = media.select("doc_id").count()
        band_bits = phash_band_bits_for(corpus_size)
    bb = band_bits

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bands": [_phash_bands(bytes(p), bb) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema="doc_id long, bands array<long>")


def phash_neardups(
    media: DataFrame,
    max_hamming: int = 3,
    band_bits: int | None = None,
    corpus_size: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate pairs: all (a < b) with Hamming distance
    between phashes <= max_hamming — the image-dedup shape of web-scale
    crawl pipelines (near-identical images under re-encode/resize).

    EXACT for max_hamming <= PHASH_BANDS - 1 via multi-index Hamming
    blocking (pigeonhole: <= PHASH_BANDS-1 differing bits cannot touch
    all PHASH_BANDS bands, so a matching band always exists): band
    equi-join makes candidates, per-band `bit_count(xor)` verifies — no
    pair space beyond band collisions, no cross product. Band width is
    DERIVED from corpus size (:func:`phash_band_bits_for`: 2^band_bits
    >= 4n), bounding the random band-collision term n²/2^band_bits at
    n/4 per band — linear at every scale, where any FIXED width leaves
    a quadratic residual (measured: 82x shuffle at 10x docs with 4-bit
    bands; 53x with fixed 15-bit bands in the r04 probe)."""
    if max_hamming > PHASH_BANDS - 1:
        raise ValueError(
            f"blocking is exact only for max_hamming <= {PHASH_BANDS - 1}"
        )
    sig = phash_signature(media, band_bits=band_bits, corpus_size=corpus_size)
    bands = sig.select(
        "doc_id", "bands", F.posexplode("bands").alias("band", "val")
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("bands").alias("ph_a"), "band", "val"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("bands").alias("ph_b"), "band", "val"
    )
    ham = F.expr(
        "aggregate(zip_with(ph_a, ph_b, (x, y) -> bit_count(x ^ y)),"
        " 0, (acc, v) -> acc + v)"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


SHOT_SCHEMA = "doc_id long, frame_idx int, luma long"


def frame_luma(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Per-frame integer luma over the opaque payload: slice frames
    JVM-side (:func:`frame_sample`), then compute each frame's mean byte
    value ``sum(bytes) div len`` with numpy over Arrow batches — the
    decode-and-reduce kernel a real shot detector runs per frame (swap
    the frombuffer line for an actual frame decode in deployment).
    Integer division keeps the value engine-exact."""
    import numpy as np

    frames = frame_sample(media, every_n_bytes=frame_bytes)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            lumas = []
            for b in pdf["frame_bytes"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                lumas.append(int(arr.sum(dtype=np.int64)) // len(arr))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "luma": pd.Series(lumas, dtype="int64", index=pdf.index),
                }
            )

    return frames.mapInPandas(batches, SHOT_SCHEMA)


def scene_shots(
    media: DataFrame,
    frame_bytes: int = 64,
    threshold: int = 8,
) -> DataFrame:
    """Shot-boundary segmentation over the frame stream: a new shot
    starts where the frame-to-frame luma jump exceeds ``threshold``
    (the classic intensity-difference cut detector), and consecutive
    frames between boundaries group into shots via a running boundary
    count — the gaps-and-islands device (q163) on the video axis. The
    pipeline a frame-sampling stage runs BEFORE choosing which frames
    to keep: one representative frame per shot beats every-Nth-frame
    sampling for training-data coverage.

    Scale shape: frame slicing and the luma reduce are Arrow-batched
    and embarrassingly parallel; the lag + running-sum windows share
    ONE doc-keyed exchange (per-doc frame counts are bounded by payload
    size), and the per-shot rollup rides the same key. Output: one row
    per shot — (doc_id, shot_id, n_frames, first_frame, min_luma,
    max_luma).
    """
    if frame_bytes < 1 or threshold < 0:
        raise ValueError("need frame_bytes >= 1 and threshold >= 0")
    from pyspark.sql.window import Window

    lum = frame_luma(media, frame_bytes=frame_bytes)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    cut = (
        F.abs(F.col("luma") - F.lag("luma").over(w)) > threshold
    ).cast("long")
    marked = lum.withColumn("__cut", F.coalesce(cut, F.lit(0)))
    run = (
        Window.partitionBy("doc_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    shots = marked.withColumn("shot_id", F.sum("__cut").over(run))
    return shots.groupBy("doc_id", "shot_id").agg(
        F.count("*").alias("n_frames"),
        F.min("frame_idx").alias("first_frame"),
        F.min("luma").alias("min_luma"),
        F.max("luma").alias("max_luma"),
    )


def audio_trim_plan(
    media: DataFrame, frame_bytes: int = 64, threshold: int = 95
) -> DataFrame:
    """Silence-trim planning over opaque audio payloads — the
    lead-in/lead-out removal pass a speech pipeline runs before
    feature extraction (silence frames waste tokens and skew VAD
    stats): per clip, the count of leading and trailing frames whose
    mean amplitude sits below ``threshold`` and the surviving frame
    span. Emits a PLAN (offsets), not rewritten payloads — the actual
    cut is a byte slice at write time.

    Frame energies come from :func:`frame_luma`'s integer
    mean-byte-per-frame kernel (numpy over Arrow; swap in a real PCM
    decode in deployment — only the kernel line changes). The plan is
    ONE doc-keyed agg over the frame stream: min/max ACTIVE frame
    index + frame count give lead/tail/kept arithmetically — no
    windows, no sort, no second pass. All-silent clips surface as
    kept_frames = 0 with the full span as lead trim.
    """
    audio = media.filter(F.col("media_type") == "audio")
    frames = frame_luma(audio, frame_bytes=frame_bytes)
    active = F.when(F.col("luma") >= threshold, F.col("frame_idx"))
    agg = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.min(active).alias("__first"),
        F.max(active).alias("__last"),
        F.max("luma").alias("max_energy"),
    )
    lead = F.coalesce(F.col("__first"), F.col("n_frames"))
    tail = F.when(
        F.col("__first").isNull(), F.lit(0)
    ).otherwise(F.col("n_frames") - 1 - F.col("__last"))
    return agg.select(
        "doc_id",
        "n_frames",
        lead.cast("int").alias("lead_trim"),
        tail.cast("int").alias("tail_trim"),
        (F.col("n_frames") - lead - tail).cast("int").alias("kept_frames"),
        "max_energy",
    )
