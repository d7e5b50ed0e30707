"""Real Apache HFile **version 3** byte format — writer + verifying reader.

This is the adoption-fidelity container behind H1/H7 (SURVEY.md §2): the
reference hands its output to ``LoadIncrementalHFiles`` (reference
``controller/HBaseController.java:232-254``, ``HFileOutputUtil.java:17-39``),
which adopts files in the on-disk format HBase's ``HFile.Reader`` parses.
Where HFL1/HFL2 are minimal stand-in containers proving the LAYOUT
contract (sorted, per-region, non-overlapping), this module emits the
actual v3 structure, byte-for-byte per the public format (Apache HBase
``HFileBlock`` / ``FixedFileTrailer`` / ``HFileWriterImpl`` — all
public-source knowledge):

  scanned section     DATA blocks ("DATABLK*", 33-byte v2/v3 header,
                      CRC chunk checksums after the payload)
  load-on-open        root data index ("IDXROOT2"), meta index
                      (same block type, zero entries), file info
                      ("FILEINF2": PBUF magic + delimited FileInfoProto)
  trailer             4096 bytes fixed for v3: "TRABLK\\"$" magic +
                      delimited FileTrailerProto + zero padding +
                      version word (major=3 | minor=3 << 24)

Choices within the format (all valid HFiles):
- ``compression=NONE`` (trailer codec ordinal 2) and
  ``DATA_BLOCK_ENCODING=NONE`` — the payload transforms the reference's
  DDL enables (SNAPPY + DIFF, ``HBaseManager.java:381-383``) are block-
  payload layers demonstrated in the HFL2 container (sources/hfile.py);
  this module's contribution is the real container framing around them.
- ``checksumType=CRC32`` (type byte 1; HBase supports CRC32 and CRC32C,
  zlib provides CRC32 bit-exactly).
- cells carry no tags and no mvcc (``includesTags=false``,
  ``includesMvcc=false`` — the bulk-load writer's configuration), so a
  cell is the classic KeyValue: keyLen(4) valueLen(4) rowLen(2) row
  famLen(1) family qualifier timestamp(8) type(1=Put:4) value.
- one- or two-level block index: a single-level root (what HBase writes
  until the root chunk overflows 128 KiB; entries are (offset u64,
  onDiskSizeWithHeader u32, vint-prefixed first key)), or — with
  ``index_chunk_entries`` set — inline LEAF_INDEX blocks in HBase's
  non-root format (entry count, secondary-offset array, raw-key
  entries) with the root pointing at the leaves
  (``num_data_index_levels=2``, the shape a multi-GB region file needs
  so the load-on-open root stays small).

The protobuf wire encoding (needed for FileInfo + trailer) is emitted by
a ~30-line varint encoder — no protobuf dependency.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

# --- pinned v3 layout constants (Apache HBase public format) --------------
BLOCK_MAGIC_DATA = b"DATABLK*"
BLOCK_MAGIC_ROOT_INDEX = b"IDXROOT2"
BLOCK_MAGIC_LEAF_INDEX = b"IDXLEAF2"
BLOCK_MAGIC_FILE_INFO = b"FILEINF2"
TRAILER_MAGIC = b'TRABLK"$'
HEADER_SIZE = 33  # HConstants.HFILEBLOCK_HEADER_SIZE (v2/v3, with checksums)
TRAILER_SIZE_V3 = 4096  # FixedFileTrailer.computeTrailerSizeByVersion()[3]
MAJOR_VERSION = 3
MINOR_VERSION = 3  # HFileReaderImpl.PBUF_TRAILER_MINOR_VERSION
VERSION_WORD = (MAJOR_VERSION & 0x00FFFFFF) | (MINOR_VERSION << 24)
CHECKSUM_CRC32 = 1  # ChecksumType.CRC32 code
BYTES_PER_CHECKSUM = 16384  # HConstants.DEFAULT_BYTES_PER_CHECKSUM
COMPRESSION_GZ_ORDINAL = 1  # Compression.Algorithm ordinals: LZO,GZ,NONE,..
COMPRESSION_NONE_ORDINAL = 2
KEYVALUE_TYPE_PUT = 4  # KeyValue.Type.Put code
COMPARATOR = b"org.apache.hadoop.hbase.CellComparatorImpl"
PB_MAGIC = b"PBUF"  # ProtobufMagic.PB_MAGIC (file-info block prefix)
DEFAULT_BLOCK_SIZE = 65536  # HConstants.DEFAULT_BLOCKSIZE

FILEINFO_RESERVED_PREFIX = b"hfile."
FI_LASTKEY = b"hfile.LASTKEY"
FI_AVG_KEY_LEN = b"hfile.AVG_KEY_LEN"
FI_AVG_VALUE_LEN = b"hfile.AVG_VALUE_LEN"
FI_CREATE_TIME_TS = b"hfile.CREATE_TIME_TS"


# --- protobuf wire + Hadoop vint encoders ----------------------------------

def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field_varint(field: int, value: int) -> bytes:
    return _pb_varint(field << 3 | 0) + _pb_varint(value)


def _pb_field_bytes(field: int, value: bytes) -> bytes:
    return _pb_varint(field << 3 | 2) + _pb_varint(len(value)) + value


def _pb_read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, val = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _pb_decode(buf: bytes) -> dict[int, list]:
    """Minimal wire decoder: field -> list of raw values (ints for
    wiretype 0, bytes for wiretype 2)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _pb_read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _pb_read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _pb_read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise AssertionError(f"unexpected wiretype {wt}")
        out.setdefault(field, []).append(v)
    return out


def _hadoop_vlong(i: int) -> bytes:
    """Hadoop WritableUtils.writeVLong (used by Bytes.writeByteArray for
    the index-entry key length)."""
    if -112 <= i <= 127:
        return bytes([i & 0xFF])
    ln = -112
    if i < 0:
        i ^= -1
        ln = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    out = bytearray([ln & 0xFF])
    ln = -(ln + 120) if ln < -120 else -(ln + 112)
    for idx in range(ln, 0, -1):
        out.append((i >> ((idx - 1) * 8)) & 0xFF)
    return bytes(out)


def _read_hadoop_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    first = struct.unpack_from("b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    ln = -(first + 112) if first >= -120 else -(first + 120)
    neg = first < -120
    val = 0
    for _ in range(ln):
        val = (val << 8) | buf[pos]
        pos += 1
    return (val ^ -1 if neg else val), pos


# --- cell (KeyValue) codec --------------------------------------------------

def encode_cell_key(row: bytes, family: bytes, qualifier: bytes, ts: int) -> bytes:
    """The KeyValue 'key' part: rowLen(2) row famLen(1) family qualifier
    ts(8) type(1)."""
    return (
        struct.pack(">H", len(row))
        + row
        + struct.pack("B", len(family))
        + family
        + qualifier
        + struct.pack(">q", ts)
        + struct.pack("B", KEYVALUE_TYPE_PUT)
    )


def decode_cell_key(key: bytes) -> tuple[bytes, bytes, bytes, int, int]:
    (rl,) = struct.unpack_from(">H", key, 0)
    row = key[2 : 2 + rl]
    fl = key[2 + rl]
    o = 3 + rl
    fam = key[o : o + fl]
    o += fl
    qual = key[o : -9]
    (ts,) = struct.unpack_from(">q", key, len(key) - 9)
    typ = key[-1]
    return row, fam, qual, ts, typ


def _encode_keyvalue(key: bytes, value: bytes) -> bytes:
    return struct.pack(">II", len(key), len(value)) + key + value


def _cell_order(row: bytes, fam: bytes, qual: bytes, ts: int) -> tuple:
    """HBase CellComparator sort key: row, family, qualifier ascending
    byte-lex (each compared AS A FIELD — the serialized key's length
    prefixes make raw key-byte order differ from cell order when field
    lengths vary), then timestamp DESCENDING."""
    return (row, fam, qual, -ts)


# --- block framing ----------------------------------------------------------

def _gzip_compress(payload: bytes) -> bytes:
    """java.util.zip.GZIPOutputStream-compatible gzip stream (the GZ
    codec's on-disk bytes are a standard gzip member; any conforming
    gzip decodes it — readers never compare compressed bytes)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(payload) + co.flush()


def _write_block(
    out, magic: bytes, payload: bytes, prev_offset: int, compress: bool = False
) -> tuple[int, int, int]:
    """Write one v2/v3 block (33-byte header, payload — gzip-compressed
    when ``compress`` — then CRC32 chunk checksums over header + on-disk
    payload). Returns (offset, on_disk_size_with_header,
    uncompressed_size_with_header)."""
    offset = out.tell()
    disk_payload = _gzip_compress(payload) if compress else payload
    on_disk_data_with_header = HEADER_SIZE + len(disk_payload)
    n_chunks = -(-on_disk_data_with_header // BYTES_PER_CHECKSUM)
    on_disk_without_header = len(disk_payload) + 4 * n_chunks
    header = (
        magic
        + struct.pack(">I", on_disk_without_header)
        + struct.pack(">I", len(payload))
        + struct.pack(">q", prev_offset)
        + struct.pack("B", CHECKSUM_CRC32)
        + struct.pack(">I", BYTES_PER_CHECKSUM)
        + struct.pack(">I", on_disk_data_with_header)
    )
    assert len(header) == HEADER_SIZE
    checked = header + disk_payload
    out.write(checked)
    for c in range(n_chunks):
        chunk = checked[c * BYTES_PER_CHECKSUM : (c + 1) * BYTES_PER_CHECKSUM]
        out.write(struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF))
    return offset, HEADER_SIZE + on_disk_without_header, HEADER_SIZE + len(payload)


def _parse_block(
    data: bytes,
    offset: int,
    expect_magic: bytes | None = None,
    compressed: bool = False,
):
    """Parse + checksum-verify one block (decompressing GZ payloads when
    ``compressed``); returns (payload, on_disk_size_with_header,
    prev_offset, magic)."""
    hdr = data[offset : offset + HEADER_SIZE]
    if len(hdr) < HEADER_SIZE:
        raise AssertionError("truncated block header")
    magic = hdr[:8]
    if expect_magic is not None and magic != expect_magic:
        raise AssertionError(f"block magic {magic!r} != {expect_magic!r}")
    on_disk_without_header, uncompressed, prev = struct.unpack_from(">IIq", hdr, 8)
    ctype = hdr[24]
    (bpc,) = struct.unpack_from(">I", hdr, 25)
    (odwh,) = struct.unpack_from(">I", hdr, 29)
    if ctype != CHECKSUM_CRC32 or bpc != BYTES_PER_CHECKSUM:
        raise AssertionError("unexpected checksum config")
    disk_payload = data[offset + HEADER_SIZE : offset + odwh]
    n_chunks = -(-odwh // BYTES_PER_CHECKSUM)
    if on_disk_without_header != len(disk_payload) + 4 * n_chunks:
        raise AssertionError("onDiskSizeWithoutHeader disagrees")
    checked = data[offset : offset + odwh]
    csums = data[offset + odwh : offset + odwh + 4 * n_chunks]
    for c in range(n_chunks):
        chunk = checked[c * BYTES_PER_CHECKSUM : (c + 1) * BYTES_PER_CHECKSUM]
        (want,) = struct.unpack_from(">I", csums, 4 * c)
        if zlib.crc32(chunk) & 0xFFFFFFFF != want:
            raise AssertionError(f"CRC mismatch in chunk {c} at offset {offset}")
    if compressed:
        payload = zlib.decompress(disk_payload, 16 + zlib.MAX_WBITS)
    else:
        payload = disk_payload
    if len(payload) != uncompressed:
        raise AssertionError("uncompressedSizeWithoutHeader disagrees")
    return payload, HEADER_SIZE + on_disk_without_header, prev, magic


# --- writer -----------------------------------------------------------------

def _leaf_index_payload(entries: list[tuple[int, int, bytes]]) -> bytes:
    """HBase non-root index block format: int numEntries, an
    (numEntries+1)-int secondary-offset array (entry start offsets
    relative to the entries blob, plus the end sentinel), then entries
    of (long blockOffset, int onDiskSizeWithHeader, raw key — lengths
    come from the secondary index, no vint prefix)."""
    blob = bytearray()
    offsets = []
    for off, odwh, key in entries:
        offsets.append(len(blob))
        blob += struct.pack(">q", off) + struct.pack(">i", odwh) + key
    offsets.append(len(blob))
    return (
        struct.pack(">i", len(entries))
        + b"".join(struct.pack(">i", o) for o in offsets)
        + bytes(blob)
    )


def _parse_leaf_index(payload: bytes) -> list[tuple[int, int, bytes]]:
    (n,) = struct.unpack_from(">i", payload, 0)
    offs = struct.unpack_from(f">{n + 1}i", payload, 4)
    base = 4 + 4 * (n + 1)
    if base + offs[-1] != len(payload):
        raise AssertionError("leaf index secondary offsets do not close")
    out = []
    for i in range(n):
        o = base + offs[i]
        (boff,) = struct.unpack_from(">q", payload, o)
        (odwh,) = struct.unpack_from(">i", payload, o + 8)
        key = payload[o + 12 : base + offs[i + 1]]
        out.append((boff, odwh, key))
    return out


def write_hfile_v3(
    fname: str,
    cells,
    block_size: int = DEFAULT_BLOCK_SIZE,
    create_time_ts: int = 0,
    compression: str = "NONE",
    index_chunk_entries: int = 0,
) -> dict:
    """Write sorted cells ((row, family, qualifier, ts, value) tuples,
    ascending in CellComparator order) as one HFile v3. ``compression``
    is NONE or GZ (the gzip codec, Compression.Algorithm.GZ — applied to
    EVERY block's payload, data and load-on-open alike, exactly as the
    file-wide codec works in HBase). ``index_chunk_entries > 0`` writes
    a TWO-LEVEL index: inline LEAF_INDEX blocks every that-many data
    blocks (HBase's non-root format) with the root pointing at the
    leaves — the shape that keeps the load-on-open root small for
    multi-GB files (HBase switches on a 128 KiB root-chunk bound; an
    explicit entry count keeps tests deterministic). Returns summary
    meta (rows, first/last row hex, block count, file size)."""
    if compression not in ("NONE", "GZ"):
        raise ValueError("compression must be NONE or GZ")
    gz = compression == "GZ"
    blocks: list[tuple[int, int, bytes]] = []  # (offset, onDiskWithHeader, first_key)
    n_cells = 0
    key_len_sum = 0
    val_len_sum = 0
    first_row = last_row = None
    last_key = None
    total_uncompressed = 0

    leaves: list[tuple[int, int, bytes]] = []  # (offset, odwh, first key)
    leaf_payload_bytes = 0
    with open(fname, "wb") as out:
        cur = bytearray()
        cur_first_key = None
        prev_data_offset = -1
        prev_leaf_offset = -1
        pending_leaf: list[tuple[int, int, bytes]] = []

        def flush_leaf():
            nonlocal pending_leaf, prev_leaf_offset, total_uncompressed
            nonlocal leaf_payload_bytes
            if not pending_leaf:
                return
            payload = _leaf_index_payload(pending_leaf)
            leaf_payload_bytes += len(payload)
            off, odwh, unc = _write_block(
                out, BLOCK_MAGIC_LEAF_INDEX, payload, prev_leaf_offset, gz
            )
            leaves.append((off, odwh, pending_leaf[0][2]))
            prev_leaf_offset = off
            total_uncompressed += unc
            pending_leaf = []

        def flush_data():
            nonlocal cur, cur_first_key, prev_data_offset, total_uncompressed
            if not cur:
                return
            off, odwh, unc = _write_block(
                out, BLOCK_MAGIC_DATA, bytes(cur), prev_data_offset, gz
            )
            blocks.append((off, odwh, cur_first_key))
            prev_data_offset = off
            total_uncompressed += unc
            cur = bytearray()
            cur_first_key = None
            if index_chunk_entries > 0:
                pending_leaf.append((off, odwh, blocks[-1][2]))
                if len(pending_leaf) >= index_chunk_entries:
                    flush_leaf()

        last_order = None
        for row, fam, qual, ts, value in cells:
            key = encode_cell_key(bytes(row), bytes(fam), bytes(qual), int(ts))
            order = _cell_order(bytes(row), bytes(fam), bytes(qual), int(ts))
            if last_order is not None and order < last_order:
                raise AssertionError("HFile v3 input not sorted by cell key")
            last_order = order
            last_key = key
            if cur_first_key is None:
                cur_first_key = key
            cur += _encode_keyvalue(key, bytes(value))
            n_cells += 1
            key_len_sum += len(key)
            val_len_sum += len(value)
            if first_row is None:
                first_row = bytes(row)
            last_row = bytes(row)
            if len(cur) >= block_size:
                flush_data()
        flush_data()

        if n_cells == 0:
            raise AssertionError("refusing to write an empty HFile")

        flush_leaf()  # tail chunk (two-level mode only)

        # --- load-on-open section ---
        load_on_open_offset = out.tell()
        # root data index: entries point at data blocks (1 level) or at
        # the inline leaf index blocks (2 levels)
        root_entries = leaves if index_chunk_entries > 0 else blocks
        idx_payload = bytearray()
        for off, odwh, fk in root_entries:
            idx_payload += struct.pack(">q", off)
            idx_payload += struct.pack(">i", odwh)
            idx_payload += _hadoop_vlong(len(fk)) + fk
        _, _, unc = _write_block(
            out, BLOCK_MAGIC_ROOT_INDEX, bytes(idx_payload), -1, gz
        )
        total_uncompressed += unc
        uncompressed_index_size = len(idx_payload) + leaf_payload_bytes
        # meta index (zero entries — still a root-index block)
        _, _, unc = _write_block(out, BLOCK_MAGIC_ROOT_INDEX, b"", -1, gz)
        total_uncompressed += unc
        # file info
        file_info_offset = out.tell()
        entries = [
            (FI_AVG_KEY_LEN, struct.pack(">i", key_len_sum // n_cells)),
            (FI_AVG_VALUE_LEN, struct.pack(">i", val_len_sum // n_cells)),
            (FI_CREATE_TIME_TS, struct.pack(">q", create_time_ts)),
            (FI_LASTKEY, last_key),
        ]
        proto = b"".join(
            _pb_field_bytes(
                1, _pb_field_bytes(1, k) + _pb_field_bytes(2, v)
            )
            for k, v in sorted(entries)
        )
        fi_payload = PB_MAGIC + _pb_varint(len(proto)) + proto
        _, _, unc = _write_block(out, BLOCK_MAGIC_FILE_INFO, fi_payload, -1, gz)
        total_uncompressed += unc

        # --- fixed trailer (4096 bytes for v3) ---
        tp = b"".join(
            [
                _pb_field_varint(1, file_info_offset),
                _pb_field_varint(2, load_on_open_offset),
                _pb_field_varint(3, uncompressed_index_size),
                _pb_field_varint(4, total_uncompressed),
                _pb_field_varint(5, len(root_entries)),  # data_index_count
                _pb_field_varint(6, 0),  # meta_index_count
                _pb_field_varint(7, n_cells),  # entry_count
                # root entry count / index depth (2 with inline leaves)
                _pb_field_varint(8, 2 if index_chunk_entries > 0 else 1),
                _pb_field_varint(9, blocks[0][0]),  # first_data_block_offset
                _pb_field_varint(10, blocks[-1][0]),  # last_data_block_offset
                _pb_field_bytes(11, COMPARATOR),
                _pb_field_varint(
                    12, COMPRESSION_GZ_ORDINAL if gz else COMPRESSION_NONE_ORDINAL
                ),
            ]
        )
        trailer = TRAILER_MAGIC + _pb_varint(len(tp)) + tp
        padding = TRAILER_SIZE_V3 - 4 - len(trailer)
        if padding < 0:
            raise AssertionError("trailer overflow")
        out.write(trailer + b"\x00" * padding + struct.pack(">I", VERSION_WORD))
        size = out.tell()

    return {
        "rows": n_cells,
        "blocks": len(blocks),
        "min_key_hex": first_row.hex().upper(),
        "max_key_hex": last_row.hex().upper(),
        "file_bytes": size,
    }


# --- verifying reader -------------------------------------------------------

def read_hfile_v3(fname: str) -> tuple[list, dict]:
    """Parse an HFile v3 exactly the way ``HFile.Reader`` opens it: seek
    the fixed trailer (magic + version word), decode the trailer proto,
    jump to load-on-open (root index, meta index, file info), then read
    every data block THROUGH the index, checksum-verifying each block
    and asserting cell order, index agreement, entry/LASTKEY/file-info
    consistency. Returns (cells, meta) with cells =
    [(row, family, qualifier, ts, value)]."""
    with open(fname, "rb") as f:
        data = f.read()
    if len(data) < TRAILER_SIZE_V3:
        raise AssertionError("file shorter than a v3 trailer")
    (version_word,) = struct.unpack_from(">I", data, len(data) - 4)
    if version_word != VERSION_WORD:
        raise AssertionError(
            f"version word {version_word:#x} != v3 {VERSION_WORD:#x}"
        )
    toff = len(data) - TRAILER_SIZE_V3
    if data[toff : toff + 8] != TRAILER_MAGIC:
        raise AssertionError("bad trailer magic")
    tlen, pos = _pb_read_varint(data, toff + 8)
    tfields = _pb_decode(data[pos : pos + tlen])
    meta = {
        "file_info_offset": tfields[1][0],
        "load_on_open_offset": tfields[2][0],
        "data_index_count": tfields[5][0],
        "meta_index_count": tfields[6][0],
        "entry_count": tfields[7][0],
        "num_data_index_levels": tfields[8][0],
        "first_data_block_offset": tfields[9][0],
        "last_data_block_offset": tfields[10][0],
        "comparator": tfields[11][0].decode(),
        "compression_codec": tfields[12][0],
    }
    if meta["num_data_index_levels"] not in (1, 2):
        raise AssertionError("only 1- and 2-level indexes are written/read")
    if meta["compression_codec"] == COMPRESSION_GZ_ORDINAL:
        gz = True
    elif meta["compression_codec"] == COMPRESSION_NONE_ORDINAL:
        gz = False
    else:
        raise AssertionError(
            f"unsupported codec ordinal {meta['compression_codec']}"
        )

    # root data index
    idx_payload, idx_size, _, _ = _parse_block(
        data, meta["load_on_open_offset"], BLOCK_MAGIC_ROOT_INDEX, gz
    )
    entries = []
    pos = 0
    for _ in range(meta["data_index_count"]):
        (off,) = struct.unpack_from(">q", idx_payload, pos)
        (odwh,) = struct.unpack_from(">i", idx_payload, pos + 8)
        klen, kpos = _read_hadoop_vlong(idx_payload, pos + 12)
        key = idx_payload[kpos : kpos + klen]
        pos = kpos + klen
        entries.append((off, odwh, key))
    if pos != len(idx_payload):
        raise AssertionError("root index has trailing bytes")
    if meta["num_data_index_levels"] == 2:
        # root points at inline LEAF_INDEX blocks; expand to data entries
        data_entries = []
        for off, odwh, first_key in entries:
            payload, size_wh, _, _ = _parse_block(
                data, off, BLOCK_MAGIC_LEAF_INDEX, gz
            )
            if size_wh != odwh:
                raise AssertionError("root onDiskSize disagrees for a leaf")
            leaf = _parse_leaf_index(payload)
            if not leaf or leaf[0][2] != first_key:
                raise AssertionError("leaf first-key disagrees with root")
            data_entries.extend(leaf)
        entries = data_entries
    # meta index (must parse, zero entries)
    m_payload, _, _, _ = _parse_block(
        data, meta["load_on_open_offset"] + idx_size, BLOCK_MAGIC_ROOT_INDEX, gz
    )
    if meta["meta_index_count"] == 0 and m_payload != b"":
        raise AssertionError("meta index should be empty")
    # file info
    fi_payload, _, _, _ = _parse_block(
        data, meta["file_info_offset"], BLOCK_MAGIC_FILE_INFO, gz
    )
    if fi_payload[:4] != PB_MAGIC:
        raise AssertionError("file info lacks PBUF magic")
    filen, fpos = _pb_read_varint(fi_payload, 4)
    fi_fields = _pb_decode(fi_payload[fpos : fpos + filen])
    file_info = {}
    for pair in fi_fields.get(1, []):
        kv = _pb_decode(pair)
        file_info[bytes(kv[1][0])] = bytes(kv[2][0])

    # data blocks through the index
    cells = []
    prev_key = prev_order = None
    prev_off = -1
    for i, (off, odwh, first_key) in enumerate(entries):
        payload, size_with_header, prev, magic = _parse_block(
            data, off, BLOCK_MAGIC_DATA, gz
        )
        if size_with_header != odwh:
            raise AssertionError(f"index onDiskSize disagrees for block {i}")
        if prev != prev_off:
            raise AssertionError(f"prevBlockOffset chain broken at block {i}")
        prev_off = off
        pos = 0
        block_first = None
        while pos < len(payload):
            klen, vlen = struct.unpack_from(">II", payload, pos)
            key = payload[pos + 8 : pos + 8 + klen]
            value = payload[pos + 8 + klen : pos + 8 + klen + vlen]
            pos += 8 + klen + vlen
            if block_first is None:
                block_first = key
            row, fam, qual, ts, typ = decode_cell_key(key)
            order = _cell_order(row, fam, qual, ts)
            if prev_key is not None and order < prev_order:
                raise AssertionError("cells out of order")
            prev_key, prev_order = key, order
            if typ != KEYVALUE_TYPE_PUT:
                raise AssertionError(f"unexpected cell type {typ}")
            cells.append((row, fam, qual, ts, value))
        if pos != len(payload):
            raise AssertionError(f"data block {i} has trailing bytes")
        if block_first != first_key:
            raise AssertionError(f"index first-key disagrees for block {i}")
    if len(cells) != meta["entry_count"]:
        raise AssertionError("trailer entry_count disagrees")
    if prev_key != file_info.get(FI_LASTKEY):
        raise AssertionError("file-info LASTKEY disagrees")
    meta["file_info"] = file_info
    meta["rows"] = len(cells)
    meta["min_key_hex"] = cells[0][0].hex().upper()
    meta["max_key_hex"] = cells[-1][0].hex().upper()
    return cells, meta


# --- Spark integration (same rolling contract as write_hfl2_files) ---------

def write_hfilev3_files(
    kv,
    path: str,
    rollup: bool = False,
    num_partitions: int = 16,
    compression: str = "NONE",
) -> list[dict]:
    """H2/H3 rolling writer over the REAL v3 container: range-partition +
    sort once (globally non-overlapping regions, the §4.2 contract), then
    each task rolls one HFile per region it holds. Input columns as
    bulkload_kv (bucket, key, key_hex, family, qualifier, qualifier_hex,
    value); cell timestamp is fixed at 0 (bulk loads carry the version in
    the value/qualifier per the reference's TSDB layout). Same manifest
    shape as write_hfl1_files/write_hfl2_files."""
    from hbase_bulkload_service_spark.sources.hfile import assign_region

    os.makedirs(path, exist_ok=True)
    regions = assign_region(kv, rollup)
    sorted_kv = regions.repartitionByRange(
        num_partitions, "region", "key_hex", "qualifier_hex"
    ).sortWithinPartitions("region", "key_hex", "qualifier_hex")

    def write_partition(pid: int, it):
        out = []
        current_region, buf = None, []

        def flush():
            if current_region is None or not buf:
                return
            fname = os.path.join(
                path, f"region_{current_region:05d}_p{pid:05d}.hfile"
            )
            meta = write_hfile_v3(fname, buf, compression=compression)
            out.append(
                {
                    "file": os.path.basename(fname),
                    "region": current_region,
                    "rows": meta["rows"],
                    "min_key_hex": meta["min_key_hex"],
                    "max_key_hex": meta["max_key_hex"],
                }
            )

        for row in it:
            if row["region"] != current_region:
                flush()
                current_region, buf = row["region"], []
            buf.append(
                (
                    bytes(row["key"]),
                    bytes(row["family"]),
                    bytes(row["qualifier"]),
                    0,
                    bytes(row["value"]),
                )
            )
        flush()
        return out

    results = sorted_kv.rdd.mapPartitionsWithIndex(
        lambda pid, it: iter(write_partition(pid, it))
    ).collect()
    manifest = sorted(results, key=lambda r: (r["region"], r["file"]))
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_hfilev3_dir(spark, path: str):
    """Distributed v3 readback: one task per file (manifest-driven), each
    opening its file exactly as HFile.Reader would (trailer → load-on-
    open → index → checksum-verified data blocks) and asserting the
    manifest agrees with what the file itself says. Returns (region, key,
    key_hex, family, qualifier, qualifier_hex, value)."""
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    files = [
        (
            os.path.join(path, m["file"]),
            m["region"],
            (m["rows"], m["min_key_hex"], m["max_key_hex"]),
        )
        for m in manifest
    ]

    def parse(triple):
        fname, region, expect = triple
        cells, meta = read_hfile_v3(fname)
        if (meta["rows"], meta["min_key_hex"], meta["max_key_hex"]) != expect:
            raise AssertionError(f"{fname}: manifest/meta disagree")
        for row, fam, qual, _ts, val in cells:
            yield (
                region,
                row,
                row.hex().upper(),
                fam,
                qual,
                qual.hex().upper(),
                val,
            )

    sc = spark.sparkContext
    rdd = sc.parallelize(files, max(1, len(files))).flatMap(parse)
    return spark.createDataFrame(
        rdd,
        "region int, key binary, key_hex string, family binary, "
        "qualifier binary, qualifier_hex string, value binary",
    )


# --- index-seek point read ---------------------------------------------------

def seek_row_hfile_v3(fname: str, row: bytes) -> list:
    """Point-get through the block index — the read path a region server
    serves from these files: parse the fixed trailer + root index
    (load-on-open metadata only), binary-search the index entries'
    first keys for the LAST block whose first key is <= the probe row,
    and scan ONLY that block (plus successors while their first key
    still matches the row — a row can straddle a block boundary when it
    carries many qualifiers). Returns the row's cells; never touches
    any other data block, which is the whole point of the index."""
    with open(fname, "rb") as f:
        data = f.read()
    (version_word,) = struct.unpack_from(">I", data, len(data) - 4)
    if version_word != VERSION_WORD:
        raise AssertionError("not an HFile v3")
    toff = len(data) - TRAILER_SIZE_V3
    if data[toff : toff + 8] != TRAILER_MAGIC:
        raise AssertionError("bad trailer magic")
    tlen, pos = _pb_read_varint(data, toff + 8)
    t = _pb_decode(data[pos : pos + tlen])
    gz = t[12][0] == COMPRESSION_GZ_ORDINAL
    levels = t[8][0]
    idx_payload, _, _, _ = _parse_block(
        data, t[2][0], BLOCK_MAGIC_ROOT_INDEX, gz
    )
    root = []
    pos = 0
    for _ in range(t[5][0]):
        (off,) = struct.unpack_from(">q", idx_payload, pos)
        (odwh,) = struct.unpack_from(">i", idx_payload, pos + 8)
        klen, kpos = _read_hadoop_vlong(idx_payload, pos + 12)
        key = idx_payload[kpos : kpos + klen]
        pos = kpos + klen
        root.append((off, odwh, key))
    if levels == 2:
        # two-step seek: binary-search the ROOT for the starting leaf,
        # parse only that leaf (and successors on demand) — the point
        # of the hierarchy: the root stays small, one leaf read per get
        import bisect as _b

        rorders = [
            _cell_order(*decode_cell_key(k)[:3], decode_cell_key(k)[3])
            for _, _, k in root
        ]
        probe_low = (row, b"", b"", -(1 << 62))
        lstart = max(0, _b.bisect_right(rorders, probe_low) - 1)
        entries = []
        for li in range(lstart, len(root)):
            if li > lstart and rorders[li][0] > row:
                break
            payload, _, _, _ = _parse_block(
                data, root[li][0], BLOCK_MAGIC_LEAF_INDEX, gz
            )
            entries.extend(_parse_leaf_index(payload))
    else:
        entries = root
    # binary search: first candidate block = the last one whose first
    # key sorts BEFORE any possible cell of `row` (the row's first cell
    # may sit mid-block); later row-straddling blocks are walked forward
    import bisect

    probe_low = (row, b"", b"", -(1 << 62))  # sorts before any cell of row
    orders = [_cell_order(*decode_cell_key(k)[:3], decode_cell_key(k)[3])
              for _, _, k in entries]
    start = max(0, bisect.bisect_right(orders, probe_low) - 1)
    cells = []
    for i in range(start, len(entries)):
        first_row = orders[i][0]
        if i > start and first_row > row:
            break
        payload, _, _, _ = _parse_block(data, entries[i][0], BLOCK_MAGIC_DATA, gz)
        pos2 = 0
        while pos2 < len(payload):
            klen, vlen = struct.unpack_from(">II", payload, pos2)
            key = payload[pos2 + 8 : pos2 + 8 + klen]
            value = payload[pos2 + 8 + klen : pos2 + 8 + klen + vlen]
            pos2 += 8 + klen + vlen
            r, fam, qual, ts, _typ = decode_cell_key(key)
            if r == row:
                cells.append((r, fam, qual, ts, value))
            elif r > row:
                return cells
    return cells
