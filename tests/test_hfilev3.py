"""HFile v3 container invariants: pinned public-format constants, full
write/read roundtrip, HBase CellComparator field-wise ordering (vs raw
serialized-key order), checksum corruption detection, trailer/index/
file-info agreement, and the Spark rolling writer + distributed reader."""

from __future__ import annotations

import os
import struct

import pytest

from hbase_bulkload_service_spark.sources import hfilev3 as h3


def _cells(n=400, rowfmt=b"row%05d"):
    cells = [
        (rowfmt % i, b"d", b"q%02d" % (i % 5), 0, b"value-%d" % i)
        for i in range(n)
    ]
    cells.sort(key=lambda c: h3._cell_order(c[0], c[1], c[2], c[3]))
    return cells


# ---------------------------------------------------------------------------
# pinned v3 layout constants (Apache HBase public format)
# ---------------------------------------------------------------------------

def test_v3_layout_constants_pinned():
    assert h3.BLOCK_MAGIC_DATA == b"DATABLK*"
    assert h3.BLOCK_MAGIC_ROOT_INDEX == b"IDXROOT2"
    assert h3.BLOCK_MAGIC_FILE_INFO == b"FILEINF2"
    assert h3.TRAILER_MAGIC == b'TRABLK"$'
    assert h3.HEADER_SIZE == 33  # HConstants.HFILEBLOCK_HEADER_SIZE
    assert h3.TRAILER_SIZE_V3 == 4096  # FixedFileTrailer v3 size
    assert h3.VERSION_WORD == 0x03000003  # major 3 | minor 3 << 24
    assert h3.COMPRESSION_NONE_ORDINAL == 2  # Compression.Algorithm NONE
    assert h3.KEYVALUE_TYPE_PUT == 4
    assert h3.PB_MAGIC == b"PBUF"


def test_on_disk_structure_golden(tmp_path):
    fn = str(tmp_path / "g.hfile")
    h3.write_hfile_v3(fn, _cells(50), block_size=1024)
    data = open(fn, "rb").read()
    # file starts with a DATA block whose header fields are coherent
    assert data[:8] == b"DATABLK*"
    on_disk_wo, uncompressed, prev = struct.unpack_from(">IIq", data, 8)
    assert prev == -1
    assert data[24] == 1  # ChecksumType.CRC32
    (bpc,) = struct.unpack_from(">I", data, 25)
    assert bpc == 16384
    (odwh,) = struct.unpack_from(">I", data, 29)
    assert odwh == 33 + uncompressed
    # trailer: fixed 4096 bytes, magic at the start, version word at EOF
    assert data[-4:] == struct.pack(">I", 0x03000003)
    toff = len(data) - 4096
    assert data[toff : toff + 8] == b'TRABLK"$'
    # file-info block payload begins with the PBUF magic
    _, meta = h3.read_hfile_v3(fn)
    fi_off = meta["file_info_offset"]
    assert data[fi_off : fi_off + 8] == b"FILEINF2"
    assert data[fi_off + 33 : fi_off + 37] == b"PBUF"
    assert meta["comparator"] == "org.apache.hadoop.hbase.CellComparatorImpl"


# ---------------------------------------------------------------------------
# roundtrip + multi-block index
# ---------------------------------------------------------------------------

def test_roundtrip_multi_block(tmp_path):
    fn = str(tmp_path / "t.hfile")
    cells = _cells(3000)
    w = h3.write_hfile_v3(fn, cells, block_size=2048)
    back, meta = h3.read_hfile_v3(fn)
    assert back == cells
    assert w["blocks"] == meta["data_index_count"] > 10
    assert meta["entry_count"] == 3000
    assert meta["num_data_index_levels"] == 1
    assert meta["meta_index_count"] == 0
    assert meta["file_info"][h3.FI_LASTKEY] == h3.encode_cell_key(
        *cells[-1][:3], cells[-1][3]
    )


def test_cell_comparator_is_fieldwise_not_raw_bytes(tmp_path):
    # rows of DIFFERENT lengths: "r" < "r0" in row-byte order, but the
    # serialized keys compare the 2-byte rowLen prefix first — the
    # writer must accept CellComparator order and reject raw-key order
    cells = [
        (b"r", b"d", b"q", 0, b"a"),
        (b"r0", b"d", b"q", 0, b"b"),
        (b"r00", b"d", b"q", 0, b"c"),
        (b"s", b"d", b"q", 0, b"d"),
    ]
    assert sorted(cells, key=lambda c: h3._cell_order(*c[:4])) == cells
    fn = str(tmp_path / "v.hfile")
    h3.write_hfile_v3(fn, cells)
    back, _ = h3.read_hfile_v3(fn)
    assert back == cells
    # same-row same-qualifier versions must come NEWEST FIRST
    versions = [(b"r", b"d", b"q", 9, b"new"), (b"r", b"d", b"q", 1, b"old")]
    fn2 = str(tmp_path / "w.hfile")
    h3.write_hfile_v3(fn2, versions)
    with pytest.raises(AssertionError, match="not sorted"):
        h3.write_hfile_v3(str(tmp_path / "x.hfile"), versions[::-1])


def test_unsorted_and_empty_rejected(tmp_path):
    cells = _cells(10)
    with pytest.raises(AssertionError, match="not sorted"):
        h3.write_hfile_v3(str(tmp_path / "u.hfile"), cells[::-1])
    with pytest.raises(AssertionError, match="empty"):
        h3.write_hfile_v3(str(tmp_path / "e.hfile"), [])


# ---------------------------------------------------------------------------
# corruption detection
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: (40, b[40] ^ 0x01),          # data byte -> CRC
        lambda b: (8, b[8] ^ 0x01),            # header field -> CRC
        lambda b: (len(b) - 1, b[-1] ^ 0x01),  # version word
        lambda b: (len(b) - 4096, b[len(b) - 4096] ^ 0x01),  # trailer magic
    ],
)
def test_corruption_detected(tmp_path, mutate):
    fn = str(tmp_path / "c.hfile")
    h3.write_hfile_v3(fn, _cells(100), block_size=1024)
    blob = bytearray(open(fn, "rb").read())
    pos, val = mutate(bytes(blob))
    blob[pos] = val
    fn2 = str(tmp_path / "cbad.hfile")
    open(fn2, "wb").write(bytes(blob))
    with pytest.raises(AssertionError):
        h3.read_hfile_v3(fn2)


def test_vlong_roundtrip():
    for v in (0, 1, 127, 128, 300, 70000, 2**31, 2**40, -1, -113, -129):
        b = h3._hadoop_vlong(v)
        got, pos = h3._read_hadoop_vlong(b, 0)
        assert (got, pos) == (v, len(b))


# ---------------------------------------------------------------------------
# Spark rolling writer + distributed reader (H2/H3 contract over v3)
# ---------------------------------------------------------------------------

def test_rolling_writer_and_distributed_reader(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = []
    for b in range(4):
        for i in range(50):
            key = bytes([0, b]) + (b"k%04d" % i)
            rows.append(
                (b, key, key.hex().upper(), b"d", b"q%d" % (i % 3),
                 (b"q%d" % (i % 3)).hex().upper(), b"v%d" % i)
            )
    kv = spark.createDataFrame(
        rows,
        "bucket int, key binary, key_hex string, family binary,"
        " qualifier binary, qualifier_hex string, value binary",
    )
    d = str(tmp_path / "v3dir")
    manifest = h3.write_hfilev3_files(kv, d, rollup=False, num_partitions=4)
    assert {m["region"] for m in manifest} == {0, 1, 2, 3}
    assert all(f.endswith(".hfile") for f in os.listdir(d) if f != "_manifest.json")
    back = h3.read_hfilev3_dir(spark, d)
    got = {
        (r["region"], bytes(r["key"]), bytes(r["qualifier"]), bytes(r["value"]))
        for r in back.collect()
    }
    want = {(r[0], r[1], r[4], r[6]) for r in rows}
    assert got == want
    # per-file invariants enforced in the reading task: flip a byte in
    # one file and the distributed read must fail
    victim = next(f for f in sorted(os.listdir(d)) if f.endswith(".hfile"))
    p = os.path.join(d, victim)
    blob = bytearray(open(p, "rb").read())
    blob[40] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        h3.read_hfilev3_dir(spark, d).collect()


# ---------------------------------------------------------------------------
# GZ codec (compressed-block framing)
# ---------------------------------------------------------------------------

def test_gz_roundtrip_and_trailer_codec(tmp_path):
    import zlib
    cells = _cells(2000)
    fn = str(tmp_path / "gz.hfile")
    w = h3.write_hfile_v3(fn, cells, block_size=4096, compression="GZ")
    back, meta = h3.read_hfile_v3(fn)
    assert back == cells
    assert meta["compression_codec"] == h3.COMPRESSION_GZ_ORDINAL
    data = open(fn, "rb").read()
    # first data block payload is a gzip member...
    assert data[33:35] == b"\x1f\x8b"
    # ...whose decompressed size matches the header's uncompressed field
    (on_disk_wo, uncompressed) = struct.unpack_from(">II", data, 8)
    n_chunks = -(-struct.unpack_from(">I", data, 29)[0] // 16384)
    disk_payload = data[33 : 33 + on_disk_wo - 4 * n_chunks]
    assert len(zlib.decompress(disk_payload, 16 + zlib.MAX_WBITS)) == uncompressed
    # and GZ genuinely shrinks the file vs NONE on this data
    fn2 = str(tmp_path / "plain.hfile")
    w2 = h3.write_hfile_v3(fn2, cells, block_size=4096)
    assert w["file_bytes"] < w2["file_bytes"]


def test_gz_corruption_detected_before_decompress(tmp_path):
    fn = str(tmp_path / "gzc.hfile")
    h3.write_hfile_v3(fn, _cells(500), block_size=2048, compression="GZ")
    blob = bytearray(open(fn, "rb").read())
    blob[50] ^= 0xFF  # inside the compressed payload -> CRC catches it
    fn2 = str(tmp_path / "gzbad.hfile")
    open(fn2, "wb").write(bytes(blob))
    with pytest.raises(AssertionError, match="CRC"):
        h3.read_hfile_v3(fn2)


def test_unknown_codec_rejected(tmp_path):
    with pytest.raises(ValueError, match="NONE or GZ"):
        h3.write_hfile_v3(str(tmp_path / "x.hfile"), _cells(5), compression="SNAPPY")


# ---------------------------------------------------------------------------
# index-seek point read
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("comp", ["NONE", "GZ"])
def test_seek_row_reads_only_needed_blocks(tmp_path, comp):
    cells = []
    for i in range(300):
        nq = 30 if i % 53 == 0 else 2  # fat rows straddle block bounds
        for q in range(nq):
            cells.append((b"row%05d" % i, b"d", b"q%03d" % q, 0, b"v%d.%d" % (i, q)))
    cells.sort(key=lambda c: h3._cell_order(*c[:4]))
    fn = str(tmp_path / f"s{comp}.hfile")
    h3.write_hfile_v3(fn, cells, block_size=512, compression=comp)
    for probe in [0, 1, 52, 53, 106, 150, 299]:
        row = b"row%05d" % probe
        got = h3.seek_row_hfile_v3(fn, row)
        assert got == [c for c in cells if c[0] == row]
    # misses before, between, and after the key space
    assert h3.seek_row_hfile_v3(fn, b"aaa") == []
    assert h3.seek_row_hfile_v3(fn, b"row00000x") == []
    assert h3.seek_row_hfile_v3(fn, b"zzz") == []


# ---------------------------------------------------------------------------
# two-level index (inline IDXLEAF2 leaves + root-of-leaves)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("comp", ["NONE", "GZ"])
def test_two_level_index_roundtrip_and_seek(tmp_path, comp):
    cells = []
    for i in range(600):
        nq = 30 if i % 71 == 0 else 2
        for q in range(nq):
            cells.append((b"row%05d" % i, b"d", b"q%03d" % q, 0, b"v%d.%d" % (i, q)))
    cells.sort(key=lambda c: h3._cell_order(*c[:4]))
    fn = str(tmp_path / f"two{comp}.hfile")
    w = h3.write_hfile_v3(
        fn, cells, block_size=512, compression=comp, index_chunk_entries=6
    )
    back, meta = h3.read_hfile_v3(fn)
    assert back == cells
    assert meta["num_data_index_levels"] == 2
    # root is leaf-count-sized, far smaller than the data block count
    assert meta["data_index_count"] == -(-w["blocks"] // 6) < w["blocks"]
    assert b"IDXLEAF2" in open(fn, "rb").read()
    for probe in [0, 1, 70, 71, 142, 599]:
        row = b"row%05d" % probe
        assert h3.seek_row_hfile_v3(fn, row) == [c for c in cells if c[0] == row]
    assert h3.seek_row_hfile_v3(fn, b"zzz") == []


def test_two_level_leaf_corruption_detected(tmp_path):
    cells = _cells(400)
    fn = str(tmp_path / "lc.hfile")
    h3.write_hfile_v3(fn, cells, block_size=512, index_chunk_entries=4)
    data = bytearray(open(fn, "rb").read())
    pos = bytes(data).index(b"IDXLEAF2") + 40  # inside leaf payload
    data[pos] ^= 0xFF
    fn2 = str(tmp_path / "lcbad.hfile")
    open(fn2, "wb").write(bytes(data))
    with pytest.raises(AssertionError):
        h3.read_hfile_v3(fn2)


def test_leaf_index_codec_roundtrip():
    entries = [(0, 100, b"k1"), (100, 220, b"key-longer"), (320, 64, b"z")]
    assert h3._parse_leaf_index(h3._leaf_index_payload(entries)) == entries
    assert h3._parse_leaf_index(h3._leaf_index_payload([])) == []
