"""An externally-derived Cassandra 3.x "ma" fixture: every byte placed by
hand from the published on-disk format, with NO import of the repo's
``modern_writer`` — so a writer/decoder co-bug cannot self-certify this
input (the reference project set the same bar with real
Cassandra-generated testdata, AegisthusIntegrationTest.groovy +
src/test/resources/testdata/).

Format sources (public): Cassandra 3.x serialization code paths
``UnfilteredSerializer.serialize`` (row/marker flags and layout),
``Cell.serializer`` (cell flags, delta encodings),
``ClusteringPrefix.serializer.serializeValuesWithoutSize`` (per-32-column
2-bit header vint), ``Columns.serializer`` (subset bitmap),
``SerializationHeader.serializer`` (Statistics.db HEADER component),
``DeletionTime.serializer`` (raw i32 ldt + i64 mfda at partition level,
delta-encoded vints inside rows), and the vint spec (leading-one count =
extra bytes; values < 0x80 encode as themselves — every variable-length
integer in this fixture is deliberately < 128 so each is its literal
single byte, anchored by tests/test_modern.py::test_vint_known_encodings).

Schema: pk UTF8 | ck UTF8 | static owner UTF8 | name UTF8,
score LongType (fixed 8), tags ListType(UTF8) (complex).

Covered shapes: static row, multi-row partition, variable-length
clustering, column subset bitmap, complex (collection) deletion + cell
paths, EXCLUSIVE range-tombstone end, an EXCL_END_INCL_START boundary
marker, partition-level deletion (empty-partition keep), row TTL with
row-timestamp/ttl-reusing cells, and a cell tombstone.
"""

from __future__ import annotations

import struct

_U16 = struct.Struct(">H")
_I32 = struct.Struct(">i")
_I64 = struct.Struct(">q")

UTF8 = "org.apache.cassandra.db.marshal.UTF8Type"
LONG = "org.apache.cassandra.db.marshal.LongType"
LIST_UTF8 = f"org.apache.cassandra.db.marshal.ListType({UTF8})"

#: EncodingStats epochs (Cassandra EncodingStats.java: 2015-09-22 UTC)
EPOCH_TS = 1442880000 * 1_000_000  # micros
EPOCH_LDT = 1442880000  # seconds
LONG_MIN = -(1 << 63)
NO_DELETION_LDT = 0x7FFFFFFF

# header minimums chosen == epochs so every delta below is the plain
# small integer written as its own single vint byte
MIN_TS = EPOCH_TS
MIN_LDT = EPOCH_LDT
MIN_TTL = 0


def T(n: int) -> int:
    return MIN_TS + n


def L(n: int) -> int:
    return MIN_LDT + n


def _b(*vals: int) -> bytes:
    """Literal bytes; every entry must fit one byte (vints < 0x80)."""
    assert all(0 <= v <= 0xFF for v in vals)
    return bytes(vals)


def _comp(vals: list[bytes], eoc: int = 0, static: bool = False) -> bytes:
    """2.x composite for EXPECTED names (output mapping, not file bytes)."""
    out = bytearray()
    if static:
        out += b"\xff\xff"
    for i, v in enumerate(vals):
        out += _U16.pack(len(v)) + v
        out.append(eoc if i == len(vals) - 1 else 0)
    return bytes(out)


def _row(flags: int, body: bytes, *, extended: int | None = None,
         clustering: bytes = b"") -> bytes:
    """flags [extended] clustering body_size prev_size body.

    body_size/prev_size are unsigned vints of the real body length (all
    fixture bodies are < 128 bytes, so single literal bytes)."""
    assert len(body) < 0x80
    out = bytearray([flags])
    if extended is not None:
        out.append(extended)
    out += clustering
    out.append(len(body))  # body size (uvint, < 128)
    out.append(0x00)  # previous row size (unused by readers scanning forward)
    out += body
    return bytes(out)


def _marker(kind: int, values: list[bytes], deltas: bytes) -> bytes:
    """kind u16(n) values(header-vint + uvint-len'd) body prev deltas."""
    out = bytearray([0x02])  # flags: IS_MARKER
    out.append(kind)
    out += _U16.pack(len(values))
    out.append(0x00)  # serializeValuesWithoutSize header vint: all present
    for v in values:
        assert len(v) < 0x80
        out.append(len(v))
        out += v
    out.append(len(deltas))  # body size
    out.append(0x00)  # prev size
    out += deltas
    return bytes(out)


def build_data_db() -> bytes:
    """The hand-assembled Data.db stream (uncompressed, ma big format)."""
    out = bytearray()

    # ---- partition p1 (live) ------------------------------------------
    out += _U16.pack(2) + b"p1"
    out += _I32.pack(NO_DELETION_LDT) + _I64.pack(LONG_MIN)  # live partition

    # static row: EXTENSION_FLAG|HAS_ALL_COLUMNS, extended IS_STATIC.
    # body: one cell for 'owner' -> flags 0x00 (live, own ts, has value),
    # ts delta 10, value uvint 5 + 'alice'
    out += _row(
        0x80 | 0x20,
        _b(0x00, 10, 5) + b"alice",
        extended=0x01,
    )

    # row ck='a': HAS_TIMESTAMP|HAS_ALL_COLUMNS|HAS_COMPLEX_DELETION.
    # clustering: header vint 0x00, uvint 1 + 'a'
    # body: liveness ts delta 20; cells in superset order name,score,tags:
    #   name: flags 0, ts delta 21, uvint 5 'alpha'
    #   score: flags 0, ts delta 22, FIXED 8 bytes (no length prefix) = 42
    #   tags (complex): deletion deltas mfda 15 / ldt 1, cell count 2,
    #     each cell: flags 0, ts delta, path uvint+bytes, value uvint+bytes
    out += _row(
        0x04 | 0x20 | 0x40,
        _b(20)
        + _b(0x00, 21, 5) + b"alpha"
        + _b(0x00, 22) + _I64.pack(42)
        + _b(15, 1)  # complex deletion (T(15), L(1))
        + _b(2)      # two collection cells
        + _b(0x00, 23, 1, 0x01, 3) + b"red"
        + _b(0x00, 24, 1, 0x02, 4) + b"blue",
        clustering=_b(0x00, 1) + b"a",
    )

    # row ck='bb' (variable-length clustering): subset row — missing
    # score (bit 1) and tags (bit 2) -> bitmap 0b110 = 6
    out += _row(
        0x04,
        _b(30, 6) + _b(0x00, 31, 4) + b"beta",
        clustering=_b(0x00, 2) + b"bb",
    )

    # open bound: DELETE WHERE ck >= 'c' AND ck < 'd' (EXCLUSIVE end)
    out += _marker(1, [b"c"], _b(50, 5))  # KIND_INCL_START_BOUND

    # row ck='cc' inside [c, d): shadowed by the RT after compaction
    out += _row(
        0x04,
        _b(40, 6) + _b(0x00, 41, 6) + b"doomed",
        clustering=_b(0x00, 2) + b"cc",
    )

    out += _marker(0, [b"d"], _b(50, 5))  # KIND_EXCL_END_BOUND

    # adjacent ranges via a boundary: [e..f) del T(60), then [f..g] T(61)
    out += _marker(1, [b"e"], _b(60, 6))  # INCL_START
    # KIND_EXCL_END_INCL_START_BOUNDARY: END deltas then START deltas
    out += _marker(2, [b"f"], _b(60, 6) + _b(61, 7))
    out += _marker(6, [b"g"], _b(61, 7))  # KIND_INCL_END_BOUND

    out += _b(0x01)  # END_OF_PARTITION

    # ---- partition p2: partition-level deletion, no rows --------------
    out += _U16.pack(2) + b"p2"
    out += _I32.pack(L(2)) + _I64.pack(T(5))
    out += _b(0x01)

    # ---- partition p3: row TTL + cell tombstone -----------------------
    out += _U16.pack(2) + b"p3"
    out += _I32.pack(NO_DELETION_LDT) + _I64.pack(LONG_MIN)
    # row ck='t': HAS_TIMESTAMP|HAS_TTL, subset (tags missing -> bitmap 4)
    # body: ts delta 70, ttl delta 100, ldt delta 8, subset, then:
    #   name: expiring, reuses row ts+ttl:
    #     flags CELL_IS_EXPIRING|CELL_USE_ROW_TIMESTAMP|CELL_USE_ROW_TTL
    #     = 0x02|0x08|0x10 = 0x1A; value uvint 3 'ttl'
    #   score tombstone: flags CELL_IS_DELETED|CELL_HAS_EMPTY_VALUE = 0x05,
    #     ts delta 71, own ldt delta 9 (no value bytes)
    out += _row(
        0x04 | 0x08,
        _b(70, 100, 8, 4)
        + _b(0x1A, 3) + b"ttl"
        + _b(0x05, 71, 9),
        clustering=_b(0x00, 1) + b"t",
    )
    out += _b(0x01)

    return bytes(out)


def build_statistics_db() -> bytes:
    """Hand-built Statistics.db: TOC + SERIALIZATION (HEADER) component.

    TOC: i32 count, then (i32 type, i32 offset) pairs; type 3 is the
    serialization header. Component: EncodingStats vint deltas from the
    2015-09-22 epochs, then key type, clustering types, static and
    regular columns (uvint-length-prefixed names and marshal classes)."""

    def s(x: str) -> bytes:
        b = x.encode()
        assert len(b) < 0x80
        return bytes([len(b)]) + b

    comp = (
        _b(0)  # minTimestamp delta (MIN_TS == epoch)
        + _b(0)  # minLocalDeletionTime delta
        + _b(0)  # minTTL delta
        + s(UTF8)  # partition key type
        + _b(1) + s(UTF8)  # one clustering column: UTF8
        + _b(1) + s("owner") + s(UTF8)  # statics
        + _b(3)  # regulars
        + s("name") + s(UTF8)
        + s("score") + s(LONG)
        + s("tags") + s(LIST_UTF8)
    )
    toc = _I32.pack(2) + struct.pack(">ii", 2, 999) + struct.pack(">ii", 3, 20)
    return toc + comp


def expected_rows(source_path: str, generation: int = 0) -> list[tuple]:
    """The exact canonical cell tuples the decode must produce, derived
    BY HAND from the bytes above and the 2.x composite-name mapping
    (clustering components + u16-len'd column name + optional path)."""
    sp, g = source_path, generation
    live = LONG_MIN

    def name(ck: bytes, col: bytes, path: bytes | None = None,
             static: bool = False) -> bytes:
        vals = ([b""] if static else [ck]) + [col]
        n = _comp(vals, static=static)
        if path is not None:
            n += _U16.pack(len(path)) + path + b"\x00"
        return n

    return [
        # p1 static row
        (sp, g, b"p1", live, "c", name(b"", b"owner", static=True), None,
         b"alice", T(10), None, None, None),
        # p1 row 'a': marker, name, score, tags deletion RT, tag cells
        (sp, g, b"p1", live, "c", _comp([b"a"]) + b"\x00\x00\x00", None,
         b"", T(20), None, None, None),
        (sp, g, b"p1", live, "c", name(b"a", b"name"), None,
         b"alpha", T(21), None, None, None),
        (sp, g, b"p1", live, "c", name(b"a", b"score"), None,
         _I64.pack(42), T(22), None, None, None),
        (sp, g, b"p1", live, "t", _comp([b"a", b"tags"], eoc=0x00),
         _comp([b"a", b"tags"], eoc=0x01), None, T(15), None, L(1), None),
        (sp, g, b"p1", live, "c", name(b"a", b"tags", b"\x01"), None,
         b"red", T(23), None, None, None),
        (sp, g, b"p1", live, "c", name(b"a", b"tags", b"\x02"), None,
         b"blue", T(24), None, None, None),
        # p1 row 'bb' (subset)
        (sp, g, b"p1", live, "c", _comp([b"bb"]) + b"\x00\x00\x00", None,
         b"", T(30), None, None, None),
        (sp, g, b"p1", live, "c", name(b"bb", b"name"), None,
         b"beta", T(31), None, None, None),
        # p1 row 'cc' (inside the RT)
        (sp, g, b"p1", live, "c", _comp([b"cc"]) + b"\x00\x00\x00", None,
         b"", T(40), None, None, None),
        (sp, g, b"p1", live, "c", name(b"cc", b"name"), None,
         b"doomed", T(41), None, None, None),
        # RT [c, d): inclusive start eoc 0x00, EXCLUSIVE end eoc 0x00
        (sp, g, b"p1", live, "t", _comp([b"c"], eoc=0x00),
         _comp([b"d"], eoc=0x00), None, T(50), None, L(5), None),
        # boundary: [e, f) then [f, g]
        (sp, g, b"p1", live, "t", _comp([b"e"], eoc=0x00),
         _comp([b"f"], eoc=0x00), None, T(60), None, L(6), None),
        (sp, g, b"p1", live, "t", _comp([b"f"], eoc=0x00),
         _comp([b"g"], eoc=0x01), None, T(61), None, L(7), None),
        # p2: deleted empty partition (P7 keep)
        (sp, g, b"p2", T(5), "r", None, None, None, LONG_MIN, None, None,
         None),
        # p3 row 't': TTL'd row marker, expiring cell, cell tombstone
        (sp, g, b"p3", live, "e", _comp([b"t"]) + b"\x00\x00\x00", None,
         b"", T(70), 100, L(8), None),
        (sp, g, b"p3", live, "e", name(b"t", b"name"), None,
         b"ttl", T(70), 100, L(8), None),
        (sp, g, b"p3", live, "d", name(b"t", b"score"), None,
         _I32.pack(L(9)), T(71), None, L(9), None),
    ]


def write_fixture(dirpath: str) -> str:
    """Write Data.db + Statistics.db into dirpath; returns the data path."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    data_path = os.path.join(dirpath, "ma-1-big-Data.db")
    with open(data_path, "wb") as f:
        f.write(build_data_db())
    with open(os.path.join(dirpath, "ma-1-big-Statistics.db"), "wb") as f:
        f.write(build_statistics_db())
    return data_path


def build_gen2_data_raw() -> bytes:
    """Second generation (overwrites for cross-generation LWW), raw bytes."""
    out = bytearray()
    out += _U16.pack(2) + b"p1"
    out += _I32.pack(NO_DELETION_LDT) + _I64.pack(LONG_MIN)
    # static owner overwrite: ts 80 > gen1's 10
    out += _row(0x80 | 0x20, _b(0x00, 80, 3) + b"bob", extended=0x01)
    # row 'a' name overwrite: ts 90 > gen1's 21 (subset: only 'name')
    out += _row(
        0x04,
        _b(89, 6) + _b(0x00, 90, 5) + b"ALPHA",
        clustering=_b(0x00, 1) + b"a",
    )
    # four fresh rows so the stream spans multiple 32-byte chunks
    for i, ck in enumerate((b"w0", b"w1", b"w2", b"w3")):
        out += _row(
            0x04,
            _b(91 + i, 6) + _b(0x00, 95 + i, 4) + b"new" + bytes([0x30 + i]),
            clustering=_b(0x00, 2) + ck,
        )
    out += _b(0x01)
    return bytes(out)


def build_gen2_compressed() -> tuple[bytes, bytes]:
    """(Data.db, CompressionInfo.db) for gen2, DEFLATE-chunked by hand per
    the public sidecar layout (CompressionMetadata.java:37-107): UTF
    compressor simple name, i32 option count, i32 chunk length, i64 total
    uncompressed length, i32 chunk count + i64 offsets; each Data.db
    chunk is [zlib deflate][4-byte CRC32 checksum, skipped by readers].
    A 32-byte chunk length forces MULTIPLE chunks so the chunk-map random
    access is actually exercised."""
    import zlib

    raw = build_gen2_data_raw()
    chunk_len = 32
    chunks = [raw[i : i + chunk_len] for i in range(0, len(raw), chunk_len)]
    assert len(chunks) >= 2, "fixture must span multiple chunks"
    data = bytearray()
    offsets = []
    for ch in chunks:
        offsets.append(len(data))
        comp = zlib.compress(ch, 6)
        data += comp
        data += struct.pack(">I", zlib.crc32(comp))
    name = b"DeflateCompressor"
    info = bytearray()
    info += _U16.pack(len(name)) + name
    info += _I32.pack(0)  # no options
    info += _I32.pack(chunk_len)
    info += _I64.pack(len(raw))
    info += _I32.pack(len(offsets))
    for off in offsets:
        info += _I64.pack(off)
    return bytes(data), bytes(info)


def write_fixture_gen2(dirpath: str) -> str:
    import os

    os.makedirs(dirpath, exist_ok=True)
    data, info = build_gen2_compressed()
    data_path = os.path.join(dirpath, "ma-2-big-Data.db")
    with open(data_path, "wb") as f:
        f.write(data)
    with open(os.path.join(dirpath, "ma-2-big-CompressionInfo.db"), "wb") as f:
        f.write(info)
    with open(os.path.join(dirpath, "ma-2-big-Statistics.db"), "wb") as f:
        f.write(build_statistics_db())
    return data_path
