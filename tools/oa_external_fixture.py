"""An externally-derived Cassandra 5.0 "oa" fixture: every byte placed by
hand from the published on-disk format, with NO import of the repo's
``modern_writer`` — the same self-certification bar as the round-6 ma
fixture (tools/ma_external_fixture.py), extended to the two things "oa"
adds and the one thing the ma fixture lacked:

- 5.0 DeletionTime (CASSANDRA-14227): the partition-level
  localDeletionTime is an UNSIGNED int (0xFFFFFFFF = live sentinel,
  real values reach 2106), and in-row vint-delta ldts can exceed 2038 —
  both are exercised with a real year-2100 deletion.
- 4.0+ checksummed Statistics metadata (MetadataSerializer
  hasMetadataChecksum): CRC32 after the count int (running), after the
  TOC ints (same running CRC), and after each component (fresh, over
  that component's serialized bytes). The TOC here carries TWO entries
  so the reader proves it navigates a multi-component checksummed TOC.
- TYPED clustering in external bytes: ck0 LongType (fixed 8-byte,
  signed) + ck1 ReversedType(UTF8Type). The range tombstone spans
  [-10 .. 0] over a row at ck0 = -5: raw composite bytes rank negative
  longs ABOVE positives (two's complement sets the sign bit), so a
  raw-byte inclusive range check sees an inverted/empty range and keeps
  the doomed row — only the comparator-aware typed sort key
  (functions/sortkeys.py) shadows it. The ma fixture's clustering was
  UTF8-only; this closes the external-bytes gap for the typed paths.

Format sources (public): Cassandra 5.0 ``UnfilteredSerializer``,
``Cell.serializer``, ``ClusteringPrefix.serializer``,
``Columns.serializer``, ``SerializationHeader.serializer``,
``DeletionTime.Serializer`` (uint variant, BigFormat hasUIntDeletionTime),
``MetadataSerializer`` (checksummed layout, FBUtilities.updateChecksumInt
= big-endian int bytes into a running CRC32), and VIntCoding. All vints
are single literal bytes (< 0x80) except the one deliberate post-2038
ldt delta, hand-derived below.
"""

from __future__ import annotations

import struct
import zlib

_U16 = struct.Struct(">H")
_I32 = struct.Struct(">i")
_U32 = struct.Struct(">I")
_I64 = struct.Struct(">q")

UTF8 = "org.apache.cassandra.db.marshal.UTF8Type"
LONG = "org.apache.cassandra.db.marshal.LongType"
REV_UTF8 = f"org.apache.cassandra.db.marshal.ReversedType({UTF8})"

#: EncodingStats epochs (Cassandra EncodingStats.java: 2015-09-22 UTC)
EPOCH_TS = 1442880000 * 1_000_000  # micros
EPOCH_LDT = 1442880000  # seconds
LONG_MIN = -(1 << 63)
INT32_MAX = 0x7FFFFFFF

MIN_TS = EPOCH_TS
MIN_LDT = EPOCH_LDT

#: a deletion time in the year 2100 — representable only with 5.0's
#: unsigned/widened localDeletionTime (CASSANDRA-14227's whole point)
LDT_2100 = 4_102_444_800  # 2100-01-01 UTC, > Integer.MAX_VALUE
#: its delta against MIN_LDT: 4102444800 - 1442880000 = 2659564800 =
#: 0x9E85BD00 (32 bits) -> 5-byte unsigned vint: leading byte 0xF0
#: (four extension bytes), then the value's own four big-endian bytes
LDT_2100_DELTA_VINT = bytes([0xF0, 0x9E, 0x85, 0xBD, 0x00])


def T(n: int) -> int:
    return MIN_TS + n


def L(n: int) -> int:
    return MIN_LDT + n


def _b(*vals: int) -> bytes:
    """Literal bytes; every entry must fit one byte (vints < 0x80)."""
    assert all(0 <= v <= 0xFF for v in vals)
    return bytes(vals)


def _comp(vals: list[bytes], eoc: int = 0) -> bytes:
    """2.x composite for EXPECTED names (output mapping, not file bytes)."""
    out = bytearray()
    for i, v in enumerate(vals):
        out += _U16.pack(len(v)) + v
        out.append(eoc if i == len(vals) - 1 else 0)
    return bytes(out)


def _row(flags: int, body: bytes, *, clustering: bytes = b"") -> bytes:
    """flags clustering body_size prev_size body (all sizes < 128)."""
    assert len(body) < 0x80
    out = bytearray([flags])
    out += clustering
    out.append(len(body))  # body size (uvint, < 128)
    out.append(0x00)  # previous row size (unused scanning forward)
    out += body
    return bytes(out)


def _ck(ck0: int, ck1: bytes) -> bytes:
    """Clustering block for (LongType, ReversedType(UTF8)): one 2-bit
    header vint for both columns (0x00 = both present, non-empty), then
    the FIXED 8-byte long (no length prefix) and the uvint-len'd text
    (ReversedType stores plain value bytes; only comparison inverts)."""
    assert len(ck1) < 0x80
    return _b(0x00) + _I64.pack(ck0) + bytes([len(ck1)]) + ck1


def _marker_long(kind: int, ck0: int, deltas: bytes) -> bytes:
    """A prefix bound on ck0 only: kind, u16 n_values=1, one header vint,
    the fixed 8-byte long, body size, prev size, deletion deltas."""
    out = bytearray([0x02])  # flags: IS_MARKER
    out.append(kind)
    out += _U16.pack(1)
    out += _b(0x00) + _I64.pack(ck0)
    out.append(len(deltas))
    out.append(0x00)
    out += deltas
    return bytes(out)


def build_data_db() -> bytes:
    """The hand-assembled Data.db stream (uncompressed, oa big format)."""
    out = bytearray()

    # ---- partition p1 (live: 5.0 uint sentinel ldt) --------------------
    out += _U16.pack(2) + b"p1"
    out += _U32.pack(0xFFFFFFFF) + _I64.pack(LONG_MIN)  # live (oa encoding)

    # open bound: DELETE WHERE ck0 >= -10 ... (prefix bound, typed order:
    # -10 < -5 < 0 < 10; raw composite bytes would order -10, -5 ABOVE 10)
    out += _marker_long(1, -10, _b(40, 4))  # KIND_INCL_START_BOUND T(40) L(4)

    # row (-5, 'x'): HAS_TIMESTAMP|HAS_ALL_COLUMNS; shadowed by the RT
    # body: liveness ts delta 10; cell 'name': flags 0, ts delta 11,
    # uvint 6 + 'doomed'
    out += _row(
        0x04 | 0x20,
        _b(10) + _b(0x00, 11, 6) + b"doomed",
        clustering=_ck(-5, b"x"),
    )

    out += _marker_long(6, 0, _b(40, 4))  # KIND_INCL_END_BOUND ... AND ck0 <= 0

    # rows at ck0 = 10: ck1 is REVERSED UTF8, so 'b' sorts before 'a'
    out += _row(
        0x04 | 0x20,
        _b(20) + _b(0x00, 21, 6) + b"keep-b",
        clustering=_ck(10, b"b"),
    )
    out += _row(
        0x04 | 0x20,
        _b(30) + _b(0x00, 31, 6) + b"keep-a",
        clustering=_ck(10, b"a"),
    )

    out += _b(0x01)  # END_OF_PARTITION

    # ---- partition p2: YEAR-2100 partition deletion, no rows -----------
    out += _U16.pack(2) + b"p2"
    out += _U32.pack(LDT_2100) + _I64.pack(T(50))  # 0xF4865700 unsigned
    out += _b(0x01)

    # ---- partition p3: row tombstone with a post-2038 delta ldt --------
    out += _U16.pack(2) + b"p3"
    out += _U32.pack(0xFFFFFFFF) + _I64.pack(LONG_MIN)
    # row (7, 'q'): HAS_DELETION only; column subset vint 1 = the single
    # regular column 'name' is MISSING (no cells follow)
    out += _row(
        0x10,
        _b(60) + LDT_2100_DELTA_VINT + _b(1),
        clustering=_ck(7, b"q"),
    )
    out += _b(0x01)

    return bytes(out)


def build_statistics_db() -> bytes:
    """Hand-built CHECKSUMMED Statistics.db (oa >= na layout):

        i32 count=2, u32 crc32(count bytes)            [running CRC]
        (i32 type=2 STATS,  i32 pos=28)
        (i32 type=3 HEADER, i32 pos=36)
        u32 crc32(count bytes + all 4 TOC ints)        [same running CRC]
        STATS: 4 dummy bytes + u32 crc32(those bytes)  [fresh CRC]
        HEADER component bytes + u32 crc32(bytes)      [fresh CRC]

    The reader only consumes the HEADER component, but must walk the
    checksummed TOC to find it and bound it at the sibling's position."""

    def s(x: str) -> bytes:
        b = x.encode()
        assert len(b) < 0x80
        return bytes([len(b)]) + b

    comp = (
        _b(0)  # minTimestamp delta (MIN_TS == epoch)
        + _b(0)  # minLocalDeletionTime delta
        + _b(0)  # minTTL delta
        + s(UTF8)  # partition key type
        + _b(2) + s(LONG) + s(REV_UTF8)  # clustering: Long, Reversed(UTF8)
        + _b(0)  # no statics
        + _b(1) + s("name") + s(UTF8)  # regulars
    )
    stats_dummy = b"\x00\x00\x00\x00"
    count = _I32.pack(2)
    toc = struct.pack(">ii", 2, 28) + struct.pack(">ii", 3, 36)
    assert 28 == 4 + 4 + 16 + 4  # count + crc + toc + crc
    assert 36 == 28 + len(stats_dummy) + 4
    return (
        count
        + _U32.pack(zlib.crc32(count))
        + toc
        + _U32.pack(zlib.crc32(count + toc))
        + stats_dummy
        + _U32.pack(zlib.crc32(stats_dummy))
        + comp
        + _U32.pack(zlib.crc32(comp))
    )


def expected_rows(source_path: str, generation: int = 0) -> list[tuple]:
    """The exact canonical cell tuples the decode must produce, derived
    BY HAND from the bytes above and the 2.x composite-name mapping.
    Post-2038 ldts appear SATURATED at Integer.MAX_VALUE in the int32
    canonical schema (mfda/ts stay exact); the live-partition sentinel
    decodes as live (deleted_at = Long.MIN_VALUE)."""
    sp, g = source_path, generation
    live = LONG_MIN

    def name(ck0: int, ck1: bytes, col: bytes) -> bytes:
        return _comp([_I64.pack(ck0), ck1, col])

    def marker_name(ck0: int, ck1: bytes) -> bytes:
        return _comp([_I64.pack(ck0), ck1, b""])

    return [
        # p1 row (-5, 'x'): liveness marker + doomed cell
        (sp, g, b"p1", live, "c", marker_name(-5, b"x"), None,
         b"", T(10), None, None, None),
        (sp, g, b"p1", live, "c", name(-5, b"x", b"name"), None,
         b"doomed", T(11), None, None, None),
        # RT [-10 .. 0] emitted when the inclusive end bound closes
        (sp, g, b"p1", live, "t", _comp([_I64.pack(-10)], eoc=0x00),
         _comp([_I64.pack(0)], eoc=0x01), None, T(40), None, L(4), None),
        # p1 rows at ck0=10 (file order: reversed ck1 puts 'b' first)
        (sp, g, b"p1", live, "c", marker_name(10, b"b"), None,
         b"", T(20), None, None, None),
        (sp, g, b"p1", live, "c", name(10, b"b", b"name"), None,
         b"keep-b", T(21), None, None, None),
        (sp, g, b"p1", live, "c", marker_name(10, b"a"), None,
         b"", T(30), None, None, None),
        (sp, g, b"p1", live, "c", name(10, b"a", b"name"), None,
         b"keep-a", T(31), None, None, None),
        # p2: year-2100 partition deletion, empty-partition keep (P7);
        # deleted_at (mfda) is exact — only ldt is schema-saturated
        (sp, g, b"p2", T(50), "r", None, None, None, LONG_MIN, None, None,
         None),
        # p3: row tombstone -> 2.x RT pair over the clustering prefix,
        # ldt saturated at Integer.MAX_VALUE
        (sp, g, b"p3", live, "t",
         _comp([_I64.pack(7), b"q"], eoc=0x00),
         _comp([_I64.pack(7), b"q"], eoc=0x01),
         None, T(60), None, INT32_MAX, None),
    ]


def write_fixture(dirpath: str) -> str:
    """Write Data.db + Statistics.db into dirpath; returns the data path."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    data_path = os.path.join(dirpath, "oa-1-big-Data.db")
    with open(data_path, "wb") as f:
        f.write(build_data_db())
    with open(os.path.join(dirpath, "oa-1-big-Statistics.db"), "wb") as f:
        f.write(build_statistics_db())
    return data_path
