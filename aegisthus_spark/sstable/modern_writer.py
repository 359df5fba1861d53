"""Cassandra 3.x "ma" big-format SSTable writer (fixture + sink side).

Inverse of :mod:`modern` — serializes partitions into Data.db +
Statistics.db (+ Index.db) in the public 3.0 on-disk format, computing
real EncodingStats minima and header-delta vints. Used to build ma
fixtures for the decoder's golden tests (the decode path is additionally
pinned by HAND-WRITTEN byte literals in tests/test_modern.py, so a
writer/decoder co-bug cannot self-certify) and as the 3.x counterpart of
the 2.x `writer.py` sink.

Input model (one dict per partition):

    {"key": bytes,
     "deletion": (mfda, ldt) | None,        # partition tombstone
     "rows": [row | marker, ...]}           # in clustering order

    row = {"clustering": [bytes, ...],
           "liveness": (ts,) | (ts, ttl, ldt) | None,   # pk liveness
           "deletion": (mfda, ldt) | None,              # row tombstone
           "static": bool,
           "cells": [{"column": bytes, "value": bytes, "ts": int | None,
                      "deleted": ldt | None, "expiring": (ttl, ldt) | None,
                      "path": bytes | None}, ...]}

    marker = {"marker": kind_ordinal, "clustering": [bytes, ...],
              "deletion": (mfda, ldt),                  # bound deletion
              "deletion2": (mfda, ldt)}                 # boundaries only
"""

from __future__ import annotations

import os
import struct

from .modern import (
    CELL_HAS_EMPTY_VALUE,
    LIVE_LDT_UINT,
    CELL_IS_DELETED,
    CELL_IS_EXPIRING,
    CELL_USE_ROW_TIMESTAMP,
    CELL_USE_ROW_TTL,
    DELETION_TIME_EPOCH,
    END_OF_PARTITION,
    EXTENSION_FLAG,
    HAS_ALL_COLUMNS,
    HAS_COMPLEX_DELETION,
    HAS_DELETION,
    HAS_TIMESTAMP,
    HAS_TTL,
    IS_MARKER,
    IS_STATIC,
    KIND_EXCL_END_INCL_START_BOUNDARY,
    KIND_INCL_END_EXCL_START_BOUNDARY,
    LONG_MIN,
    METADATA_HEADER,
    NO_DELETION_LDT,
    SerializationHeader,
    TIMESTAMP_EPOCH,
    TTL_EPOCH,
    fixed_size_of,
    is_complex,
    vint_len,
    write_unsigned_vint,
)

_U16 = struct.Struct(">H")
_I32 = struct.Struct(">i")
_I64 = struct.Struct(">q")

UTF8 = "org.apache.cassandra.db.marshal.UTF8Type"


def _uv(value: int) -> bytes:
    return write_unsigned_vint(value)


def _value_bytes(v: bytes, fixed: int) -> bytes:
    if fixed >= 0:
        if len(v) != fixed:
            raise ValueError(f"fixed-size type wants {fixed} bytes, got {len(v)}")
        return v
    return _uv(len(v)) + v


def _clustering_blocks(values, sizes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(values):
        limit = min(len(values), i + 32)
        hdr = 0
        body = bytearray()
        for j in range(i, limit):
            v = values[j]
            shift = (j - i) * 2
            if v is None:
                hdr |= 1 << (shift + 1)
            elif len(v) == 0:
                hdr |= 1 << shift
            else:
                body += _value_bytes(v, sizes[j])
        out += _uv(hdr) + body
        i = limit
    return bytes(out)


class _Stats:
    """EncodingStats collection over everything written."""

    def __init__(self):
        self.min_ts: int | None = None
        self.min_ldt: int | None = None
        self.min_ttl: int | None = None

    def ts(self, v):
        if v is not None and v != LONG_MIN:
            self.min_ts = v if self.min_ts is None else min(self.min_ts, v)

    def ldt(self, v):
        if v is not None and v != NO_DELETION_LDT:
            self.min_ldt = v if self.min_ldt is None else min(self.min_ldt, v)

    def ttl(self, v):
        if v:
            self.min_ttl = v if self.min_ttl is None else min(self.min_ttl, v)

    def header(self, key_type, clustering_types, static_cols, regular_cols):
        return SerializationHeader(
            min_timestamp=self.min_ts if self.min_ts is not None else TIMESTAMP_EPOCH,
            min_local_deletion_time=(
                self.min_ldt if self.min_ldt is not None else DELETION_TIME_EPOCH
            ),
            min_ttl=self.min_ttl if self.min_ttl is not None else TTL_EPOCH,
            key_type=key_type,
            clustering_types=tuple(clustering_types),
            static_columns=tuple(static_cols),
            regular_columns=tuple(regular_cols),
        )


def _collect_stats(partitions) -> _Stats:
    st = _Stats()
    for p in partitions:
        if p.get("deletion"):
            mfda, ldt = p["deletion"]
            st.ts(mfda)
            st.ldt(ldt)
        for r in p.get("rows", ()):
            if "marker" in r:
                for k in ("deletion", "deletion2"):
                    if r.get(k):
                        st.ts(r[k][0])
                        st.ldt(r[k][1])
                continue
            lv = r.get("liveness")
            if lv:
                st.ts(lv[0])
                if len(lv) == 3:
                    st.ttl(lv[1])
                    st.ldt(lv[2])
            if r.get("deletion"):
                st.ts(r["deletion"][0])
                st.ldt(r["deletion"][1])
            for c in r.get("cells", ()):
                if c.get("ts") is not None:
                    st.ts(c["ts"])
                if c.get("deleted") is not None:
                    st.ldt(c["deleted"])
                if c.get("expiring"):
                    st.ttl(c["expiring"][0])
                    st.ldt(c["expiring"][1])
    return st


def _serialize_header_component(h: SerializationHeader) -> bytes:
    def with_vint_len(b: bytes) -> bytes:
        return _uv(len(b)) + b

    out = bytearray()
    out += _uv((h.min_timestamp - TIMESTAMP_EPOCH) & ((1 << 64) - 1))
    out += _uv((h.min_local_deletion_time - DELETION_TIME_EPOCH) & ((1 << 64) - 1))
    out += _uv((h.min_ttl - TTL_EPOCH) & ((1 << 64) - 1))
    out += with_vint_len(h.key_type.encode())
    out += _uv(len(h.clustering_types))
    for t in h.clustering_types:
        out += with_vint_len(t.encode())
    for cols in (h.static_columns, h.regular_columns):
        out += _uv(len(cols))
        for name, t in cols:
            out += with_vint_len(name)
            out += with_vint_len(t.encode())
    return bytes(out)


def write_statistics_db(
    path: str, h: SerializationHeader, version: str = "ma"
) -> None:
    """Statistics.db with a single-component TOC (HEADER) — sufficient
    for decode; real files also carry VALIDATION/COMPACTION/STATS.

    4.0+ ("na"..) metadata is checksummed (MetadataSerializer
    hasMetadataChecksum): a running CRC32 written after the count int and
    again after the TOC ints, then a fresh CRC32 after each component
    over its serialized bytes."""
    import zlib

    from .descriptor import has_metadata_checksum

    comp = _serialize_header_component(h)
    if has_metadata_checksum(version):
        count = _I32.pack(1)
        toc_entry = struct.pack(">ii", METADATA_HEADER, 4 + 4 + 8 + 4)
        out = (
            count
            + struct.pack(">I", zlib.crc32(count))
            + toc_entry
            + struct.pack(">I", zlib.crc32(count + toc_entry))
            + comp
            + struct.pack(">I", zlib.crc32(comp))
        )
    else:
        out = _I32.pack(1) + struct.pack(">ii", METADATA_HEADER, 4 + 8) + comp
    with open(path, "wb") as f:
        f.write(out)


def _dt_deltas(h, mfda, ldt) -> bytes:
    return _uv((mfda - h.min_timestamp) & ((1 << 64) - 1)) + _uv(
        (ldt - h.min_local_deletion_time) & ((1 << 64) - 1)
    )


def _serialize_cell(h, c, meta_by_name, row_lv) -> bytes:
    name = c["column"]
    _t, fixed, cplx = meta_by_name[name]
    deleted = c.get("deleted") is not None
    expiring = c.get("expiring") is not None
    value = c.get("value", b"")
    ts = c.get("ts")
    use_row_ts = ts is None and row_lv is not None
    if ts is None:
        if row_lv is None:
            raise ValueError("cell without ts in a row without liveness")
        ts = row_lv[0]
    use_row_ttl = (
        expiring
        and row_lv is not None
        and len(row_lv) == 3
        and c["expiring"] == (row_lv[1], row_lv[2])
    )
    flags = 0
    if deleted:
        flags |= CELL_IS_DELETED
        value = b""
    if expiring:
        flags |= CELL_IS_EXPIRING
    if not value:
        flags |= CELL_HAS_EMPTY_VALUE
    if use_row_ts:
        flags |= CELL_USE_ROW_TIMESTAMP
    if use_row_ttl:
        flags |= CELL_USE_ROW_TTL
    out = bytearray([flags])
    if not use_row_ts:
        out += _uv((ts - h.min_timestamp) & ((1 << 64) - 1))
    if (deleted or expiring) and not use_row_ttl:
        ldt = c["deleted"] if deleted else c["expiring"][1]
        out += _uv((ldt - h.min_local_deletion_time) & ((1 << 64) - 1))
        if expiring:
            out += _uv((c["expiring"][0] - h.min_ttl) & ((1 << 64) - 1))
    if cplx:
        path = c.get("path")
        if path is None:
            raise ValueError("complex cell needs a path")
        out += _uv(len(path)) + path
    if value:
        out += _value_bytes(value, fixed)
    return bytes(out)


def _serialize_row(h, r, clustering_sizes, static_meta, regular_meta, prev_size):
    static = bool(r.get("static"))
    lv = r.get("liveness")
    deletion = r.get("deletion")
    meta = static_meta if static else regular_meta
    meta_by_name = {name: (t, fx, cx) for name, t, fx, cx in meta}
    cells = sorted(r.get("cells", ()), key=lambda c: c["column"])
    present = []
    seen = set()
    for c in cells:
        if c["column"] not in meta_by_name:
            raise ValueError(f"unknown column {c['column']!r}")
        if c["column"] not in seen:
            present.append(c["column"])
            seen.add(c["column"])
    has_complex_del = any(
        meta_by_name[c["column"]][2] and c.get("complex_deletion") for c in cells
    )

    flags = 0
    if lv:
        flags |= HAS_TIMESTAMP
        if len(lv) == 3:
            flags |= HAS_TTL
    if deletion:
        flags |= HAS_DELETION
    if len(present) == len(meta):
        flags |= HAS_ALL_COLUMNS
    if has_complex_del:
        flags |= HAS_COMPLEX_DELETION
    extended = IS_STATIC if static else 0
    if extended:
        flags |= EXTENSION_FLAG

    body = bytearray()
    if lv:
        body += _uv((lv[0] - h.min_timestamp) & ((1 << 64) - 1))
        if len(lv) == 3:
            body += _uv((lv[1] - h.min_ttl) & ((1 << 64) - 1))
            body += _uv((lv[2] - h.min_local_deletion_time) & ((1 << 64) - 1))
    if deletion:
        body += _dt_deltas(h, deletion[0], deletion[1])
    if not flags & HAS_ALL_COLUMNS:
        if len(meta) >= 64:
            # Columns.serializer.serializeLargeSubset: uvint delta (count
            # of missing columns), then either the PRESENT indices (when
            # columnCount < supersetCount/2) or the MISSING indices
            n = len(meta)
            present = [i for i, (name, *_r) in enumerate(meta) if name in seen]
            delta = n - len(present)
            body += _uv(delta)
            if len(present) < n // 2:
                for i in present:
                    body += _uv(i)
            else:
                present_set = set(present)
                for i in range(n):
                    if i not in present_set:
                        body += _uv(i)
        else:
            # bitmap of MISSING superset columns (superset < 64)
            missing = 0
            for i, (name, *_rest) in enumerate(meta):
                if name not in seen:
                    missing |= 1 << i
            body += _uv(missing)
    # cells grouped per present column, columns in meta order
    cells_by_col: dict = {}
    for c in cells:
        cells_by_col.setdefault(c["column"], []).append(c)
    for name, _t, _fx, cplx in meta:
        if name not in cells_by_col:
            continue
        group = cells_by_col[name]
        if cplx:
            if has_complex_del:
                cd = next(
                    (c["complex_deletion"] for c in group
                     if c.get("complex_deletion")),
                    (LONG_MIN, NO_DELETION_LDT),
                )
                body += _dt_deltas(h, cd[0], cd[1])
            body += _uv(len(group))
            for c in group:
                body += _serialize_cell(h, c, meta_by_name, lv)
        else:
            if len(group) != 1:
                raise ValueError(f"multiple cells for simple column {name!r}")
            body += _serialize_cell(h, group[0], meta_by_name, lv)

    out = bytearray([flags])
    if extended:
        out.append(extended)
    if not static:
        out += _clustering_blocks(r["clustering"], clustering_sizes)
    out += _uv(len(body) + vint_len(prev_size))
    out += _uv(prev_size)
    out += body
    return bytes(out)


def _serialize_marker(h, r, clustering_sizes, prev_size) -> bytes:
    values = r["clustering"]
    body = bytearray()
    if r["marker"] in (
        KIND_EXCL_END_INCL_START_BOUNDARY,
        KIND_INCL_END_EXCL_START_BOUNDARY,
    ):
        body += _dt_deltas(h, *r["deletion"])
        body += _dt_deltas(h, *r["deletion2"])
    else:
        body += _dt_deltas(h, *r["deletion"])
    out = bytearray([IS_MARKER, r["marker"]])
    out += _U16.pack(len(values))
    out += _clustering_blocks(values, clustering_sizes)
    out += _uv(len(body) + vint_len(prev_size))
    out += _uv(prev_size)
    out += body
    return bytes(out)


def serialize_partition(
    h: SerializationHeader, p: dict, version: str = "ma"
) -> bytes:
    clustering_sizes = tuple(fixed_size_of(t) for t in h.clustering_types)
    static_meta = tuple(
        (name, t, fixed_size_of(t), is_complex(t)) for name, t in h.static_columns
    )
    regular_meta = tuple(
        (name, t, fixed_size_of(t), is_complex(t)) for name, t in h.regular_columns
    )
    out = bytearray()
    key = p["key"]
    out += _U16.pack(len(key)) + key
    if p.get("deletion"):
        mfda, ldt = p["deletion"]
    else:
        mfda, ldt = LONG_MIN, None  # live
    from .descriptor import has_uint_deletion_time

    if has_uint_deletion_time(version):
        # 5.0 "oa": unsigned int ldt, 0xFFFFFFFF = live (CASSANDRA-14227)
        out += struct.pack(">I", LIVE_LDT_UINT if ldt is None else ldt)
    else:
        out += _I32.pack(NO_DELETION_LDT if ldt is None else ldt)
    out += _I64.pack(mfda)
    prev = 0
    for r in p.get("rows", ()):
        if "marker" in r:
            b = _serialize_marker(h, r, clustering_sizes, prev)
        else:
            b = _serialize_row(
                h, r, clustering_sizes, static_meta, regular_meta, prev
            )
        out += b
        prev = len(b)
    out.append(END_OF_PARTITION)
    return bytes(out)


def write_sstable_ma(
    out_dir: str,
    partitions: list[dict],
    *,
    key_type: str = UTF8,
    clustering_types: list[str] | None = None,
    static_columns: list[tuple[bytes, str]] | None = None,
    regular_columns: list[tuple[bytes, str]] | None = None,
    generation: int = 1,
    compress: bool = False,
    chunk_length: int = 4096,
    version: str = "ma",
    compressor: str = "DeflateCompressor",
) -> str:
    """Write {version}-1-big-{Data,Statistics,Index}.db into ``out_dir``;
    returns the Data.db path. Partitions are written in input order (the
    caller is responsible for partitioner order, as with the 2.x writer);
    columns must be name-sorted (Columns order).

    ``compress``: chunked Data.db + CompressionInfo.db sidecar (the 3.x
    CompressionMetadata layout is the same as 2.x: algo simple name,
    options, chunk length, uncompressed data length, chunk offsets; each
    chunk trailed by a 4-byte checksum) — 3.x clusters compress by
    default, so the compressed shape is the realistic one. ``compressor``
    selects DeflateCompressor (zlib) or ZstdCompressor (standard zstd
    frames, Cassandra >= 4.0's shipped option). Index.db offsets stay
    UNCOMPRESSED positions, exactly like real files."""
    os.makedirs(out_dir, exist_ok=True)
    stats = _collect_stats(partitions)
    h = stats.header(
        key_type,
        clustering_types or [],
        sorted(static_columns or []),
        sorted(regular_columns or []),
    )
    data_path = os.path.join(out_dir, f"{version}-{generation}-big-Data.db")
    index_path = os.path.join(out_dir, f"{version}-{generation}-big-Index.db")
    stats_path = os.path.join(
        out_dir, f"{version}-{generation}-big-Statistics.db"
    )
    offsets = []
    raw = bytearray()
    for p in partitions:
        offsets.append((p["key"], len(raw)))
        raw += serialize_partition(h, p, version=version)
    if compress:
        import zlib

        if compressor == "DeflateCompressor":
            compress_fn = zlib.compress
        elif compressor == "ZstdCompressor":
            import pyarrow as pa

            _codec = pa.Codec("zstd")
            compress_fn = lambda b: bytes(_codec.compress(b))  # noqa: E731
        else:
            raise ValueError(f"unsupported fixture compressor: {compressor}")
        info_path = os.path.join(
            out_dir, f"{version}-{generation}-big-CompressionInfo.db"
        )
        chunk_offs = []
        with open(data_path, "wb") as f:
            for pos in range(0, len(raw), chunk_length):
                chunk_offs.append(f.tell())
                f.write(compress_fn(bytes(raw[pos : pos + chunk_length])))
                f.write(b"\x00\x00\x00\x00")  # checksum trailer (unchecked)
        with open(info_path, "wb") as f:
            name = compressor.encode()
            f.write(_U16.pack(len(name)) + name)
            f.write(_I32.pack(0))  # no options
            f.write(_I32.pack(chunk_length))
            f.write(_I64.pack(len(raw)))
            f.write(_I32.pack(len(chunk_offs)))
            for off in chunk_offs:
                f.write(_I64.pack(off))
    else:
        with open(data_path, "wb") as f:
            f.write(bytes(raw))
    with open(index_path, "wb") as f:
        for key, off in offsets:
            # big-format ma index entry: u16 key + uvint position +
            # uvint promoted-index size (0: none)
            f.write(_U16.pack(len(key)) + key + _uv(off) + _uv(0))
    write_statistics_db(stats_path, h, version=version)
    return data_path
