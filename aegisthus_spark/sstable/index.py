"""Index.db scanner — row-boundary offsets for split planning.

Entry layout (public Cassandra format; reference behavior:
io/sstable/IndexDatabaseScanner.java:58-85):

    u16 key length, key bytes
    i64 data-file offset of the row
    [>= ia] i32 promoted-index size, skipped

Used only to place input-partition boundaries on row starts
(AegisthusInputFormat.getSSTableSplitsForFile, reference :119-187).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterator


def scan_index_offsets(f: BinaryIO, *, version: str = "jb") -> Iterator[tuple[bytes, int]]:
    """Yield (key, data_file_offset) per index entry.

    3.x+ big format (RowIndexEntry.serializer): position and
    promoted-index size are unsigned vints instead of i64/i32."""
    if version >= "ma":
        from .descriptor import check_modern_version

        check_modern_version(version)
        data = f.read()
        from .modern import read_unsigned_vint

        o, total = 0, len(data)
        while o + 2 <= total:
            keylen = struct.unpack_from(">H", data, o)[0]
            o += 2
            key = data[o : o + keylen]
            o += keylen
            off, o = read_unsigned_vint(data, o)
            promoted, o = read_unsigned_vint(data, o)
            o += promoted
            yield key, off
        return
    has_promoted = version >= "ia"
    while True:
        hdr = f.read(2)
        if len(hdr) < 2:
            return
        keylen = struct.unpack(">H", hdr)[0]
        key = f.read(keylen)
        off = struct.unpack(">q", f.read(8))[0]
        if has_promoted:
            promoted = struct.unpack(">i", f.read(4))[0]
            if promoted:
                f.seek(promoted, 1)
        yield key, off


def row_offsets(path: str, version: str = "jb") -> list[int]:
    with open(path, "rb") as f:
        return [off for _, off in scan_index_offsets(f, version=version)]


def plan_splits(
    data_size: int, row_starts: list[int], target_size: int
) -> list[tuple[int, int]]:
    """Cut [0, data_size) into (start, end) ranges at row boundaries,
    aiming at ~target_size per split (reference uses 0.99x blocksize with a
    1.2x fuzz for the final split, AegisthusInputFormat.java:137-174)."""
    if data_size <= int(target_size * 1.2) or not row_starts:
        return [(0, data_size)]
    splits = []
    start = 0
    goal = int(target_size * 0.99)
    for off in row_starts:
        if off - start >= goal:
            splits.append((start, off))
            start = off
    if start < data_size:
        if splits and data_size - start < goal // 2:
            # merge a tiny tail into the previous split
            s, _ = splits.pop()
            splits.append((s, data_size))
        else:
            splits.append((start, data_size))
    return splits
