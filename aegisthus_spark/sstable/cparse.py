"""ctypes bindings for the C cell scanner (_scan.c) with on-demand build.

The pure-Python parsers top out near ~70 MB/s/core — interpreter-bound, not
IO-bound. ``_scan.c`` is the same byte-level scan compiled with gcc -O3;
this module builds it once per host (cached .so keyed by source hash,
atomic rename, safe under concurrent Spark workers) and exposes
``scan_data_buffer_batches`` with the exact interface and output schema of
:mod:`.arrow_decode`. Anything missing (no compiler, build failure) makes
``available()`` False and callers fall back to the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Iterator

import numpy as np
import pyarrow as pa

from .arrow_decode import _schema
from .decoder import LONG_MIN

_SRC = os.path.join(os.path.dirname(__file__), "_scan.c")

DONE, MORE, ROW_TOO_BIG, CORRUPT = 0, 1, 2, 3

BATCH_CELLS = 1 << 16
BATCH_BYTES = 8 << 20


class _ScanOut(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("rows", ctypes.c_int64),
        ("consumed", ctypes.c_int64),
        ("key_bytes", ctypes.c_int64),
        ("name_bytes", ctypes.c_int64),
        ("max_bytes_used", ctypes.c_int64),
        ("val_bytes", ctypes.c_int64),
    ]


_LIB: object = None  # None = not probed, False = unavailable


def _cache_dir() -> str | None:
    """Per-user 0700 cache dir; never a world-writable shared path.

    A .so loaded into every Spark worker is code execution — on a multi-user
    host a predictable /tmp path could be pre-planted by another user. The
    dir is created 0700 and, if it already exists, only trusted when owned
    by the current uid and not group/world-writable.
    """
    base = os.path.join(tempfile.gettempdir(), f"aegisthus-{os.getuid()}")
    try:
        os.makedirs(base, mode=0o700, exist_ok=True)
        st = os.lstat(base)
        if (
            st.st_uid != os.getuid()
            or not os.path.isdir(base)
            or os.path.islink(base)
            or (st.st_mode & 0o077)
        ):
            return None
    except OSError:
        return None
    return base


def _trusted_file(path: str) -> bool:
    try:
        st = os.lstat(path)
    except OSError:
        return False
    return (
        os.path.isfile(path)
        and not os.path.islink(path)
        and st.st_uid == os.getuid()
        and not (st.st_mode & 0o022)
    )


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    cache = _cache_dir()
    if cache is None:
        return None
    tag = hashlib.md5(src).hexdigest()[:12]
    so_path = os.path.join(cache, f"aegisthus_scan_{tag}.so")
    if _trusted_file(so_path):
        return so_path
    tmp = f"{so_path}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=60,
        )
        os.chmod(tmp, 0o700)
        os.rename(tmp, so_path)  # atomic: concurrent builders converge
        return so_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _lib():
    global _LIB
    if _LIB is None:
        path = _build()
        if path is None:
            _LIB = False
        else:
            try:
                lib = ctypes.CDLL(path)
                lib.scan_cells.restype = ctypes.c_int
                lib.scan_cells_ma.restype = ctypes.c_int
                lib.lz4_block_decompress.restype = ctypes.c_int64
                lib.snappy_decompress_block.restype = ctypes.c_int64
                _LIB = lib
            except OSError:
                _LIB = False
    return _LIB


def lz4_decompress(src: bytes, uncompressed_len: int) -> bytes:
    """C LZ4 block decode; raises ValueError on malformed input.

    Bound via the scanner .so — no external lz4 package needed. Callers
    should probe :func:`available` first and fall back to the pure-Python
    decoder when no compiler exists on the host.
    """
    lib = _lib()
    if not lib:
        raise RuntimeError("C library unavailable")
    dst = np.empty(uncompressed_len, np.uint8)
    src_arr = np.frombuffer(src, np.uint8)
    wrote = lib.lz4_block_decompress(
        _u8(src_arr), ctypes.c_int64(len(src)), _u8(dst),
        ctypes.c_int64(uncompressed_len),
    )
    if wrote != uncompressed_len:
        raise ValueError(
            f"malformed LZ4 block: wrote {wrote} of {uncompressed_len} bytes"
        )
    return dst.tobytes()


def snappy_decompress(src: bytes, uncompressed_len: int) -> bytes:
    """C Snappy raw-block decode; raises ValueError on malformed input."""
    lib = _lib()
    if not lib:
        raise RuntimeError("C library unavailable")
    dst = np.empty(uncompressed_len, np.uint8)
    src_arr = np.frombuffer(src, np.uint8)
    wrote = lib.snappy_decompress_block(
        _u8(src_arr), ctypes.c_int64(len(src)), _u8(dst),
        ctypes.c_int64(uncompressed_len),
    )
    if wrote != uncompressed_len:
        raise ValueError(
            f"malformed Snappy block: wrote {wrote} of {uncompressed_len} bytes"
        )
    return dst.tobytes()


def available() -> bool:
    return bool(_lib())


def _u8(arr):  # ctypes views over numpy buffers
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _validity_buf(valid: np.ndarray):
    if valid.all():
        return None, 0
    packed = np.packbits(valid.view(np.bool_), bitorder="little")
    return pa.py_buffer(packed.tobytes()), int(len(valid) - valid.sum())


def _binary(n, data, offsets, valid) -> pa.Array:
    vbuf, nulls = _validity_buf(valid)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [vbuf, pa.py_buffer(offsets), pa.py_buffer(data)],
        null_count=nulls,
    )


def _int_arr(n, values, valid, pa_type) -> pa.Array:
    vbuf, nulls = _validity_buf(valid)
    return pa.Array.from_buffers(
        pa_type, n, [vbuf, pa.py_buffer(values)], null_count=nulls
    )


def scan_data_buffer_batches(
    data,
    *,
    version: str = "jb",
    start: int = 0,
    end: int | None = None,
    source_path: str = "",
    generation: int = 0,
    batch_rows: int = BATCH_CELLS,
    skip_corrupt: bool = False,
) -> Iterator[pa.RecordBatch]:
    """C-accelerated twin of arrow_decode.scan_data_buffer_batches."""
    lib = _lib()
    if not lib:
        raise RuntimeError("C scanner unavailable; use arrow_decode")
    if version >= "ma":
        from .descriptor import check_modern_version

        check_modern_version(version)
        # "oa" (5.0) rides the same C path: the scanner never reads the
        # partition-level localDeletionTime (only mfda at +4, so the
        # unsigned encoding is moot) and every in-row ldt saturates at
        # Integer.MAX_VALUE via ma_sat_ldt — byte-for-byte the Python
        # twin's _sat_ldt behavior.
        yield from _scan_ma_batches(
            data, start=start, end=end, source_path=source_path,
            generation=generation, batch_rows=batch_rows,
            skip_corrupt=skip_corrupt,
        )
        return
    buf = data if isinstance(data, (bytes, bytearray, memoryview)) else memoryview(data)
    mv = memoryview(buf)
    total = len(mv)
    stop = total if end is None else end
    has_rs_cc = 1 if version < "ja" else 0
    # zero-copy pointer into the source buffer (mmap and bytes both export
    # the buffer protocol; keep `obj` alive for the duration of the scan)
    obj = np.frombuffer(mv, dtype=np.uint8)
    c_buf = obj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    cap_cells = max(1024, int(batch_rows))
    cap_bytes = BATCH_BYTES
    o = start
    schema = _schema()
    path_b = source_path.encode()

    while o < stop:
        key_data = np.empty(cap_bytes, np.uint8)
        name_data = np.empty(cap_bytes, np.uint8)
        max_data = np.empty(cap_bytes, np.uint8)
        val_data = np.empty(cap_bytes, np.uint8)
        key_off = np.empty(cap_cells + 1, np.int32)
        name_off = np.empty(cap_cells + 1, np.int32)
        max_off = np.empty(cap_cells + 1, np.int32)
        val_off = np.empty(cap_cells + 1, np.int32)
        name_valid = np.empty(cap_cells, np.uint8)
        max_valid = np.empty(cap_cells, np.uint8)
        val_valid = np.empty(cap_cells, np.uint8)
        ts = np.empty(cap_cells, np.int64)
        kind = np.empty(cap_cells, np.uint8)
        ttl = np.empty(cap_cells, np.int32)
        ttl_valid = np.empty(cap_cells, np.uint8)
        ldt = np.empty(cap_cells, np.int32)
        ldt_valid = np.empty(cap_cells, np.uint8)
        tsd = np.empty(cap_cells, np.int64)
        tsd_valid = np.empty(cap_cells, np.uint8)
        row_deleted = np.empty(cap_cells, np.int64)
        row_cells = np.empty(cap_cells, np.int32)
        out = _ScanOut()

        rc = lib.scan_cells(
            c_buf, ctypes.c_int64(total), ctypes.c_int64(o), ctypes.c_int64(stop),
            ctypes.c_int(has_rs_cc),
            ctypes.c_int64(cap_cells), ctypes.c_int64(cap_bytes),
            _u8(key_data), _i32p(key_off),
            _u8(name_data), _i32p(name_off), _u8(name_valid),
            _u8(max_data), _i32p(max_off), _u8(max_valid),
            _u8(val_data), _i32p(val_off), _u8(val_valid),
            _i64p(ts), _u8(kind),
            _i32p(ttl), _u8(ttl_valid),
            _i32p(ldt), _u8(ldt_valid),
            _i64p(tsd), _u8(tsd_valid),
            _i64p(row_deleted), _i32p(row_cells),
            ctypes.byref(out),
        )

        if rc == ROW_TOO_BIG:
            cap_cells *= 2
            cap_bytes *= 2
            continue

        n = int(out.n)
        if n:
            src = pa.Array.from_buffers(
                pa.string(), n,
                [None,
                 pa.py_buffer((np.arange(n + 1, dtype=np.int32) * len(path_b)).tobytes()),
                 pa.py_buffer(path_b * n)],
            )
            gen_arr = pa.array(np.full(n, generation, np.int32))
            deleted = pa.array(
                np.repeat(row_deleted[: out.rows], row_cells[: out.rows])
            )
            kind_arr = pa.Array.from_buffers(
                pa.string(), n,
                [None, pa.py_buffer(np.arange(n + 1, dtype=np.int32).tobytes()),
                 pa.py_buffer(kind[:n])],
            )
            batch = pa.RecordBatch.from_arrays(
                [
                    src, gen_arr,
                    _binary(n, key_data[: out.key_bytes], key_off[: n + 1], np.ones(n, np.uint8)),
                    deleted, kind_arr,
                    _binary(n, name_data[: out.name_bytes], name_off[: n + 1], name_valid[:n]),
                    _binary(n, max_data[: out.max_bytes_used], max_off[: n + 1], max_valid[:n]),
                    _binary(n, val_data[: out.val_bytes], val_off[: n + 1], val_valid[:n]),
                    pa.Array.from_buffers(pa.int64(), n, [None, pa.py_buffer(ts[:n])]),
                    _int_arr(n, ttl[:n], ttl_valid[:n], pa.int32()),
                    _int_arr(n, ldt[:n], ldt_valid[:n], pa.int32()),
                    _int_arr(n, tsd[:n], tsd_valid[:n], pa.int64()),
                ],
                schema=schema,
            )
            yield batch

        if rc == DONE:
            return
        if rc == MORE:
            o = int(out.consumed)
            continue
        # CORRUPT
        if not skip_corrupt:
            raise ValueError(
                f"corrupt sstable data at offset {int(out.consumed)} in {source_path!r}"
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([source_path]), pa.array([generation], pa.int32()),
                pa.array([None], pa.binary()), pa.array([0], pa.int64()),
                pa.array(["!"]), pa.array([None], pa.binary()),
                pa.array([None], pa.binary()), pa.array([None], pa.binary()),
                pa.array([0], pa.int64()), pa.array([None], pa.int32()),
                pa.array([None], pa.int32()), pa.array([None], pa.int64()),
            ],
            schema=schema,
        )
        return


# keep LONG_MIN import used (row-only sentinel is produced in C)
_ = LONG_MIN


MA_UNSUPPORTED = 4


def _ma_meta(header):
    """SerializationHeader -> flat ctypes-ready metadata arrays."""
    from .modern import fixed_size_of, is_complex

    cl = np.array(
        [fixed_size_of(t) for t in header.clustering_types] or [0], np.int32
    )

    def cols(entries):
        names = bytearray()
        offs = [0]
        fixed = []
        cplx = []
        for name, t in entries:
            names += name
            offs.append(len(names))
            fixed.append(fixed_size_of(t))
            cplx.append(1 if is_complex(t) else 0)
        return (
            np.frombuffer(bytes(names) or b"\x00", np.uint8),
            np.array(offs, np.int32),
            np.array(fixed or [0], np.int32),
            np.array(cplx or [0], np.uint8),
        )

    return cl, cols(header.regular_columns), cols(header.static_columns)


def _scan_ma_batches(
    data,
    *,
    start: int = 0,
    end: int | None = None,
    source_path: str = "",
    generation: int = 0,
    batch_rows: int = BATCH_CELLS,
    skip_corrupt: bool = False,
) -> Iterator[pa.RecordBatch]:
    """C-accelerated 3.x scan — twin of modern.scan_data_buffer_rows_modern
    with arrow_decode's batch shape. rc=4 (a shape the C path doesn't do:
    >=64-column subsets, deep RT nesting, oversized components) falls back
    to the pure-Python decoder FROM THE SAME PARTITION — never a wrong
    answer, only a slower path."""
    from .arrow_decode import _modern_batches
    from .modern import header_for_data_file

    lib = _lib()
    header = header_for_data_file(source_path)
    n_cl = len(header.clustering_types)
    cl, (rn, ro, rf, rc_), (sn, so, sf, sc_) = _ma_meta(header)

    buf = data if isinstance(data, (bytes, bytearray, memoryview)) else memoryview(data)
    mv = memoryview(buf)
    total = len(mv)
    stop = total if end is None else end
    obj = np.frombuffer(mv, dtype=np.uint8)
    c_buf = obj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    cap_cells = max(1024, int(batch_rows))
    cap_bytes = BATCH_BYTES
    scratch = np.empty(1 << 20, np.uint8)
    o = start
    schema = _schema()
    path_b = source_path.encode()

    while o < stop:
        key_data = np.empty(cap_bytes, np.uint8)
        name_data = np.empty(cap_bytes, np.uint8)
        max_data = np.empty(cap_bytes, np.uint8)
        val_data = np.empty(cap_bytes, np.uint8)
        key_off = np.empty(cap_cells + 1, np.int32)
        name_off = np.empty(cap_cells + 1, np.int32)
        max_off = np.empty(cap_cells + 1, np.int32)
        val_off = np.empty(cap_cells + 1, np.int32)
        name_valid = np.empty(cap_cells, np.uint8)
        max_valid = np.empty(cap_cells, np.uint8)
        val_valid = np.empty(cap_cells, np.uint8)
        ts = np.empty(cap_cells, np.int64)
        kind = np.empty(cap_cells, np.uint8)
        ttl = np.empty(cap_cells, np.int32)
        ttl_valid = np.empty(cap_cells, np.uint8)
        ldt = np.empty(cap_cells, np.int32)
        ldt_valid = np.empty(cap_cells, np.uint8)
        tsd = np.empty(cap_cells, np.int64)
        tsd_valid = np.empty(cap_cells, np.uint8)
        row_deleted = np.empty(cap_cells, np.int64)
        row_cells = np.empty(cap_cells, np.int32)
        out = _ScanOut()

        rc = lib.scan_cells_ma(
            c_buf, ctypes.c_int64(total), ctypes.c_int64(o), ctypes.c_int64(stop),
            ctypes.c_int64(header.min_timestamp),
            ctypes.c_int64(header.min_local_deletion_time),
            ctypes.c_int64(header.min_ttl),
            ctypes.c_int32(n_cl), _i32p(cl),
            ctypes.c_int32(len(header.regular_columns)),
            _u8(rn), _i32p(ro), _i32p(rf), _u8(rc_),
            ctypes.c_int32(len(header.static_columns)),
            _u8(sn), _i32p(so), _i32p(sf), _u8(sc_),
            _u8(scratch), ctypes.c_int64(len(scratch)),
            ctypes.c_int64(cap_cells), ctypes.c_int64(cap_bytes),
            _u8(key_data), _i32p(key_off),
            _u8(name_data), _i32p(name_off), _u8(name_valid),
            _u8(max_data), _i32p(max_off), _u8(max_valid),
            _u8(val_data), _i32p(val_off), _u8(val_valid),
            _i64p(ts), _u8(kind),
            _i32p(ttl), _u8(ttl_valid),
            _i32p(ldt), _u8(ldt_valid),
            _i64p(tsd), _u8(tsd_valid),
            _i64p(row_deleted), _i32p(row_cells),
            ctypes.byref(out),
        )

        if rc == ROW_TOO_BIG:
            cap_cells *= 2
            cap_bytes *= 2
            continue

        n = int(out.n)
        if n:
            src = pa.Array.from_buffers(
                pa.string(), n,
                [None,
                 pa.py_buffer((np.arange(n + 1, dtype=np.int32) * len(path_b)).tobytes()),
                 pa.py_buffer(path_b * n)],
            )
            gen_arr = pa.array(np.full(n, generation, np.int32))
            deleted = pa.array(
                np.repeat(row_deleted[: out.rows], row_cells[: out.rows])
            )
            kind_arr = pa.Array.from_buffers(
                pa.string(), n,
                [None, pa.py_buffer(np.arange(n + 1, dtype=np.int32).tobytes()),
                 pa.py_buffer(kind[:n])],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    src, gen_arr,
                    _binary(n, key_data[: out.key_bytes], key_off[: n + 1], np.ones(n, np.uint8)),
                    deleted, kind_arr,
                    _binary(n, name_data[: out.name_bytes], name_off[: n + 1], name_valid[:n]),
                    _binary(n, max_data[: out.max_bytes_used], max_off[: n + 1], max_valid[:n]),
                    _binary(n, val_data[: out.val_bytes], val_off[: n + 1], val_valid[:n]),
                    pa.Array.from_buffers(pa.int64(), n, [None, pa.py_buffer(ts[:n])]),
                    _int_arr(n, ttl[:n], ttl_valid[:n], pa.int32()),
                    _int_arr(n, ldt[:n], ldt_valid[:n], pa.int32()),
                    _int_arr(n, tsd[:n], tsd_valid[:n], pa.int64()),
                ],
                schema=schema,
            )

        if rc == DONE:
            return
        if rc == MORE:
            o = int(out.consumed)
            continue
        if rc == MA_UNSUPPORTED:
            # resume in Python from the unsupported partition's start
            yield from _modern_batches(
                data, start=int(out.consumed), end=stop,
                source_path=source_path, generation=generation,
                batch_rows=batch_rows, skip_corrupt=skip_corrupt,
            )
            return
        # CORRUPT (the broken partition is dropped whole; complete
        # partitions before it were already emitted)
        if not skip_corrupt:
            raise ValueError(
                f"corrupt ma sstable at offset {int(out.consumed)} in {source_path!r}"
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([source_path]), pa.array([generation], pa.int32()),
                pa.array([None], pa.binary()), pa.array([0], pa.int64()),
                pa.array(["!"]), pa.array([None], pa.binary()),
                pa.array([None], pa.binary()), pa.array([None], pa.binary()),
                pa.array([0], pa.int64()), pa.array([None], pa.int32()),
                pa.array([None], pa.int32()), pa.array([None], pa.int64()),
            ],
            schema=schema,
        )
        return
