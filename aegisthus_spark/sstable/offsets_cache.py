"""Sidecar cache for BTI partition-boundary offsets.

Big-format tables get split boundaries from a cheap per-plan ``Index.db``
read (reference: io/sstable/IndexDatabaseScanner.java:58-85 feeding
input/AegisthusInputFormat.java:119-187).  BTI (``da-*-bti``) tables have
no ``Index.db`` — boundaries come from a sequential skip-walk of the
Data.db itself (modern.partition_offsets_from_data), which is O(rows of
the file).  Paying that walk once per *plan* per file is fine at fixture
scale and hours of driver time at 100 TB, so discovered offsets persist
here: the walk runs once per file *ever* (until the file changes), and
every later plan is a small sidecar read — the same cost profile as the
reference's Index.db path.

Design:

- **Key** = (absolute path, size, mtime_ns): any rewrite of the file
  invalidates its entry. Entries are content-addressed under a cache
  directory (env ``AEG_SPARK_OFFSET_CACHE_DIR``, default under the system
  temp dir; on a cluster, point it at shared storage so every driver
  benefits from any driver's first touch).
- **Granularity**: offsets are *thinned* before storing — the walk keeps
  one boundary per ``min_gap`` bytes (plus offset 0), because split
  planning only needs boundaries at ~target_bytes resolution, not one per
  partition. A 100 GB file with 1 KB partitions stores ~8 B x
  size/granularity instead of 800 MB of offsets. Each entry records the
  granularity it was walked at; a later plan needing *finer* boundaries
  (smaller target split) misses and re-walks.
- **Writes are atomic and best-effort** (tmp + rename; failures degrade
  to walking again, never to wrong offsets).
- An in-process memo sits above the disk layer so re-plans within one
  driver session skip even the sidecar read.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import struct
import tempfile
import threading
import warnings
import zlib

_ENV = "AEG_SPARK_OFFSET_CACHE_DIR"
_MAGIC = b"AEGOFF2\n"  # v2: crc32 trailer (v1 sidecars simply miss)
_HDR = struct.Struct("<qq")  # granularity, count
_CRC = struct.Struct("<I")

#: in-process memo: key -> (granularity, offsets tuple)
_MEMO: dict[tuple[str, int, int], tuple[int, tuple[int, ...]]] = {}
_MEMO_CAP = 65536  # ~a few MB of thinned lists; soft bound for long drivers


def cache_dir() -> str:
    d = os.environ.get(_ENV)
    if d is None:
        # per-uid path + 0700: the system temp dir is world-writable, so a
        # fixed shared default would let another local user pre-create the
        # dir or seed sidecars into someone else's cache
        d = os.path.join(
            tempfile.gettempdir(), f"aegisthus_spark-offsets-{os.getuid()}"
        )
        os.makedirs(d, mode=0o700, exist_ok=True)
        # exist_ok never checks WHO owns a pre-existing dir: under a
        # sticky-bit temp dir another user can pre-create the name and
        # seed well-formed sidecars (crc only defends bit-rot, not a
        # writer). Refuse a dir we don't own or that others can write;
        # fall back to a fresh private dir for this process.
        st = os.stat(d)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            # r12 ADVICE: say so (the host silently loses cross-process
            # caching otherwise) and clean the private dir up at exit so
            # an affected host doesn't accrete one orphan per process
            d = tempfile.mkdtemp(prefix="aegisthus_spark-offsets-")
            os.environ[_ENV] = d  # stable for the rest of this process
            warnings.warn(
                f"offsets cache dir is not privately owned; falling back to "
                f"process-private {d} (cross-process cache reuse disabled). "
                f"Set ${_ENV} to a trusted directory to restore sharing.",
                RuntimeWarning,
                stacklevel=2,
            )
            atexit.register(shutil.rmtree, d, True)
    else:
        os.makedirs(d, exist_ok=True)
    return d


def _key(path: str) -> tuple[str, int, int]:
    st = os.stat(path)
    return (os.path.abspath(path), st.st_size, st.st_mtime_ns)


def _sidecar(key: tuple[str, int, int]) -> str:
    h = hashlib.sha1("|".join(map(str, key)).encode()).hexdigest()
    return os.path.join(cache_dir(), h + ".offsets")


def load(path: str, *, granularity: int) -> list[int] | None:
    """Cached boundary offsets for ``path``, or None.

    A hit requires the entry to have been walked at a granularity at least
    as fine as requested (finer boundaries are a superset use-case)."""
    key = _key(path)
    hit = _MEMO.get(key)
    if hit is not None and hit[0] <= granularity:
        return list(hit[1])
    try:
        with open(_sidecar(key), "rb") as fh:
            raw = fh.read()
    except OSError:
        return None
    # a truncated/garbage sidecar (partial visibility on shared storage)
    # must be a MISS, not a struct.error crashing split planning — the
    # module contract is "failures degrade to walking again"
    if not raw.startswith(_MAGIC) or len(raw) < len(_MAGIC) + _HDR.size + _CRC.size:
        return None
    g, n = _HDR.unpack_from(raw, len(_MAGIC))
    if (
        g > granularity
        or n < 0
        or len(raw) != len(_MAGIC) + _HDR.size + 8 * n + _CRC.size
    ):
        return None
    # crc32 over header+payload: bit-rot that keeps lengths intact (the
    # failure mode a pure length check misses) must be a MISS, never
    # corrupt split boundaries
    (crc,) = _CRC.unpack_from(raw, len(raw) - _CRC.size)
    if zlib.crc32(raw[len(_MAGIC):-_CRC.size]) != crc:
        return None
    offs = list(struct.unpack_from(f"<{n}q", raw, len(_MAGIC) + _HDR.size))
    # semantic sanity before the offsets feed split planning: boundaries
    # start at 0 (the walk begins at the first partition) and strictly
    # increase. NOTE: no upper-bound-vs-file-size check — for compressed
    # tables offsets are in UNCOMPRESSED coordinates, legitimately larger
    # than the on-disk Data.db size.
    if offs and (
        offs[0] != 0 or any(a >= b for a, b in zip(offs, offs[1:]))
    ):
        return None
    _memoize(key, g, offs)
    return offs


def store(path: str, offsets: list[int], *, granularity: int) -> None:
    """Persist walked offsets (already thinned to ``granularity``)."""
    key = _key(path)
    _memoize(key, granularity, offsets)
    body = _HDR.pack(granularity, len(offsets)) + struct.pack(
        f"<{len(offsets)}q", *offsets
    )
    blob = _MAGIC + body + _CRC.pack(zlib.crc32(body))
    target = _sidecar(key)
    tmp = f"{target}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, target)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


_MEMO_LOCK = threading.Lock()


def _memoize(key, granularity: int, offsets) -> None:
    # callers run under planning thread pools; the cap eviction is the
    # one non-atomic read-modify-write here
    with _MEMO_LOCK:
        if len(_MEMO) >= _MEMO_CAP:
            _MEMO.pop(next(iter(_MEMO)))
        _MEMO[key] = (granularity, tuple(offsets))


def clear_memo() -> None:
    """Test hook: drop the in-process layer (disk entries remain)."""
    _MEMO.clear()
