"""BTI boundary-offset sidecar cache (sstable/offsets_cache.py).

Scale contract being pinned: the O(rows) Data.db skip-walk that gives BTI
tables their split boundaries runs once per file EVER — the first plan
(or an executor-distributed prime pass) persists thinned offsets keyed by
(path, size, mtime_ns), and every later plan of an unchanged file does
ZERO Data.db reads (asserted by making the walk raise). The reference's
analog is the cheap per-plan Index.db read (IndexDatabaseScanner.java:
58-85); BTI has no Index.db, so the sidecar *is* our Index.db."""

import os

import pytest

from aegisthus_spark.sstable import offsets_cache
from aegisthus_spark.sstable.modern_writer import UTF8, write_sstable_ma


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("AEG_SPARK_OFFSET_CACHE_DIR", str(tmp_path / "offcache"))
    offsets_cache.clear_memo()
    yield
    offsets_cache.clear_memo()


def _make_bti(d, n_parts=120, compress=False):
    parts = []
    for i in range(n_parts):
        rows = [
            {"clustering": [b"c%03d" % j], "liveness": (1000 + i * 7 + j,),
             "cells": [{"column": b"val", "value": b"v" * (20 + (i * 13 + j) % 60)}]}
            for j in range(4)
        ]
        parts.append({"key": b"key%05d" % i, "rows": rows})
    write_sstable_ma(
        str(d), parts, clustering_types=[UTF8],
        regular_columns=[(b"val", UTF8)], version="oa",
        compress=compress, chunk_length=1024,
    )
    (d / "oa-1-big-Index.db").unlink()
    for f in sorted(d.iterdir()):
        f.rename(d / f.name.replace("oa-1-big-", "da-1-bti-", 1))
    (d / "da-1-bti-Partitions.db").write_bytes(b"\x00trie")
    return str(d / "da-1-bti-Data.db")


def test_store_load_roundtrip(tmp_path):
    p = tmp_path / "f-Data.db"
    p.write_bytes(b"x" * 10_000)
    offs = [0, 1000, 2500, 9000]
    offsets_cache.store(str(p), offs, granularity=256)
    assert offsets_cache.load(str(p), granularity=256) == offs
    # coarser request accepts a finer entry; finer request misses
    assert offsets_cache.load(str(p), granularity=1024) == offs
    assert offsets_cache.load(str(p), granularity=64) is None
    # disk layer alone (fresh process simulation)
    offsets_cache.clear_memo()
    assert offsets_cache.load(str(p), granularity=256) == offs
    # file change invalidates (size is part of the key)
    p.write_bytes(b"x" * 10_001)
    assert offsets_cache.load(str(p), granularity=256) is None


def test_corrupt_sidecar_is_a_miss(tmp_path):
    p = tmp_path / "f-Data.db"
    p.write_bytes(b"x" * 64)
    offsets_cache.store(str(p), [0, 10], granularity=8)
    offsets_cache.clear_memo()
    side = offsets_cache._sidecar(offsets_cache._key(str(p)))
    raw = open(side, "rb").read()
    open(side, "wb").write(raw[:-3])  # truncated -> length check fails
    assert offsets_cache.load(str(p), granularity=8) is None
    open(side, "wb").write(b"garbage")
    assert offsets_cache.load(str(p), granularity=8) is None
    # review finding: magic present but header truncated (partial
    # visibility on shared storage) must be a MISS, not a struct.error
    open(side, "wb").write(raw[: len(raw) - 18])
    assert offsets_cache.load(str(p), granularity=8) is None
    # negative count from bit-rot inside an intact-length header
    import struct as s

    evil = bytearray(raw)
    s.pack_into("<q", evil, 8 + 8, -1)  # count field
    open(side, "wb").write(bytes(evil))
    assert offsets_cache.load(str(p), granularity=8) is None


def test_semantically_bogus_sidecar_is_a_miss(tmp_path):
    """A WELL-FORMED sidecar whose offsets can't be partition boundaries
    must miss: boundaries start at 0 and strictly increase — anything
    else would feed split planning splits that don't start at partition
    starts. (No upper-bound-vs-file-size check: compressed tables cache
    UNCOMPRESSED coordinates, legitimately larger than the on-disk file —
    offsets > EOF-equivalents are instead covered by the crc32 trailer
    against bit-rot and the 0700 per-uid cache dir against planting.)"""
    p = tmp_path / "f-Data.db"
    p.write_bytes(b"x" * 1000)

    def plant(offs):
        offsets_cache.store(str(p), offs, granularity=8)
        offsets_cache.clear_memo()
        return offsets_cache.load(str(p), granularity=8)

    assert plant([0, 10, 2000]) == [0, 10, 2000]  # > file size OK (compressed)
    assert plant([10, 20]) is None              # first boundary not 0
    assert plant([0, 20, 20]) is None           # not strictly increasing
    assert plant([0, 30, 10]) is None           # unsorted
    assert plant([0, -5, 10]) is None           # negative offset


def test_bitrot_crc_is_a_miss(tmp_path):
    """Flip one payload bit without changing any length: only the crc32
    trailer can catch this class of corruption."""
    p = tmp_path / "f-Data.db"
    p.write_bytes(b"x" * 64)
    offsets_cache.store(str(p), [0, 16, 32], granularity=8)
    offsets_cache.clear_memo()
    side = offsets_cache._sidecar(offsets_cache._key(str(p)))
    raw = bytearray(open(side, "rb").read())
    raw[len(raw) - 10] ^= 0x40  # inside the last offset's bytes
    open(side, "wb").write(bytes(raw))
    assert offsets_cache.load(str(p), granularity=8) is None


@pytest.mark.parametrize("compress", [False, True])
def test_second_plan_does_zero_data_reads(tmp_path, monkeypatch, compress):
    """Cold plan walks Data.db once and persists; a re-plan of the
    unchanged file must not touch Data.db at all (the walk is made to
    raise), and must produce the IDENTICAL split list."""
    from aegisthus_spark.sources.sstable_source import _plan_one
    from aegisthus_spark.sstable import modern

    path = _make_bti(tmp_path / "bti", compress=compress)
    cold = _plan_one(path, target_bytes=2048)
    assert len(cold) > 1

    def boom(*a, **kw):
        raise AssertionError("Data.db walked on a warm plan")

    monkeypatch.setattr(modern, "partition_offsets_from_data", boom)
    assert _plan_one(path, target_bytes=2048) == cold
    # ...from the sidecar alone too (new-driver shape)
    offsets_cache.clear_memo()
    assert _plan_one(path, target_bytes=2048) == cold
    # a finer target needs finer boundaries than cached -> honest re-walk
    with pytest.raises(AssertionError, match="warm plan"):
        _plan_one(path, target_bytes=512)


def test_mtime_change_invalidates(tmp_path):
    from aegisthus_spark.sources.sstable_source import _plan_one
    from aegisthus_spark.sstable import modern

    path = _make_bti(tmp_path / "bti")
    _plan_one(path, target_bytes=2048)
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    calls = {"n": 0}
    real = modern.partition_offsets_from_data

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    import aegisthus_spark.sstable.modern as m

    orig = m.partition_offsets_from_data
    m.partition_offsets_from_data = counting
    try:
        _plan_one(path, target_bytes=2048)
    finally:
        m.partition_offsets_from_data = orig
    assert calls["n"] == 1


def test_thinned_walk_matches_full_subset(tmp_path):
    """min_gap thinning keeps a subset of the true boundaries: offset 0,
    then one per >=min_gap bytes."""
    from aegisthus_spark.sstable.modern import partition_offsets_from_data

    path = _make_bti(tmp_path / "bti")
    full = partition_offsets_from_data(path, version="oa")
    thin = partition_offsets_from_data(path, version="oa", min_gap=1024)
    assert thin[0] == 0
    assert set(thin) <= set(full)
    assert all(b - a >= 1024 for a, b in zip(thin, thin[1:]))
    # every thinned gap is tight: the next FULL boundary past a+1024 is kept
    for a, b in zip(thin, thin[1:]):
        nxt = min(o for o in full if o - a >= 1024)
        assert b == nxt


def test_prime_distributed_then_plan_without_walks(tmp_path, monkeypatch, spark):
    """prime_bti_offset_cache walks on executors and persists on the
    driver; the subsequent full read plans every file with zero
    driver-side Data.db walks, and decodes correctly."""
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.sources.sstable_source import prime_bti_offset_cache
    from aegisthus_spark.sstable import modern

    d1 = tmp_path / "t1"
    d2 = tmp_path / "t2"
    _make_bti(d1, n_parts=100)
    _make_bti(d2, n_parts=100, compress=True)
    files = [str(d1 / "da-1-bti-Data.db"), str(d2 / "da-1-bti-Data.db")]

    assert prime_bti_offset_cache(spark, files, target_bytes=2048) == 2
    # idempotent: everything cached now
    assert prime_bti_offset_cache(spark, files, target_bytes=2048) == 0

    def boom(*a, **kw):
        raise AssertionError("driver walked Data.db despite primed cache")

    monkeypatch.setattr(modern, "partition_offsets_from_data", boom)
    df = read_sstable_cells(spark, [str(d1), str(d2)], target_bytes=2048,
                            combine=False)
    assert df.rdd.getNumPartitions() > 2
    # 100 partitions x 4 rows x (marker + cell) per table
    assert df.count() == 2 * 100 * 4 * 2
