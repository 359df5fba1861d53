"""The externally-derived 5.0 "oa" fixture (tools/oa_external_fixture.py):
bytes assembled by hand from the public 5.0 format with no modern_writer
involvement, decoded against hand-derived expected cells.

Beyond the ma external fixture, this certifies with external bytes:
the unsigned partition DeletionTime (live sentinel + a year-2100 value),
a post-2038 vint-delta ldt (saturating into the int32 canonical schema),
the CHECKSUMMED multi-component Statistics TOC, and TYPED clustering
(LongType + ReversedType(UTF8)) whose range-tombstone coverage depends
on comparator order — raw composite bytes rank the negative-long bounds
above the positives and would keep the doomed row."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import oa_external_fixture as ext  # noqa: E402


def test_external_oa_bytes_decode_to_hand_derived_cells(tmp_path):
    """Every decoded tuple equals the hand-derived expectation, in file
    order — uint partition deletions, typed clustering blocks (fixed
    8-byte longs), prefix RT bounds, the post-2038 row tombstone."""
    from aegisthus_spark.sstable.modern import (
        header_for_data_file,
        scan_data_buffer_rows_modern,
    )

    path = ext.write_fixture(str(tmp_path / "table"))
    h = header_for_data_file(path)
    assert h.clustering_types == (ext.LONG, ext.REV_UTF8)
    assert h.static_columns == ()
    assert h.regular_columns == ((b"name", ext.UTF8),)
    got = list(scan_data_buffer_rows_modern(
        ext.build_data_db(), source_path=path, header=h, version="oa"))
    want = ext.expected_rows(path)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"row {i}: {g} != {w}"


def test_oa_statistics_checksums_are_load_bearing(tmp_path):
    """Flipping any byte the reader consumes from the hand-built
    checksummed Statistics.db (count, TOC, header component) fails CRC
    validation — the external fixture exercises the real 4.0+ layout,
    not a lenient parse. (The sibling STATS component is not read, so
    its bytes are not validated — same as a real HEADER-only reader.)"""
    from aegisthus_spark.sstable.modern import header_for_data_file

    path = ext.write_fixture(str(tmp_path / "table"))
    stats = os.path.join(os.path.dirname(path), "oa-1-big-Statistics.db")
    raw = bytearray(open(stats, "rb").read())
    for pos in (1, 10, len(raw) - 2):
        mut = bytearray(raw)
        mut[pos] ^= 0xFF
        with open(stats, "wb") as f:
            f.write(bytes(mut))
        with pytest.raises(ValueError, match="CRC mismatch"):
            header_for_data_file(path)
    with open(stats, "wb") as f:
        f.write(bytes(raw))
    header_for_data_file(path)  # restored bytes parse again


def test_external_oa_typed_rt_coverage_end_to_end(spark, tmp_path):
    """Through the distributed source + comparator-aware compact: the RT
    [-10 .. 0] shadows the row at ck0 = -5 (typed long order), both
    ck0 = 10 rows survive with the REVERSED ck1 order ('b' before 'a'),
    the year-2100 partition deletion keeps its key with exact mfda, and
    the p3 row tombstone carries the saturated ldt."""
    from aegisthus_spark.compact import compact, compacted_to_cells
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.sstable.modern import (
        header_for_data_file,
        name_sort_key_for_header,
    )

    path = ext.write_fixture(str(tmp_path / "table"))
    sk = name_sort_key_for_header(header_for_data_file(path))
    cells = read_sstable_cells(spark, [str(tmp_path / "table")])
    rows = compact(cells, name_sort_key=sk)
    by_key = {bytes(r.partition_key): r for r in rows.collect()}
    assert set(by_key) == {b"p1", b"p2", b"p3"}
    assert by_key[b"p2"].deleted_at == ext.T(50)
    assert by_key[b"p2"].columns == []

    out = compacted_to_cells(rows)
    vals = [bytes(r.value) for r in out.collect()
            if r.value not in (None, b"") and r.kind == "c"]
    assert b"doomed" not in vals, (
        "RT over negative longs must shadow ck0=-5 under TYPED order"
    )
    assert set(vals) == {b"keep-b", b"keep-a"}
    # reversed ck1: within ck0=10, 'b' sorts before 'a' in compact output
    p1_cells = [bytes(c.value) for c in by_key[b"p1"].columns
                if c.kind == "c" and bytes(c.value or b"") in
                (b"keep-b", b"keep-a")]
    assert p1_cells == [b"keep-b", b"keep-a"]
    # p3 row tombstone survives when RTs are kept: exact mfda (the
    # saturated ldt is asserted tuple-exactly in the decode test above)
    kept = compact(cells, name_sort_key=sk, keep_range_tombstones=True)
    p3 = {bytes(r.partition_key): r for r in kept.collect()}[b"p3"]
    t_cells = [c for c in p3.columns if c.kind == "t"]
    assert t_cells and t_cells[0].ts == ext.T(60)


def test_raw_byte_order_would_miss_the_rt(spark, tmp_path):
    """Control: compacting WITHOUT the typed sort key (raw composite
    order) keeps 'doomed' — proving the query's green oracle actually
    certifies the comparator-aware path, not a coincidence of bytes."""
    from aegisthus_spark.compact import compact, compacted_to_cells
    from aegisthus_spark.sources import read_sstable_cells

    ext.write_fixture(str(tmp_path / "table"))
    cells = read_sstable_cells(spark, [str(tmp_path / "table")])
    out = compacted_to_cells(compact(cells))
    vals = {bytes(r.value) for r in out.collect()
            if r.value not in (None, b"") and r.kind == "c"}
    assert b"doomed" in vals


def test_external_oa_bytes_c_scanner_parity(tmp_path):
    """The C twin now rides the oa path too (it never reads the
    partition ldt, and ma_sat_ldt mirrors the Python _sat_ldt clamp):
    batches must equal the pure-Python decode for the hand-built 5.0
    bytes, including the year-2100 saturating deletions."""
    import pyarrow as pa

    from aegisthus_spark.sstable import cparse
    from aegisthus_spark.sstable.arrow_decode import (
        scan_data_buffer_batches as py_scan,
    )

    if not cparse.available():
        pytest.skip("no C compiler on host")
    path = ext.write_fixture(str(tmp_path / "table"))
    data = ext.build_data_db()
    c_tab = pa.Table.from_batches(list(cparse.scan_data_buffer_batches(
        data, version="oa", source_path=path)))
    p_tab = pa.Table.from_batches(list(py_scan(
        data, version="oa", source_path=path)))
    assert c_tab.equals(p_tab)
    # the saturated ldt really flows through the C path
    ldts = [v for v in c_tab.column("local_deletion_time").to_pylist()
            if v is not None]
    assert ext.INT32_MAX in ldts


def test_committed_oa_fixture_files_match_builder():
    """The checked-in binaries are exactly the builder's bytes — the
    registered sst_decode_oa_external query reads the committed files,
    so they must never drift from the spec-derived source."""
    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "oa_external",
                        "table")
    with open(os.path.join(fdir, "oa-1-big-Data.db"), "rb") as f:
        assert f.read() == ext.build_data_db()
    with open(os.path.join(fdir, "oa-1-big-Statistics.db"), "rb") as f:
        assert f.read() == ext.build_statistics_db()
