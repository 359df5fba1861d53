"""Generate the checked-in varint/decimal-clustered fixture.

Writes tests/fixtures/ma_varint/gen1 — an nb-version (4.0, checksummed
Statistics metadata) table clustered by (IntegerType, DecimalType), the
two comparators whose JVM sort keys round 7 added — plus the golden
aeg-JSON of its typed compaction at
tests/golden/decode_golden_varint.parquet.

The content is chosen so RAW-byte name order would produce a different
golden (the driver query therefore certifies the varint/decimal typed
order end-to-end):

- varint clustering values of mixed widths and signs (-200, -50, 10,
  300, ±10^25): two's-complement bytes scramble their numeric order
  (0xFF38 sorts above 0x012C raw).
- a range tombstone over varint [-100 .. 0] covering ONLY -50 — under
  raw order the bound bytes invert and nothing (or the wrong rows)
  would be shadowed.
- two cells whose DecimalType clustering values are numerically EQUAL
  under different encodings (unscaled 5 / scale 0 vs unscaled 50 /
  scale 1): BigDecimal comparators treat them equal, so the typed sort
  key collapses them into one LWW group and only the newer write
  survives — raw bytes would keep both.
- round 9: WIDE DecimalType clustering (unscaled ~10^40, past the 8-byte
  conv bound): numerically-equal pair at different widths LWW-collapses,
  a value differing only at the 41st digit survives — certifying the
  any-width functions/bignum digitization end-to-end.

Re-run only when the fixture content deliberately changes; the binaries
and golden are committed so the `sst_decode_varint` driver query is
stable."""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aegisthus_spark.sstable.modern_writer import UTF8, write_sstable_ma  # noqa: E402

INTEGER = "org.apache.cassandra.db.marshal.IntegerType"
DECIMAL = "org.apache.cassandra.db.marshal.DecimalType"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(ROOT, "tests", "fixtures", "ma_varint")
GOLDEN = os.path.join(ROOT, "tests", "golden", "decode_golden_varint.parquet")

TS0 = 1_600_000_000_000_000  # micros
LDT0 = 1_600_000_000  # seconds


def varint(n: int) -> bytes:
    """Minimal big-endian two's complement (BigInteger.toByteArray)."""
    if n == 0:
        return b"\x00"
    return n.to_bytes((n.bit_length() + 8) // 8, "big", signed=True)


def dec_bytes(unscaled: int, scale: int) -> bytes:
    """Cassandra DecimalType: i32 scale + varint unscaled."""
    w = max(1, (unscaled.bit_length() + 8) // 8)
    return struct.pack(">i", scale) + unscaled.to_bytes(w, "big", signed=True)


def row(ck0: int, ck1: bytes, name: bytes, ts_off: int) -> dict:
    return {
        "clustering": [varint(ck0), ck1],
        "liveness": (TS0 + ts_off,),
        "cells": [{"column": b"val", "value": name}],
    }


def partitions() -> list[dict]:
    # rows listed in COMPARATOR order (varint numeric, then BigDecimal):
    # the writer emits in input order, like real memtable flushes
    d = dec_bytes
    return [
        {"key": b"p1", "rows": [
            row(-200, d(15, 1), b"keep-neg200", 1),      # below the RT range
            {"marker": 1, "clustering": [varint(-100)],  # INCL_START
             "deletion": (TS0 + 90, LDT0 + 9)},
            row(-50, d(-225, 2), b"doomed", 2),          # inside [-100, 0]
            {"marker": 6, "clustering": [varint(0)],     # INCL_END
             "deletion": (TS0 + 90, LDT0 + 9)},
            # equal decimal clustering under two encodings: 5 == 5.0
            row(10, d(5, 0), b"old-write", 10),
            row(10, d(50, 1), b"new-write", 20),
            row(300, d(100, 0), b"keep-300", 3),
        ]},
        {"key": b"p2", "rows": [
            row(-(10 ** 25), d(1, 0), b"wide-neg", 4),
            row(10 ** 25, d(1, 0), b"wide-pos", 5),
        ]},
        # wide DecimalType clustering (unscaled far past 8 bytes): only
        # reachable with the round-9 any-width digitization — the earlier
        # JVM key raise_error'd past 8-byte unscaled, and the earlier
        # Python fallback went through Decimal.normalize(), which ROUNDS
        # at 28 digits and would wrongly collapse 10^40 with 10^40+1
        {"key": b"p3", "rows": [
            # numerically equal at different (unscaled, scale) widths:
            # 10^40 e-5 == 10^41 e-6 -> LWW-collapse, newer survives
            row(7, d(10 ** 40, 5), b"wide-dec-old", 30),
            row(7, d(10 ** 41, 6), b"wide-dec-new", 40),
            # differs from 10^40 only at the 41st digit: must NOT collapse
            row(7, d(10 ** 40 + 1, 5), b"wide-dec-keep", 31),
        ]},
    ]


def main() -> None:
    gen_dir = os.path.join(FIXTURE_DIR, "gen1")
    write_sstable_ma(
        gen_dir,
        partitions(),
        clustering_types=[INTEGER, DECIMAL],
        regular_columns=[(b"val", UTF8)],
        generation=1,
        version="nb",
    )
    print(f"fixture written to {gen_dir}")

    from aegisthus_spark.compact import compact
    from aegisthus_spark.output import to_aeg_json
    from aegisthus_spark.session import get_spark
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.sstable.modern import (
        header_for_data_file,
        name_sort_key_for_header,
    )

    spark = get_spark("make_varint_fixture", cpus=4)
    sk = name_sort_key_for_header(
        header_for_data_file(os.path.join(gen_dir, "nb-1-big-Data.db"))
    )
    cells = read_sstable_cells(spark, [gen_dir])
    lines = sorted(
        r.value for r in to_aeg_json(compact(cells, name_sort_key=sk)).collect()
    )
    # sanity: typed semantics must hold before freezing the golden
    joined = "\n".join(lines)
    assert "doomed" not in joined, "RT must shadow ck0=-50 under varint order"
    assert "old-write" not in joined, "equal decimals must LWW-collapse"
    assert b"wide-dec-old".hex() not in joined, (
        "numerically-equal WIDE decimals must LWW-collapse"
    )
    for want in ("keep-neg200", "new-write", "keep-300", "wide-neg", "wide-pos",
                 "wide-dec-new", "wide-dec-keep"):
        assert want.encode().hex() in joined or want in joined, want

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"line": lines}), GOLDEN)
    print(f"golden ({len(lines)} lines) written to {GOLDEN}")


if __name__ == "__main__":
    main()
