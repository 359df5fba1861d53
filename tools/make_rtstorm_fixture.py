"""Generate the RANGE-TOMBSTONE-STORM fixture.

Writes tests/fixtures/ma_rtstorm/gen1..gen5 — nb-version (4.0) tables
clustered by Int32Type whose 'storm' partition carries 134 range
tombstones over 400 rows after the multi-generation merge — above
compact._RT_PROBE_MAX (64), so the driver query `sst_decode_rt_storm`
exercises the round-9 SKYLINE tier (sorted RT start/end sweep +
per-cell binary search) end-to-end, while the 'calm' partition (1 RT)
rides the probe tier in the same job.

Within each generation the tombstones are disjoint and in clustering
order (what a real sstable holds — Cassandra merges overlaps inside a
file); the OVERLAPPING shapes come from merging generations, exactly
the real-world source of overlap:

- gen1: the 400 rows + 120 alternating point RTs (even ones cover the
  row — newer ts — odd ones are stale),
- gen2: 10 adjacent back-to-back covering ranges (boundary collisions)
  over ck 200..219, plus the outermost of a nested stack,
- gen3..gen5: successively narrower nested ranges around ck 350..390
  with ts increasing inward (the antichain's worst direction; only the
  innermost is newer than the rows).

The golden at tests/golden/decode_golden_rtstorm.parquet is frozen only
after asserting the skyline output EQUALS the per-cell probe's on this
exact input (both tiers run below).

Re-run only when the fixture content deliberately changes."""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aegisthus_spark.sstable.modern_writer import UTF8, write_sstable_ma  # noqa: E402

INT32 = "org.apache.cassandra.db.marshal.Int32Type"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(ROOT, "tests", "fixtures", "ma_rtstorm")
GOLDEN = os.path.join(ROOT, "tests", "golden", "decode_golden_rtstorm.parquet")

TS0 = 1_600_000_000_000_000  # micros
LDT0 = 1_600_000_000  # seconds
INCL_START, INCL_END = 1, 6
ROW_TS = 100  # ts offset of every live row


def ck(n: int) -> bytes:
    return struct.pack(">i", n)


def row(c: int, name: bytes) -> dict:
    return {
        "clustering": [ck(c)],
        "liveness": (TS0 + ROW_TS,),
        "cells": [{"column": b"val", "value": name}],
    }


def _sorted_rows(items: list[tuple[int, int, dict]]) -> list[dict]:
    """(ck, rank, entry) -> entries in clustering order; rank 0 = start
    bound (sorts before the row at the same ck), 1 = row, 2 = end bound."""
    return [e for _, _, e in sorted(items, key=lambda t: (t[0], t[1]))]


def _rt(items: list, lo: int, hi: int, ts_off: int) -> None:
    items.append((lo, 0, {"marker": INCL_START, "clustering": [ck(lo)],
                          "deletion": (TS0 + ts_off, LDT0)}))
    items.append((hi, 2, {"marker": INCL_END, "clustering": [ck(hi)],
                          "deletion": (TS0 + ts_off, LDT0)}))


def generations() -> list[list[dict]]:
    # gen1: rows + 120 disjoint point RTs (every 3rd ck; alternating
    # covering/stale deletion times)
    g1: list = []
    for c in range(400):
        g1.append((c, 1, row(c, b"v%03d" % c)))
    for j in range(120):
        _rt(g1, 3 * j, 3 * j, ROW_TS + 100 if j % 2 == 0 else ROW_TS - 50)
    # gen2: 10 adjacent covering ranges (200..219) + nested level 0
    g2: list = []
    for j in range(10):
        _rt(g2, 200 + 2 * j, 201 + 2 * j, ROW_TS + 150)
    _rt(g2, 350, 390, ROW_TS - 49)  # outermost nested: stale
    # gen3..gen5: narrower nested ranges, ts increasing inward; only the
    # innermost (gen5) is newer than the rows
    g3, g4, g5 = [], [], []
    _rt(g3, 355, 385, ROW_TS - 30)
    _rt(g4, 360, 380, ROW_TS - 10)
    _rt(g5, 365, 375, ROW_TS + 200)
    calm = [(c, 1, row(c, b"c%03d" % c)) for c in range(10)]
    _rt(calm, 5, 7, ROW_TS + 100)

    def parts(storm_items, with_calm=False):
        out = [{"key": b"storm", "rows": _sorted_rows(storm_items)}]
        if with_calm:
            # write_sstable_ma emits partitions in INPUT order (token
            # ordering is the caller's job for real-Cassandra parity;
            # this repo's sequential decoder does not depend on it) —
            # 'calm' rides along in gen1 only
            out.append({"key": b"calm", "rows": _sorted_rows(calm)})
        return out

    return [parts(g1, with_calm=True), parts(g2), parts(g3), parts(g4),
            parts(g5)]


def main() -> None:
    gen_dirs = []
    for i, parts in enumerate(generations(), start=1):
        gen_dir = os.path.join(FIXTURE_DIR, f"gen{i}")
        write_sstable_ma(
            gen_dir,
            parts,
            clustering_types=[INT32],
            regular_columns=[(b"val", UTF8)],
            generation=i,
            version="nb",
        )
        gen_dirs.append(gen_dir)
    print(f"fixture written to {FIXTURE_DIR} ({len(gen_dirs)} generations)")

    from pyspark.sql import functions as F

    from aegisthus_spark import compact as compact_mod
    from aegisthus_spark.compact import compact
    from aegisthus_spark.output import to_aeg_json
    from aegisthus_spark.session import get_spark
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.sstable.modern import (
        header_for_data_file,
        name_sort_key_for_header,
    )

    spark = get_spark("make_rtstorm_fixture", cpus=4)
    sk = name_sort_key_for_header(
        header_for_data_file(os.path.join(gen_dirs[0], "nb-1-big-Data.db"))
    )
    cells = read_sstable_cells(spark, gen_dirs)
    lines = sorted(
        r.value for r in to_aeg_json(compact(cells, name_sort_key=sk)).collect()
    )

    # the STORM PARTITION must really take the skyline tier — the
    # dispatch is per grouped partition, so a global count could pass
    # while every partition rides the probe
    n_rts = cells.filter(
        (F.col("kind") == "t") & (F.col("partition_key") == F.lit(b"storm"))
    ).count()
    assert n_rts > compact_mod._RT_PROBE_MAX, n_rts
    # ...and its output must equal the probe tier's on the same input
    orig = compact_mod._RT_PROBE_MAX
    try:
        compact_mod._RT_PROBE_MAX = 1 << 30  # force probe everywhere
        probe_lines = sorted(
            r.value
            for r in to_aeg_json(compact(cells, name_sort_key=sk)).collect()
        )
    finally:
        compact_mod._RT_PROBE_MAX = orig
    assert lines == probe_lines, "skyline and probe tiers disagree"

    joined = "\n".join(lines)
    # spot semantics: covered / stale / nested / adjacent shapes
    assert b"v000".hex() not in joined      # j=0 even point RT: covered
    assert b"v003".hex() in joined          # j=1 odd point RT: stale
    assert b"v370".hex() not in joined      # innermost nested range wins
    assert b"v364".hex() in joined          # outer nested layers all stale
    assert b"v349".hex() in joined          # outside the nested stack
    assert b"v200".hex() not in joined      # adjacent ranges cover
    assert b"v219".hex() not in joined
    assert b"c005".hex() not in joined      # calm partition (probe tier)
    assert b"c008".hex() in joined

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"line": lines}), GOLDEN)
    print(f"golden ({len(lines)} lines) written to {GOLDEN}")


if __name__ == "__main__":
    main()
