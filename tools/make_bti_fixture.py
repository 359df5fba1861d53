"""Generate the BTI MULTI-SPLIT fixture + golden.

Writes tests/fixtures/bti/table — a Cassandra 5.0 `da-1-bti-*` table
(oa row format, deflate-compressed with 1 KB chunks, Index.db ABSENT,
trie sidecars present-but-opaque) sized so that the driver query
`sst_decode_bti_split` forces split planning through the round-10
Data.db boundary skip-walk (modern.partition_offsets_from_data) rather
than an index sidecar: 150 partitions exercising every skip path —
variable-length clustering values, range-tombstone markers, STATIC rows
(the EXTENSION_FLAG skip), empty (header-only) partitions, and
occasional fat values so split goals land mid-file.

The golden at tests/golden/bti_split.parquet is frozen only after
asserting the forced-multi-split decode (target_bytes=2048, >4 splits)
is byte-identical to the whole-file decode on this exact input — the
same freeze discipline as the rt-storm fixture.

Re-run only when the fixture content deliberately changes."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aegisthus_spark.sstable.modern import (  # noqa: E402
    KIND_INCL_END_BOUND,
    KIND_INCL_START_BOUND,
)
from aegisthus_spark.sstable.modern_writer import UTF8, write_sstable_ma  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "tests", "fixtures", "bti", "table")
GOLDEN = os.path.join(ROOT, "tests", "golden", "bti_split.parquet")


def build_partitions() -> list[dict]:
    parts = []
    for i in range(150):
        if i % 17 == 3:
            # empty partition: key + partition deletion only (P7 shape;
            # the walk must hit END_OF_PARTITION right after the header)
            parts.append({"key": b"key%04d" % i,
                          "deletion": (500 + i, 1442880000), "rows": []})
            continue
        rows = []
        if i % 7 == 0:
            # static row: EXTENSION_FLAG + IS_STATIC, no clustering blocks
            rows.append({"static": True,
                         "cells": [{"column": b"s", "value": b"st%03d" % i,
                                    "ts": 900 + i}]})
        n_rows = 1 + (i * 11) % 6
        for j in range(n_rows):
            # variable-width clustering -> the per-value vint-length skip
            ck = (b"c%0*d" % (2 + (i + j) % 9, j))
            fat = 20 + ((i * 13 + j * 7) % 180)
            rows.append({
                "clustering": [ck],
                "liveness": (1000 + i * 7 + j,),
                "cells": [{"column": b"val",
                           "value": bytes([65 + (i + j) % 26]) * fat}],
            })
        if i % 5 == 0:
            rows = (
                [{"marker": KIND_INCL_START_BOUND, "clustering": [b"a"],
                  "deletion": (800 + i, 1442880000)}]
                + rows
                + [{"marker": KIND_INCL_END_BOUND, "clustering": [b"zz"],
                    "deletion": (800 + i, 1442880000)}]
            )
        parts.append({"key": b"key%04d" % i, "rows": rows})
    return parts


def main() -> None:
    if os.path.isdir(FIXTURE):
        shutil.rmtree(FIXTURE)
    write_sstable_ma(
        FIXTURE,
        build_partitions(),
        clustering_types=[UTF8],
        static_columns=[(b"s", UTF8)],
        regular_columns=[(b"val", UTF8)],
        version="oa",
        compress=True,
        chunk_length=1024,
    )
    os.unlink(os.path.join(FIXTURE, "oa-1-big-Index.db"))
    for fn in sorted(os.listdir(FIXTURE)):
        os.rename(
            os.path.join(FIXTURE, fn),
            os.path.join(FIXTURE, fn.replace("oa-1-big-", "da-1-bti-", 1)),
        )
    # opaque trie sidecars: present (a real table ships them), never read
    for side in ("Partitions.db", "Rows.db"):
        with open(os.path.join(FIXTURE, f"da-1-bti-{side}"), "wb") as f:
            f.write(b"\x00trie-opaque")

    # freeze discipline: multi-split output must equal whole-file output
    from pyspark.sql import functions as F

    from aegisthus_spark.compact import compact
    from aegisthus_spark.output import to_aeg_json
    from aegisthus_spark.session import get_spark
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.sources.sstable_source import _plan_one

    data = os.path.join(FIXTURE, "da-1-bti-Data.db")
    splits = _plan_one(data, target_bytes=2048)
    assert len(splits) > 4, f"fixture too small to force multi-split: {splits}"

    spark = get_spark("make-bti-fixture", cpus=8)

    def lines(target):
        cells = read_sstable_cells(spark, [FIXTURE], target_bytes=target,
                                   combine=False)
        return sorted(
            r.line for r in to_aeg_json(compact(cells))
            .select(F.col("value").alias("line")).collect()
        )

    whole = lines(1 << 30)
    split = lines(2048)
    assert whole == split, "multi-split decode diverges from whole-file"

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"line": pa.array(whole, type=pa.string())}), GOLDEN
    )
    print(f"fixture: {FIXTURE} ({len(splits)} splits at 2 KB target)")
    print(f"golden: {GOLDEN} ({len(whole)} lines)")


if __name__ == "__main__":
    main()
