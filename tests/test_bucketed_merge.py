"""Bucketed incremental merge: correctness (merge == one-shot compact) and
the scale property that motivates it — the snapshot side of the merge join
reads its buckets in place with no Exchange; only the new batch shuffles."""

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

TESTDATA = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"
BUCKETS = 8


def _cells(spark, case):
    from aegisthus_spark.sstable import scan_file
    from tests.conftest import CELLS_SCHEMA

    fields = ("source_path", "generation", "partition_key", "row_deleted_at",
              "kind", "cell_name", "cell_name_max", "value", "ts", "ttl",
              "local_deletion_time", "ts_of_last_delete")
    files = sorted(
        f for f in glob.glob(f"{TESTDATA}/{case}/input/**/*-Data.db", recursive=True)
        if ".idx" not in os.path.basename(f)
    )
    rows = [tuple(c[k] for k in fields) for f in files for c in scan_file(f)]
    return spark.createDataFrame(rows, CELLS_SCHEMA), files


def test_merge_compacted_equals_one_shot(spark):
    from aegisthus_spark.compact import compact, merge_compacted
    from aegisthus_spark.output import to_aeg_json

    cells, files = _cells(spark, "2.0.10/randomtable")
    cells = cells.cache()
    half = files[len(files) // 2]
    a = compact(cells.filter(F.col("source_path") < half))
    b = compact(cells.filter(F.col("source_path") >= half))
    merged = merge_compacted(a, b)
    got = sorted(r.value for r in to_aeg_json(merged).collect())
    want = sorted(r.value for r in to_aeg_json(compact(cells)).collect())
    assert got == want


def test_bucketed_merge_snapshot_side_does_not_shuffle(spark, tmp_path):
    from aegisthus_spark.compact import compact, merge_compacted
    from aegisthus_spark.plans import physical_plan
    from aegisthus_spark.streaming.incremental import (
        merge_bucketed,
        write_snapshot_bucketed,
    )

    cells, files = _cells(spark, "2.0.10/randomtable")
    cells = cells.cache()
    half = files[len(files) // 2]

    write_snapshot_bucketed(
        compact(cells.filter(F.col("source_path") < half)), "snap_v0", buckets=BUCKETS
    )
    merge_bucketed(
        spark, cells.filter(F.col("source_path") >= half), "snap_v0", "snap_v1",
        buckets=BUCKETS,
    )

    # correctness: the merged table equals one-shot compaction
    from aegisthus_spark.output import to_aeg_json

    got = sorted(r.value for r in to_aeg_json(spark.table("snap_v1")).collect())
    want = sorted(r.value for r in to_aeg_json(compact(cells)).collect())
    assert got == want

    # scale property: in the merge plan, the bucketed scan side has no
    # Exchange between the table scan and the join
    snap = spark.table("snap_v0")
    batch_rows = compact(
        cells.filter(F.col("source_path") >= half)
    ).repartition(BUCKETS, "partition_key")
    plan = physical_plan(merge_compacted(snap, batch_rows), "formatted")
    scan_section = plan[plan.index("Scan parquet") :]
    # bucketed read markers: the scan reports selected bucket count
    assert re.search(r"Bucketed: true", plan), plan[:2000]
    exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert exchanges <= 1, f"expected only the batch-side exchange:\n{plan[:3000]}"

    for t in ("snap_v0", "snap_v1"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
