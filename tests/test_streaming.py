"""Streaming tests: incremental snapshot maintenance converges to the batch
compact() result, and event-stream operators match their batch equivalents
at sf0.001."""

import glob
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
TESTDATA = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"


def _cells_df(spark, case):
    from aegisthus_spark.sstable import scan_file
    from tests.conftest import CELLS_SCHEMA

    fields = ("source_path", "generation", "partition_key", "row_deleted_at",
              "kind", "cell_name", "cell_name_max", "value", "ts", "ttl",
              "local_deletion_time", "ts_of_last_delete")
    files = sorted(
        f
        for f in glob.glob(f"{TESTDATA}/{case}/input/**/*-Data.db", recursive=True)
        if ".idx" not in os.path.basename(f)
    )
    rows = [tuple(c[k] for k in fields) for f in files for c in scan_file(f)]
    return spark.createDataFrame(rows, CELLS_SCHEMA), files


def test_incremental_snapshot_converges(spark, tmp_path):
    """Feed generations in two batches; final snapshot == one-shot compact."""
    from aegisthus_spark.compact import compact
    from aegisthus_spark.output import to_aeg_json
    from aegisthus_spark.streaming import start_incremental_snapshot
    from aegisthus_spark.streaming.incremental import (
        latest_snapshot_version,
        read_snapshot,
    )

    cells, files = _cells_df(spark, "2.0.10/randomtable")
    cells = cells.cache()
    half = files[len(files) // 2]

    cells_dir = str(tmp_path / "cells")
    os.makedirs(cells_dir)
    # two arrival batches: first half of the generations, then the rest
    cells.filter(F.col("source_path") < half).coalesce(1).write.parquet(
        f"{cells_dir}/batch0.parquet"
    )
    cells.filter(F.col("source_path") >= half).coalesce(1).write.parquet(
        f"{cells_dir}/batch1.parquet"
    )

    snap_root = str(tmp_path / "snapshot")
    q = start_incremental_snapshot(
        spark,
        cells_dir,
        snap_root,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(120)
    assert latest_snapshot_version(snap_root) >= 1  # merged in >= 2 batches

    from aegisthus_spark.streaming.incremental import strip_range_tombstones

    final = read_snapshot(spark, snap_root)
    got = sorted(r.value for r in to_aeg_json(strip_range_tombstones(final)).collect())
    want = sorted(r.value for r in to_aeg_json(compact(cells)).collect())
    assert got == want


def test_stream_daily_rollup_matches_batch(spark, tmp_path):
    from aegisthus_spark.streaming import read_events_stream, stream_daily_rollup

    from aegisthus_spark.queries import _events

    events = _events(spark, SF_DIR)
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    q = (
        stream_daily_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.day), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("select * from rollup").collect()
    }
    want = {
        (str(r.day), r.event_type): (r.n_events, r.total_value)
        for r in events.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert got == want


def test_stream_sessionize_matches_batch(spark):
    from aegisthus_spark.streaming import read_events_stream, stream_sessionize

    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    per_user = (
        spark.sql("select * from sessions")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    got = {(r.user_id): (r.n_sessions, r.n_events) for r in per_user.collect()}

    # batch oracle: the registered ev_sessionize query (lag + running sum)
    import __spark_entry__ as entry

    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in entry.queries()["ev_sessionize"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_latest_per_user_matches_batch(spark):
    from aegisthus_spark.streaming import read_events_stream, stream_latest_per_user

    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    q = (
        stream_latest_per_user(stream)
        .writeStream.format("memory")
        .queryName("latest")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit a row per batch; keep the newest per user
    got = {
        r.user_id: (r.ts, r.event_type)
        for r in spark.sql(
            "select user_id, max_by(ts, ts) ts, max_by(event_type, ts) event_type "
            "from latest group by user_id"
        ).collect()
    }
    from aegisthus_spark.queries import _events

    events = _events(spark, SF_DIR)
    want = {
        r.user_id: (r.ts, r.event_type)
        for r in events.groupBy("user_id")
        .agg(
            F.max_by("ts", F.struct("ts", "event_id")).alias("ts"),
            F.max_by("event_type", F.struct("ts", "event_id")).alias("event_type"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], f"user {u}: ts {got[u][0]} != {want[u][0]}"
