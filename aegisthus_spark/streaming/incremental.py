"""Incremental compacted snapshots — the reference's abandoned streaming
enhancement (reference README.md:37-49: "improve the incremental processing
to retrieve data in a more real time fashion"), built on Structured
Streaming.

Design (LSM-style, scale-first):

- New SSTable generations are decoded to **cell parquet** as they land
  (`aegisthus_spark.job` batch path or any writer producing CELLS_COLUMNS).
- A file-source stream tails the cell directory; each micro-batch is merged
  with the current snapshot by re-running ``compact()`` over
  ``snapshot-as-cells UNION new-cells`` and writing a **new snapshot
  version** directory (never overwriting the version being read — the swap
  is a marker-file flip, so readers always see a complete snapshot).
- At 100 TB the union re-shuffles only the merge keys' partitions when the
  snapshot is bucketed by ``partition_key`` (``bucketBy`` on write keeps the
  snapshot side shuffle-free); the micro-batch side is small by definition.

Unlike the reference's one-shot reducer (which drops range tombstones after
applying them, CassSSTableReducer.java:173-192), snapshots here RETAIN
surviving range tombstones: ``compact(keep_range_tombstones=True)`` carries
them as ``kind='t'`` column entries (min bound in ``name``, max bound in
``value``), :func:`rows_to_cells` restores them to RT cell records, and
``merge_compacted`` applies + re-emits them — so a cell arriving N batches
late, older than an already-applied RT, is still shadowed. Row tombstones
are likewise retained via ``deleted_at``. RT bounds compare as raw bytes
by default — correct for byte-ordered comparators; ``merge_batch`` /
``start_incremental_snapshot`` accept ``name_sort_key`` for typed names
(e.g. 3.x input via ``modern.name_sort_key_for_header``), while the
bucketed fast path (``merge_bucketed``/``merge_compacted``) keeps the
byte-ordered contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LONG_MIN = -(1 << 63)

#: DDL schema of the canonical cell stream (matches compact.CELLS_COLUMNS)
CELLS_DDL = (
    "source_path string, generation int, partition_key binary, row_deleted_at long, "
    "kind string, cell_name binary, cell_name_max binary, value binary, ts long, "
    "ttl int, local_deletion_time int, ts_of_last_delete long"
)

LATEST_MARKER = "_LATEST"


def rows_to_cells(rows: DataFrame, *, source_path: str = "snapshot") -> DataFrame:
    """Compacted rows -> canonical cell stream (inverse of compact()).

    Empty rows become row-only ``kind='r'`` records so row tombstones keep
    shadowing late-arriving cells across merges (P7: deletes are data).
    """
    exploded = rows.select(
        "partition_key", "deleted_at", F.explode_outer("columns").alias("c")
    )
    is_rt = F.col("c.kind") == "t"
    return exploded.select(
        F.lit(source_path).alias("source_path"),
        F.lit(0).alias("generation"),
        "partition_key",
        F.col("deleted_at").alias("row_deleted_at"),
        F.coalesce(F.col("c.kind"), F.lit("r")).alias("kind"),
        F.col("c.name").alias("cell_name"),
        # retained RT entries store the max bound in `value` (see compact())
        F.when(is_rt, F.col("c.value")).alias("cell_name_max"),
        F.when(~is_rt, F.col("c.value")).alias("value"),
        F.coalesce(F.col("c.ts"), F.lit(LONG_MIN)).alias("ts"),
        F.col("c.ttl").alias("ttl"),
        F.col("c.local_deletion_time").alias("local_deletion_time"),
        F.col("c.ts_of_last_delete").alias("ts_of_last_delete"),
    )


def strip_range_tombstones(rows: DataFrame) -> DataFrame:
    """Export view of a snapshot: drop the retained ``kind='t'`` entries.

    Snapshots carry surviving range tombstones so later merges stay correct;
    a point-in-time export (aeg-JSON, CQL) wants only the cells — exactly
    what the reference's one-shot reducer emits."""
    return rows.withColumn("columns", F.expr("filter(columns, c -> c.kind != 't')"))


def latest_snapshot_version(snapshot_root: str) -> int | None:
    marker = os.path.join(snapshot_root, LATEST_MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def read_snapshot(spark: SparkSession, snapshot_root: str) -> DataFrame | None:
    """Current snapshot rows, or None before the first merge."""
    v = latest_snapshot_version(snapshot_root)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_root, f"v{v:05d}"))


def merge_batch(
    spark: SparkSession, batch_cells: DataFrame, snapshot_root: str,
    *, name_sort_key=None,
) -> int:
    """Merge one batch of cells into the snapshot; returns the new version.

    ``name_sort_key``: comparator-aware ordering passed through to
    ``compact()`` — required for typed (non-byte-ordered) cell names,
    e.g. 3.x input via ``modern.name_sort_key_for_header``; the bucketed
    fast path (``merge_bucketed``/``merge_compacted``) keeps the
    byte-ordered contract instead."""
    from ..compact import compact

    prev = read_snapshot(spark, snapshot_root)
    prev_version = latest_snapshot_version(snapshot_root)
    cells = batch_cells
    if prev is not None:
        cells = rows_to_cells(prev).unionByName(batch_cells)
    merged = compact(
        cells, keep_range_tombstones=True, name_sort_key=name_sort_key
    ).sortWithinPartitions(
        "partition_key"
    )
    new_version = 0 if prev_version is None else prev_version + 1
    out = os.path.join(snapshot_root, f"v{new_version:05d}")
    merged.write.mode("overwrite").parquet(out)
    # publish: readers follow the marker, never a half-written directory.
    # The marker flip itself must be atomic too — write-in-place would
    # expose an empty/partial marker to a concurrent reader (or leave one
    # behind on a crash); temp file + os.replace is atomic on POSIX.
    marker = os.path.join(snapshot_root, LATEST_MARKER)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
    return new_version


def write_snapshot_bucketed(
    rows: DataFrame, table: str, *, buckets: int = 32
) -> None:
    """Persist compacted rows as a parquet table bucketed by partition_key.

    Bucketing is what makes steady-state incremental merges cheap: the
    snapshot side of :func:`merge_bucketed` reads pre-hashed buckets and
    never shuffles; only the (small) incoming batch does.
    """
    (
        rows.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "partition_key")
        .sortBy("partition_key")
        .saveAsTable(table)
    )


def merge_bucketed(
    spark: SparkSession, batch_cells: DataFrame, table: str, new_table: str, *, buckets: int = 32
) -> None:
    """One incremental merge against a bucketed snapshot table.

    The batch is compacted (one shuffle of batch-sized data), then merged
    into the snapshot with a full outer join in which the bucketed snapshot
    side has NO Exchange — asserted by tests/test_bucketed_merge.py. The
    result is written as ``new_table`` (versioned tables, reader flips on
    publish, same idea as the directory marker).
    """
    from ..compact import compact, merge_compacted

    snap = spark.table(table)
    batch_rows = compact(batch_cells, keep_range_tombstones=True).repartition(
        buckets, "partition_key"
    )
    merged = merge_compacted(snap, batch_rows)
    write_snapshot_bucketed(merged, new_table, buckets=buckets)


def start_incremental_snapshot(
    spark: SparkSession,
    cells_dir: str,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
    name_sort_key=None,
):
    """Tail a cell-parquet directory and maintain a compacted snapshot.

    Returns the StreamingQuery. Each micro-batch is one merge; exactly-once
    comes from the checkpointed file-source offsets plus the version-marker
    publish (a replayed batch rewrites the same version idempotently).
    """
    os.makedirs(snapshot_root, exist_ok=True)
    # cell batches commonly arrive as per-batch subdirectories; list recursively
    reader = spark.readStream.schema(CELLS_DDL).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(cells_dir)

    def for_each_batch(batch_df: DataFrame, batch_id: int):
        merge_batch(
            batch_df.sparkSession, batch_df, snapshot_root,
            name_sort_key=name_sort_key,
        )

    writer = stream.writeStream.foreachBatch(for_each_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
