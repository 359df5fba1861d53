"""Scalable total-order ranking.

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row through a
single task — fine at dimension cardinality, fatal on a fact table. The
two-stage pattern here keeps the same semantics with bounded per-task work:

1. ``repartitionByRange`` on the sort key — a distributed range sort; each
   of N partitions holds a contiguous, disjoint key range.
2. Rank locally inside each partition (``Window.partitionBy(_pid)`` — no
   global funnel).
3. Add per-partition offsets: the cumulative row counts of the preceding
   partitions. The offset table has exactly N rows, so its own global
   window is O(num_partitions), and it broadcast-joins back.

Equivalent to ``row_number() OVER (ORDER BY ...)``; equals ``RANK()`` /
``DENSE_RANK()`` too whenever the sort key is unique (no ties).

Determinism: the range-partitioned frame is consumed by TWO subtrees (the
offset aggregation and the final join). ``repartitionByRange`` picks its
boundaries by sampling, so if the two subtrees re-executed it independently
(AQE re-planning, task retries) they could see DIFFERENT boundaries —
counts against one partitioning, local ranks against another → duplicated
or skipped ranks. The frame is therefore pinned with an eager
``localCheckpoint()`` before fan-out: both subtrees read the same
materialized partitions. Cost: one extra materialization of the input —
bounded, and the price of a correct global rank at scale. (Lineage is
truncated; on executor loss the job retries from the checkpoint's parent
stage rather than recomputing divergent boundaries.)

This module intentionally still exists for FACT-scale input. For
dimension-cardinality input (e.g. post-aggregation, ≤ ~100k rows) a plain
``Window.orderBy`` single-task window is both faster and trivially
deterministic — use that instead; the machinery here (sampling pass +
counts job + broadcast + an extra shuffle) only pays for itself when the
data can't fit one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column | str],
    value_col: str,
    *,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``SUM(value) OVER (PARTITION BY part ORDER BY order ROWS
    UNBOUNDED PRECEDING)`` without funneling any partition-by group through
    one task — groups here are fact-scale strata (e.g. a language holding
    most of a corpus), not dimensions.

    Same two-stage shape as :func:`global_row_number`: range-partition on
    (part, order) so each range partition holds contiguous runs of each
    group, sum locally, then add per-(range-partition, group) offsets —
    an offset table of O(num_partitions x groups) rows, broadcast back.
    The range-partitioned frame fans out to two consumers, so it is pinned
    with an eager ``localCheckpoint`` (see module docstring).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *part_cols, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint()
    sums = parted.groupBy("_pid", *part_cols).agg(F.sum(value_col).alias("_s"))
    off_w = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "_pid", *part_cols, F.coalesce(F.sum("_s").over(off_w), F.lit(0)).alias("_off")
    )
    local_w = Window.partitionBy("_pid", *part_cols).orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), ["_pid", *part_cols])
        .withColumn(out_col, F.sum(value_col).over(local_w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    *,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global rank column in the given total order.

    Ties: rows with equal sort keys get distinct, arbitrary consecutive
    ranks (row_number semantics) — pass a tiebreaker column to make the
    order total and the result deterministic.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pin ONE evaluation of the sampled range partitioning before it fans
    # out into two consumers — see module docstring. Eager: materializes now.
    parted = parted.localCheckpoint()
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # N-row table: the only unpartitioned window runs over partition COUNTS
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.row_number().over(local_w) + F.col("_off")).cast("int"))
        .drop("_pid", "_off")
    )
