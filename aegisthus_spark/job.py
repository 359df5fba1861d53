"""The compaction snapshot job — CLI parity with the reference
(com.netflix.Aegisthus: -input/-inputDir/-output plus the aegisthus.*
feature options, Aegisthus.java:132-177,262-336).

    python -m aegisthus_spark.job --input-dir /sstables --output /snapshot \\
        [--max-corrupt-files-to-skip N] [--maxcolsize BYTES] \\
        [--key-type T --column-type T --column-value-type T]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Observation

from .compact import compact
from .output import to_aeg_json
from .sources import read_sstable_cells


def compact_snapshot(
    spark: SparkSession,
    inputs: list[str],
    *,
    max_row_size: int | None = None,
    skip_corrupt: bool = False,
    key_type: str = "BytesType",
    column_type: str = "BytesType",
    column_value_type: str = "BytesType",
) -> DataFrame:
    """inputs -> compacted rows DataFrame (sorted within partitions by key,
    mirroring the reference's per-reducer output order, SURVEY O5)."""
    cells = read_sstable_cells(spark, inputs, skip_corrupt=skip_corrupt)
    name_sort_key = None
    if column_type not in ("BytesType", "UTF8Type", "AsciiType"):
        from . import types as aegtypes

        comp = aegtypes.get(column_type)

        @F.udf("binary")
        def sort_key(b):
            return comp.sort_key(bytes(b)) if b is not None else None

        name_sort_key = sort_key(F.col("cell_name"))
    rows = compact(cells, max_row_size=max_row_size, name_sort_key=name_sort_key)
    # compact() leaves data hash-partitioned by partition_key; an in-partition
    # sort adds no shuffle and reproduces the reference's output ordering
    return rows.sortWithinPartitions("partition_key")


def write_snapshot_json(
    rows: DataFrame,
    output: str,
    *,
    key_type: str = "BytesType",
    column_type: str = "BytesType",
    column_value_type: str = "BytesType",
    max_col_size: int | None = None,
) -> int:
    """Write aeg-JSON text files; returns rows written (reference counter
    ``rows_written``, via the Observation API instead of Hadoop counters)."""
    obs = Observation("rows_written")
    lines = to_aeg_json(
        rows.observe(obs, F.count(F.lit(1)).alias("n")),
        key_type=key_type,
        name_type=column_type,
        value_type=column_value_type,
        max_col_size=max_col_size,
    )
    lines.write.mode("overwrite").text(output)
    return int(obs.get["n"])


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser(description="Aegisthus compaction snapshot on Spark")
    ap.add_argument("--input", action="append", default=[], help="SSTable file (repeatable)")
    ap.add_argument("--input-dir", action="append", default=[], help="directory to walk (repeatable)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-corrupt-files-to-skip", type=int, default=0)
    ap.add_argument("--maxcolsize", type=int, default=None)
    ap.add_argument("--key-type", default="BytesType")
    ap.add_argument("--column-type", default="BytesType")
    ap.add_argument("--column-value-type", default="BytesType")
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark("aegisthus-snapshot")
    rows = compact_snapshot(
        spark,
        args.input + args.input_dir,
        max_row_size=args.maxcolsize,
        skip_corrupt=args.max_corrupt_files_to_skip > 0,
        key_type=args.key_type,
        column_type=args.column_type,
        column_value_type=args.column_value_type,
    )
    n = write_snapshot_json(
        rows,
        args.output,
        key_type=args.key_type,
        column_type=args.column_type,
        column_value_type=args.column_value_type,
        max_col_size=args.maxcolsize,
    )
    print(f"rows_written={n}")


if __name__ == "__main__":
    main()
