"""aeg-JSON snapshot reader — the relational query surface over a compacted
snapshot, equivalent to the reference's Pig loader
(aegisthus-pig/.../AegisthusLoader.java:98-137,248-276):

    read_aeg_json(spark, path) ->
        key: string            (hex row key, loader field ``key``)
        deletedat: long
        map_columns: map<string, column>   (name -> column struct)
        bag_columns: array<column>

where ``column`` is ``struct<name, value, ts, status, ttl,
local_deletion_time, ts_of_last_delete>`` — the loader's variable-length
``(name, value, ts[, status[, …]])`` tuples as one typed struct.

``clean=True`` applies the loader's cleanse (AegisthusLoader.java:75-90):
drop columns with ``deletedAt > ts`` or status ``"d"``, then drop rows left
empty (:119-129). Projection pushdown (P1, pushProjection) is Catalyst
column pruning — free.

The whole parse is JVM-side: one ``from_json`` into a dynamic-key map plus
array transforms; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the dynamic-key wrapper {"<hexkey>": {"deletedAt": N, "columns": [[...]]}}
#: parsed as a single-entry map; heterogeneous column entries land as strings
_LINE_SCHEMA = "map<string, struct<deletedAt: bigint, columns: array<array<string>>>>"

COLUMN_STRUCT = (
    "struct<name: string, value: string, ts: bigint, status: string, "
    "ttl: int, local_deletion_time: int, ts_of_last_delete: bigint>"
)

# entry layouts (output/JsonOutputFormat.java:149-168):
#   [name, value, ts]                  live
#   [name, value, ts, "d"]             deleted
#   [name, value, ts, "e", ttl, ldt]   expiring
#   [name, value, ts, "c", tsLastDel]  counter
_ENTRY_TO_STRUCT = f"""
transform(columns, e -> cast(named_struct(
    'name', get(e, 0),
    'value', get(e, 1),
    'ts', cast(get(e, 2) as bigint),
    'status', coalesce(get(e, 3), ''),
    'ttl', if(get(e, 3) = 'e', cast(get(e, 4) as int), cast(null as int)),
    'local_deletion_time', if(get(e, 3) = 'e', cast(get(e, 5) as int), cast(null as int)),
    'ts_of_last_delete', if(get(e, 3) = 'c', cast(get(e, 4) as bigint), cast(null as bigint))
) as {COLUMN_STRUCT}))
"""


def parse_aeg_json(lines: DataFrame, *, clean: bool = False) -> DataFrame:
    """text DataFrame (column ``value``) -> loader-shaped DataFrame."""
    body = F.substring_index(F.col("value"), "\t", -1)
    parsed = lines.select(F.from_json(body, _LINE_SCHEMA).alias("m")).select(
        F.map_keys(F.col("m")).getItem(0).alias("key"),
        F.map_values(F.col("m")).getItem(0).alias("row"),
    )
    cols = parsed.select(
        "key",
        F.col("row.deletedAt").alias("deletedat"),
        F.expr(_ENTRY_TO_STRUCT.replace("columns", "row.columns")).alias("bag_columns"),
    )
    if clean:
        cols = cols.withColumn(
            "bag_columns",
            F.expr("filter(bag_columns, c -> NOT (deletedat > c.ts OR c.status = 'd'))"),
        ).filter(F.size("bag_columns") > 0)
    return cols.select(
        "key",
        "deletedat",
        F.map_from_entries(
            F.expr("transform(bag_columns, c -> struct(c.name, c))")
        ).alias("map_columns"),
        "bag_columns",
    )


def read_aeg_json(spark: SparkSession, path: str, *, clean: bool = False) -> DataFrame:
    """Read an aeg-JSON snapshot directory/file into the loader schema."""
    return parse_aeg_json(spark.read.text(path), clean=clean)
