"""aegisthus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Netflix/aegisthus (reference studied at
/root/reference; see SURVEY.md).

The reference is a Hadoop MapReduce pipeline that compacts Cassandra SSTable
snapshots (last-write-wins + tombstone semantics) and exposes the result to a
Pig query surface. This package re-expresses that pipeline Spark-first:

- ``aegisthus_spark.sstable``  — pure-Python SSTable (Data.db/Index.db/
  CompressionInfo.db) decoders (reference: io/sstable/*).
- ``aegisthus_spark.sources``  — discovery + cells DataFrame source
  (reference: input/AegisthusInputFormat.java).
- ``aegisthus_spark.compact``  — the compaction transform: multi-generation
  merge, LWW, tombstones (reference: mapreduce/CassSSTableReducer.java).
- ``aegisthus_spark.output``   — aeg-JSON formatter/parser and other sinks
  (reference: output/JsonOutputFormat.java, aegisthus-pig/AegisthusLoader).
- ``aegisthus_spark.cql``      — CQL-row pivot (reference: org/coursera/*).
- ``aegisthus_spark.types``    — Cassandra comparator-type registry
  (reference: AbstractType usage across the codebase).
- ``aegisthus_spark.operators``— large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal) beyond the
  reference's own surface.
- ``aegisthus_spark.queries``  — the relational query surface (the reference
  delegates this to Pig; for us it is native Spark SQL).
"""

__version__ = "0.1.0"
