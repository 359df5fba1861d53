"""Large-scale training-data pipeline operators (beyond the reference's own
surface): deduplication, similarity search, text analysis, multimodal
plumbing, corpus curation, and temporal joins. All hot paths are JVM
expressions (no Python UDFs); hashes are md5-derived so a DuckDB oracle can
reproduce them bit-for-bit.
"""

from . import curation, dedup, ranking, similarity, temporal, text  # noqa: F401
