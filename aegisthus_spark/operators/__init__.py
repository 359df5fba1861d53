"""Large-scale training-data pipeline operators (beyond the reference's own
surface): deduplication, similarity search, text analysis, multimodal
plumbing, corpus curation, temporal joins, graph analytics, and
cardinality sketches. All hot paths are JVM
expressions (no Python UDFs); hashes are md5-derived so a DuckDB oracle can
reproduce them bit-for-bit.
"""

from . import (  # noqa: F401
    curation,
    dedup,
    graph,
    ranking,
    similarity,
    sketch,
    temporal,
    text,
)
