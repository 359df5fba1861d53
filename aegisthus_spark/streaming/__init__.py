"""Structured Streaming surface.

The reference is batch-only; true streaming ("reading data from the commit
logs as they are written") was an abandoned enhancement
(reference README.md:37-49). This package implements that enhancement
Spark-first, plus streaming analogs of the batch event queries.
"""

from .incremental import rows_to_cells, start_incremental_snapshot  # noqa: F401
from .events import (  # noqa: F401
    read_events_stream,
    stream_daily_rollup,
    stream_latest_per_user,
    stream_sessionize,
)
