"""Physical-plan introspection and scale guards."""

from .introspect import (  # noqa: F401
    count_exchanges,
    join_strategies,
    physical_plan,
    pushed_filters,
    read_schema,
    scan_report,
    unpartitioned_windows,
    wholestage_codegen_ids,
)
