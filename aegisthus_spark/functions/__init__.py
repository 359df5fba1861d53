"""JVM-side Spark expression library for the aegisthus type edges.

Everything here returns :class:`pyspark.sql.Column` built from built-in
functions (whole-stage-codegen friendly) — no Python UDFs in any hot path.
"""

from .casts import (  # noqa: F401
    hex_to_chararray,
    hex_to_double,
    hex_to_float,
    hex_to_int,
    hex_to_long,
)
from .naming import legacy_column_name_format, name_sort_key  # noqa: F401
