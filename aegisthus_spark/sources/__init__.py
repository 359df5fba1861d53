from .sstable_source import discover_data_files, plan_partitions, read_sstable_cells  # noqa: F401
from .aeg_json import parse_aeg_json, read_aeg_json  # noqa: F401
