from .sstable_source import discover_data_files, plan_partitions, read_sstable_cells  # noqa: F401
