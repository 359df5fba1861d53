import pytest


@pytest.fixture(scope="session")
def spark():
    from aegisthus_spark.session import get_spark

    s = get_spark("tests", cpus=4)
    yield s


CELLS_SCHEMA = (
    "source_path string, generation int, partition_key binary, row_deleted_at long, "
    "kind string, cell_name binary, cell_name_max binary, value binary, ts long, "
    "ttl int, local_deletion_time int, ts_of_last_delete long"
)


@pytest.fixture(scope="session")
def cells_schema():
    return CELLS_SCHEMA
