"""Value-gate for the GATE_TAIL queries.

The driver's CORRECTNESS file records only the first GATE_WINDOW
registered queries; everything in GATE_TAIL runs un-gated there. This
module closes that gap in CI: every tail query is compared against its
DuckDB oracle (row count, schema, sorted values) at sf0.001 with the same
comparison tools/driver_sim.py uses — so a tail query is never merely
"registered", it is value-checked on every test run.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _tail_names():
    from aegisthus_spark.queries import GATE_TAIL, REGISTRY

    return [n for n in GATE_TAIL if n in REGISTRY]


@pytest.mark.parametrize("name", _tail_names())
def test_tail_query_matches_oracle(spark, oracle_con, name):
    from driver_sim import compare

    from aegisthus_spark.queries import REGISTRY

    q = REGISTRY[name]
    assert q.sql is not None, f"{name} has no oracle SQL"
    got = q.fn(spark, SF_DIR)
    want = oracle_con.sql(q.sql).df()
    problem = compare(got, want, name)
    assert problem is None, problem
