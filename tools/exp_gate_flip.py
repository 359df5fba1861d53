"""R16 (VERDICT #2): verify BOTH graph/CC code paths against the DuckDB
oracle on either side of the driver-twin gate.

The gates are data-derived (observed pair count vs _CC_DRIVER_MAX_PAIRS
/ //10 for pagerank). This tool runs each graph query TWICE against its
oracle on the same sf dir: once as registered (pair counts at every
shipped SF sit BELOW the gates -> driver-twin path), and once with the
gates monkeypatched to -1 (forcing the DISTRIBUTED loops — the path a
100 TB pair set takes). Green on both = the gate flip cannot change
results, oracle-grade, at whatever size this corpus provides; the
synthetic above-gate sizes are covered by the CI equivalence tests
(test_graph_driver_paths_match_distributed & the r16 foreign-endpoint
test), which pin driver == distributed bit-for-bit.

Usage: python tools/exp_gate_flip.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import duckdb

    from aegisthus_spark.operators import dedup as dd
    from aegisthus_spark.operators import graph as g
    from aegisthus_spark.queries import REGISTRY
    from aegisthus_spark.session import get_spark
    from check_oracle import TABLES, norm, values_equal
    import pandas as pd

    spark = get_spark("gate_flip")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    names = [
        "dedup_components", "graph_pagerank", "graph_lpa_communities",
        "dedup_semantic", "dedup_canonical_best", "doc_curate_pipeline",
    ]

    def check(name: str, label: str) -> None:
        got = norm(REGISTRY[name].fn(spark, sf_dir).toPandas())
        want = norm(con.execute(REGISTRY[name].sql).df())
        assert list(got.columns) == list(want.columns), (name, label, "cols")
        assert len(got) == len(want), (name, label, len(got), len(want))
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], want[c])):
                if not values_equal(a, b):
                    raise AssertionError((name, label, c, i, a, b))
        print(f"{name} [{label}]: OK ({len(got)} rows)")

    # pair count at this SF (the gate input)
    docs = REGISTRY["dedup_components"]  # noqa: F841 (registered funnel)
    from aegisthus_spark.queries import _t

    pairs = dd.minhash_lsh_dedup(
        _t(spark, sf_dir, "documents"), threshold=0.1, sort=False
    )
    n_pairs = pairs.count()
    print(f"sf_dir={sf_dir}: observed LSH pair count = {n_pairs} "
          f"(CC/LPA gate {dd._CC_DRIVER_MAX_PAIRS}, "
          f"pagerank gate {dd._CC_DRIVER_MAX_PAIRS // 10})")

    for name in names:
        check(name, "as-registered (driver twin below gate)")

    dd._CC_DRIVER_MAX_PAIRS = -1
    g._CC_DRIVER_MAX_PAIRS = -1
    try:
        for name in names:
            check(name, "gates=-1 (forced distributed loops)")
    finally:
        pass
    print("ALL GREEN both paths")


if __name__ == "__main__":
    main()
