"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    from aegisthus_spark.queries import REGISTRY
    from aegisthus_spark.session import get_spark

    spark = get_spark("bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # min-of-N guards against CPU-steal spikes from noisy neighbors; the
    # plan+execution still runs end-to-end each rep (no caching between)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    total = 0.0
    for name, q in REGISTRY.items():
        best, n = None, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_total_query_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
