"""Split per-query bench time into CONSTRUCT (driver-side work inside the
registered fn: seed collects, Lloyd refinement, counts) vs COUNT (the
timed action bench.py runs). Two reps each, cache cleared between, so the
second rep shows the warm-JVM number bench.py's min-of-N converges to.

Usage:
    python tools/profile_queries.py [--reps 2] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from aegisthus_spark.queries import REGISTRY
    from aegisthus_spark.session import get_spark

    missing = [n for n in args.names if n not in REGISTRY]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark("profile_queries")
    # warm the JVM once (same as bench.py)
    for w in ("lineitem", "documents", "events"):
        p = f"{args.sf_dir}/{w}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
            break

    rows = []
    for name in args.names:
        per = []
        for rep in range(args.reps):
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            per.append({"construct": round(t1 - t0, 3),
                        "count": round(t2 - t1, 3),
                        "total": round(t2 - t0, 3), "rows": n})
        best = min(per, key=lambda r: r["total"])
        rows.append({"name": name, "reps": per, "best": best})
        print(f"# {name}: best total={best['total']}s "
              f"(construct={best['construct']} count={best['count']}) "
              f"all={[(r['construct'], r['count']) for r in per]}",
              file=sys.stderr)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
