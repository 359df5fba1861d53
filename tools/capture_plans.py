"""Capture .explain("formatted") output for registered queries.

Usage:
    python tools/capture_plans.py --out plans/r15 --suffix _before [names...]

With no names, captures every registered query. Each query's plan is
written to ``<out>/<name><suffix>.txt``. Construction of the DataFrame may
run driver-side actions (seed collects, Lloyd refinement) exactly as the
bench does; the plan captured is the one of the RETURNED DataFrame — the
thing bench.py counts.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from aegisthus_spark.queries import REGISTRY
    from aegisthus_spark.session import get_spark

    names = args.names or list(REGISTRY)
    missing = [n for n in names if n not in REGISTRY]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = REGISTRY[name].fn(spark, args.sf_dir)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_formatted(df))
        print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
