"""Local stand-in for the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle on the same parquet dir, compare
row-count, column names, and (order-insensitively) values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    import datetime

    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex()
                if isinstance(v, (bytes, bytearray))
                else (
                    v.strftime("%Y-%m-%d %H:%M:%S.%f")
                    if isinstance(v, (datetime.datetime, pd.Timestamp))
                    else (v.strftime("%Y-%m-%d") if isinstance(v, datetime.date) else (tuple(v) if isinstance(v, (list, tuple)) else v))
                )
            )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    s, o = norm(sdf), norm(odf)
    n = min(len(s), len(o))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not values_equal(s[c].iloc[i], o[c].iloc[i]):
                if bad < 3:
                    problems.append(f"row {i} col {c}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}")
                bad += 1
    if bad:
        problems.append(f"{bad} value mismatches total")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from aegisthus_spark.queries import REGISTRY
    from aegisthus_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if q.sql is None:
            print(f"SKIP {name}: no oracle (rows-only check: {len(sdf)} rows)")
            continue
        try:
            odf = con.execute(q.sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
