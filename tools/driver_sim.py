"""Driver-style correctness simulation: a bare SparkSession (only
__spark_entry__._configure applied, NTZ inference left at the environment
default beforehand), each query vs its DuckDB oracle at a given sf —
replicating the per-round CORRECTNESS gate so red rows are caught locally.

Usage: python tools/driver_sim.py [sf_dir] [query ...] [--json] [--out FILE]
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(spark_df, oracle_df, name):
    sp = spark_df.toPandas()
    oc = oracle_df
    if len(sp) != len(oc):
        return f"{name}: ROWS {len(sp)} != {len(oc)}"
    sp_cols, oc_cols = sorted(sp.columns), sorted(oc.columns)
    if sp_cols != oc_cols:
        return f"{name}: SCHEMA {sp_cols} != {oc_cols}"
    sp = sp[sp_cols].sort_values(sp_cols).reset_index(drop=True)
    oc = oc[oc_cols].sort_values(oc_cols).reset_index(drop=True)
    for c in sp_cols:
        a, b = sp[c], oc[c]
        if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
            a = pd.to_datetime(a).dt.tz_localize(None)
            b = pd.to_datetime(b).dt.tz_localize(None)
        try:
            same = (a.fillna("\0") == b.fillna("\0")).all() if a.dtype == object else (
                (a.isna() == b.isna()).all() and (a.dropna().values == b.dropna().values).all()
            )
        except Exception as e:
            return f"{name}: COMPARE ERROR col {c}: {e}"
        if not same:
            bad = (a != b) & ~(a.isna() & b.isna())
            return f"{name}: VALUES differ col {c} ({int(bad.sum())} rows), e.g. {a[bad].head(2).tolist()} vs {b[bad].head(2).tolist()}"
    return None


TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    argv = sys.argv[1:]
    out_path = "DRIVER_SIM.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            sys.exit("--out requires a file path")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--json"]
    json_out = "--json" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode hosts every executor thread inside the driver JVM:
        # the 1g default OOMs building broadcasts at sf1 scale
        .config("spark.driver.memory",
                os.environ.get("AEGISTHUS_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    # bound the oracle's appetite: at sf1 under memory pressure DuckDB
    # spills to <cwd>/.tmp and once filled the entire disk (74 GB) before
    # the OS killed the box's other work. A capped spill dir turns a
    # pathological oracle plan into a clean per-query error instead.
    con.execute("SET temp_directory='/tmp/duckdb_driver_sim_spill'")
    con.execute(
        "SET max_temp_directory_size='"
        + os.environ.get("AEGISTHUS_DUCKDB_SPILL", "20GB") + "'"
    )
    con.execute(
        "SET memory_limit='" + os.environ.get("AEGISTHUS_DUCKDB_MEM", "24GB") + "'"
    )
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    from aegisthus_spark.queries import ORACLE_INFEASIBLE_OVER, TABLE_ID_COLS

    def sampled_check(name, table, cap, nrows):
        """Value-check an oracle-infeasible query on a deterministic
        id-modulus sample of its driving table (other tables symlinked):
        both engines read the SAME sampled corpus, so a deliberate fault
        in either query still turns the row red — without the O(n^2)
        oracle ever seeing the full corpus."""
        import tempfile

        m = (nrows + cap - 1) // cap
        idc = TABLE_ID_COLS[table]
        src = os.path.abspath(sf_dir)
        with tempfile.TemporaryDirectory(prefix="driver_sim_sample_") as td:
            for t in TABLES:
                if t == table:
                    con.execute(
                        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
                        f"WHERE {idc} % {m} = 0 ORDER BY {idc}) "
                        f"TO '{td}/{t}.parquet' (FORMAT parquet)"
                    )
                else:
                    os.symlink(f"{src}/{t}.parquet", f"{td}/{t}.parquet")
            scon = duckdb.connect()
            for t in TABLES:
                scon.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{td}/{t}.parquet')"
                )
            sdf = qs[name](spark, td)
            odf = scon.execute(oracles[name]).df()
            return compare(sdf, odf, name), m

    n_bad = 0
    results = {}
    for name in qs:
        if only and name not in only:
            continue
        try:
            # per-query isolation: drop blocks persisted by the previous
            # query (see bench.py — accumulation inflates a long session)
            spark.catalog.clearCache()
            inf = ORACLE_INFEASIBLE_OVER.get(name)
            if inf is not None and name in oracles:
                table, cap = inf
                nrows = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
                if nrows > cap:
                    msg, m = sampled_check(name, table, cap, nrows)
                    if msg is None:
                        print(f"{name}: OK (oracle infeasible at {nrows} rows; "
                              f"sampled 1/{m} oracle green)")
                        results[name] = f"expected_infeasible_sampled_pass(m={m})"
                    else:
                        n_bad += 1
                        print(msg)
                        results[name] = msg.split(":", 1)[1].strip()[:200]
                    continue
            sdf = qs[name](spark, sf_dir)
            if name not in oracles:
                print(f"{name}: NO_ORACLE ({sdf.count()} rows)")
                results[name] = "no_oracle"
                continue
            odf = con.execute(oracles[name]).df()
            msg = compare(sdf, odf, name)
        except Exception as e:
            msg = f"{name}: ERR {type(e).__name__}: {str(e)[:300]}"
        results[name] = "pass" if msg is None else msg.split(":", 1)[1].strip()[:200]
        if msg:
            n_bad += 1
            print(msg)
        else:
            print(f"{name}: OK")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    if json_out:
        import json

        from aegisthus_spark.queries import GATE_TAIL, GATE_WINDOW

        payload = {
            "sf_dir": sf_dir,
            "gate_window": GATE_WINDOW,
            "gate_tail": list(GATE_TAIL),
            "results": results,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out_path}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
