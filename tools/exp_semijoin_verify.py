"""R16 experiment: candidate-doc semi-join ahead of the containment
verify join (guide §3.2 — the broadcast-semi-join form of the Bloom
pre-filter), A/B'd on the registered shapes at the current core count.

Shapes (both produce identical results — CI-checked here too):
  status — the registered _pair_overlap / _containment_scored join
  semi   — _pair_overlap(candidate_semi=True): pairs localCheckpointed
           once, candidate doc ids broadcast-semi-joined onto the
           shingle table ahead of the sa/sb joins and the size aggregate

Alternating min-of-N (A B A B ...) per the r15 box-noise protocol.

Usage:
  SPARK_GRAFT_CPUS=8 python tools/exp_semijoin_verify.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timed_counts(spark, builders, reps):
    """Alternating min-of-N over {label: build_fn}; returns {label: (best, rows)}."""
    best: dict = {}
    rows: dict = {}
    for rep in range(reps):
        for label, build in builders.items():
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            t0 = time.perf_counter()
            df = build()
            n = df.count()
            dt = time.perf_counter() - t0
            best[label] = min(best.get(label, dt), dt)
            rows[label] = n
            print(f"  rep{rep} {label}: {dt:.3f}s ({n} rows)", flush=True)
    return {k: (best[k], rows[k]) for k in best}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from aegisthus_spark.operators import dedup as dd
    from aegisthus_spark.operators.text import winnow_fingerprints
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_semijoin")
    print(f"cores: {spark.sparkContext.defaultParallelism}")
    docs = _t(spark, args.sf_dir, "documents")
    docs.count()  # warm footers

    def winnow(candidate_semi):
        def build():
            fp = winnow_fingerprints(docs, k=3, w=4, id_col="doc_id")
            fa = fp.select(F.col("doc_id").alias("a"), "fp")
            fb = fp.select(F.col("doc_id").alias("b"), "fp")
            cand = (fa.join(fb, "fp").filter(F.col("a") < F.col("b"))
                    .select("a", "b").distinct())
            sh = dd.word_shingles(docs, n=3, id_col="doc_id")
            return dd._containment_scored(
                sh, cand, id_col="doc_id", threshold=0.5,
                candidate_semi=candidate_semi)
        return build

    def lsh_containment(candidate_semi):
        def build():
            sh, cand = dd._lsh_shingles_and_candidates(
                docs, n=3, id_col="doc_id", persist_shingles=False)
            return dd._containment_scored(
                sh, cand, id_col="doc_id", threshold=0.5,
                candidate_semi=candidate_semi)
        return build

    # result identity first (cheap, also warms JIT)
    for name, mk in (("winnow", winnow), ("lsh_containment", lsh_containment)):
        a = {tuple(r) for r in mk(False)().collect()}
        b = {tuple(r) for r in mk(True)().collect()}
        assert a == b, f"{name}: semi shape changed the result!"
        print(f"{name}: results identical ({len(a)} rows)")

    print("== winnow_containment verify ==")
    r = timed_counts(spark, {"status": winnow(False), "semi": winnow(True)},
                     args.reps)
    print(f"winnow: status {r['status'][0]:.3f}s vs semi {r['semi'][0]:.3f}s")

    print("== containment_of_pairs (LSH) verify ==")
    r = timed_counts(
        spark,
        {"status": lsh_containment(False), "semi": lsh_containment(True)},
        args.reps,
    )
    print(f"lsh: status {r['status'][0]:.3f}s vs semi {r['semi'][0]:.3f}s")


if __name__ == "__main__":
    main()
