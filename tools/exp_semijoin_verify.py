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


if __name__ == "__main__" and not (
    os.environ.get("EXP_NOCKPT") or os.environ.get("EXP_WINNOW_STAGES")
):
    main()


def _pair_overlap_semi_nockpt(shingles, pairs, *, id_col="doc_id"):
    """semi variant WITHOUT the pairs localCheckpoint (Catalyst exchange
    reuse dedupes the candidate pipeline instead of a barrier)."""
    cdocs = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sh = shingles.join(F.broadcast(cdocs), id_col, "semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col(id_col).alias("a"), F.col("shingle").alias("s"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s"))
    common = (
        pairs.join(sa, "a").join(sb, ["b", "s"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return common.join(na, "a").join(nb, "b")


def main_nockpt() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    from aegisthus_spark.operators import dedup as dd
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_semijoin2")
    print(f"cores: {spark.sparkContext.defaultParallelism}")
    docs = _t(spark, args.sf_dir, "documents")
    docs.count()

    def scored_from(po):
        sh, cand = dd._lsh_shingles_and_candidates(
            docs, n=3, id_col="doc_id", persist_shingles=False)
        t = 0.5
        s = po(sh, cand, id_col="doc_id").select(
            "a", "b",
            F.round(F.col("common").cast("double") / F.col("na"), 6).alias("ca"),
            F.round(F.col("common").cast("double") / F.col("nb"), 6).alias("cb"),
        )
        return s.filter((F.col("ca") >= t) | (F.col("cb") >= t)).orderBy("a", "b")

    builders = {
        "status": lambda: scored_from(dd._pair_overlap),
        "semi_nockpt": lambda: scored_from(_pair_overlap_semi_nockpt),
    }
    a = {tuple(r) for r in builders["status"]().collect()}
    b = {tuple(r) for r in builders["semi_nockpt"]().collect()}
    assert a == b, "nockpt changed the result!"
    print(f"results identical ({len(a)} rows)")
    r = timed_counts(spark, builders, args.reps)
    print(f"lsh: status {r['status'][0]:.3f}s vs semi_nockpt {r['semi_nockpt'][0]:.3f}s")


if __name__ == "__main__" and os.environ.get("EXP_NOCKPT"):
    main_nockpt()


def main_winnow_stages() -> None:
    """Stage decomposition of winnow_containment + fp-once variants."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    from aegisthus_spark.operators import dedup as dd
    from aegisthus_spark.operators.text import winnow_fingerprints
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_winnow")
    print(f"cores: {spark.sparkContext.defaultParallelism}")
    docs = _t(spark, args.sf_dir, "documents")
    docs.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def fp():
        return winnow_fingerprints(docs, k=3, w=4, id_col="doc_id")

    def cand_from(fpdf):
        fa = fpdf.select(F.col("doc_id").alias("a"), "fp")
        fb = fpdf.select(F.col("doc_id").alias("b"), "fp")
        return (fa.join(fb, "fp").filter(F.col("a") < F.col("b"))
                .select("a", "b").distinct())

    # stage timings (noop sink, min-of-reps)
    stages = {
        "fp_only": lambda: fp(),
        "cand(join)": lambda: cand_from(fp()),
        "sh_only": lambda: dd.word_shingles(docs, n=3, id_col="doc_id"),
        "full_status": lambda: dd._containment_scored(
            dd.word_shingles(docs, n=3, id_col="doc_id"), cand_from(fp()),
            id_col="doc_id", threshold=0.5),
        "full_fp_ckpt": lambda: dd._containment_scored(
            dd.word_shingles(docs, n=3, id_col="doc_id"),
            cand_from(fp().localCheckpoint()),
            id_col="doc_id", threshold=0.5),
    }
    best = {}
    for rep in range(args.reps):
        for label, build in stages.items():
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            t0 = time.perf_counter()
            noop(build())
            dt = time.perf_counter() - t0
            best[label] = min(best.get(label, dt), dt)
            print(f"  rep{rep} {label}: {dt:.3f}s", flush=True)
    for label, dt in best.items():
        print(f"{label}: {dt:.3f}s")
    # result identity for the ckpt variant
    a = {tuple(r) for r in stages["full_status"]().collect()}
    b = {tuple(r) for r in stages["full_fp_ckpt"]().collect()}
    assert a == b, "fp_ckpt changed the result!"
    print(f"results identical ({len(a)} rows)")


if __name__ == "__main__" and os.environ.get("EXP_WINNOW_STAGES"):
    main_winnow_stages()
