"""R15 experiment: containment-verify shapes A/B (winnow + seeded).

Shapes:
  status   — the registered _containment_scored join shape
  arrays   — per-doc shingle ARRAYS + array_intersect per candidate pair
             (no per-shingle pair explode, sizes ride the same rows)

Stage decomposition (noop sink) for the status-quo pipeline is printed
first so the A/B targets the measured bottleneck, not a guess.

Usage: python tools/exp_verify_shapes.py [--sf-dir D] [--reps 3] [--stages]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, build, reps):
    best = None
    for _ in range(reps):
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        t0 = time.perf_counter()
        df = build()
        n = df.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.3f}s ({n} rows, min of {reps})")
    return best


def winnow_arrays(docs, *, k=3, w=4, n=3, threshold=0.5, id_col="doc_id"):
    """winnow_containment with the ARRAY verify."""
    from aegisthus_spark.operators import dedup as _dd
    from aegisthus_spark.operators.text import winnow_fingerprints

    fp = winnow_fingerprints(docs, k=k, w=w, id_col=id_col)
    fa = fp.select(F.col(id_col).alias("a"), "fp")
    fb = fp.select(F.col(id_col).alias("b"), "fp")
    cand = fa.join(fb, "fp").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    sh = _dd.word_shingles(docs, n=n, id_col=id_col)
    docsets = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("arr"))
    da = docsets.select(F.col(id_col).alias("a"), F.col("arr").alias("arr_a"))
    db = docsets.select(F.col(id_col).alias("b"), F.col("arr").alias("arr_b"))
    scored = (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("common"),
            F.size("arr_a").alias("na"),
            F.size("arr_b").alias("nb"),
        )
        .select(
            "a",
            "b",
            F.round(F.col("common").cast("double") / F.col("na"), 6).alias("containment_a"),
            F.round(F.col("common").cast("double") / F.col("nb"), 6).alias("containment_b"),
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.filter(
        (F.col("containment_a") >= threshold) | (F.col("containment_b") >= threshold)
    ).orderBy("a", "b")


def seeded_arrays(docs, *, n=3, threshold=0.5, seeds_per_doc=4, max_seed_df=64,
                  id_col="doc_id"):
    """containment_short_side with the ARRAY verify for the common count."""
    from pyspark.sql import Window

    from aegisthus_spark.operators import dedup as _dd

    sh = _dd.word_shingles(docs, n=n, id_col=id_col)
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sized = sh.join(dfc, "shingle")
    w = Window.partitionBy(id_col).orderBy("df", "shingle")
    seeds = (
        sized.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") <= seeds_per_doc) & (F.col("df") <= max_seed_df))
        .select(F.col(id_col).alias("a"), F.col("shingle").alias("s"))
    )
    others = sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s"))
    cand = (
        seeds.join(others, "s")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    docsets = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("arr"))
    da = docsets.select(F.col(id_col).alias("a"), F.col("arr").alias("arr_a"))
    db = docsets.select(F.col(id_col).alias("b"), F.col("arr").alias("arr_b"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("arr_a", "arr_b")).cast("double")
                / F.size("arr_a"),
                6,
            ).alias("containment_a"),
        )
        .filter(F.col("containment_a") >= threshold)
        .orderBy("a", "b")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    from aegisthus_spark.operators import dedup as _dd
    from aegisthus_spark.operators.text import winnow_fingerprints
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_verify_shapes")
    docs = _t(spark, args.sf_dir, "documents")
    docs.count()  # warm footers

    if args.stages:
        # stage decomposition of the status-quo winnow pipeline (noop sink)
        fp = winnow_fingerprints(docs, k=3, w=4)
        fa = fp.select(F.col("doc_id").alias("a"), "fp")
        fb = fp.select(F.col("doc_id").alias("b"), "fp")
        cand = fa.join(fb, "fp").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
        sh = _dd.word_shingles(docs, n=3)
        sa = sh.select(F.col("doc_id").alias("a"), F.col("shingle").alias("s"))
        sb = sh.select(F.col("doc_id").alias("b"), F.col("shingle").alias("s"))
        inter = cand.join(sa, "a").join(sb, ["b", "s"])
        common = inter.groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
        for label, df in (
            ("fp-only", fp),
            ("cand", cand),
            ("sh", sh),
            ("cand+sa", cand.join(sa, "a")),
            ("inter(33M)", inter),
            ("common", common),
            ("full verify", _dd.winnow_containment(docs, k=3, w=4, n=3, threshold=0.5)),
        ):
            best = None
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                noop(df)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"stage {label}: {best:.3f}s")
        return

    # A/B: registered shape vs array verify; results must be IDENTICAL
    a = timeit(spark, "winnow status", lambda: _dd.winnow_containment(
        docs, k=3, w=4, n=3, threshold=0.5), args.reps)
    b = timeit(spark, "winnow arrays", lambda: winnow_arrays(docs), args.reps)
    ra = _dd.winnow_containment(docs, k=3, w=4, n=3, threshold=0.5).toPandas()
    rb = winnow_arrays(docs).toPandas()
    same = ra.equals(rb)
    print(f"winnow results identical: {same} ({len(ra)} rows)")

    c = timeit(spark, "seeded status", lambda: _dd.containment_short_side(
        docs, n=3, threshold=0.5), args.reps)
    d = timeit(spark, "seeded arrays", lambda: seeded_arrays(docs), args.reps)
    rc = _dd.containment_short_side(docs, n=3, threshold=0.5).toPandas()
    rd = seeded_arrays(docs).toPandas()
    print(f"seeded results identical: {rc.equals(rd)} ({len(rc)} rows)")


def _dispatch():
    if len(sys.argv) > 1 and sys.argv[1] == "--v2":
        main2()
    else:
        main()


def winnow_winsizes(docs, *, k=3, w=4, n=3, threshold=0.5, id_col="doc_id"):
    """winnow_containment with window-attached sizes: na/nb ride the
    shingle rows (one window count per side) so the two size-aggregate
    subtrees and their joins vanish."""
    from pyspark.sql import Window

    from aegisthus_spark.operators import dedup as _dd
    from aegisthus_spark.operators.text import winnow_fingerprints

    fp = winnow_fingerprints(docs, k=k, w=w, id_col=id_col)
    fa = fp.select(F.col(id_col).alias("a"), "fp")
    fb = fp.select(F.col(id_col).alias("b"), "fp")
    cand = fa.join(fb, "fp").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    sh = _dd.word_shingles(docs, n=n, id_col=id_col)
    sh2 = sh.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    sa = sh2.select(F.col(id_col).alias("a"), F.col("shingle").alias("s"),
                    F.col("n").alias("na"))
    sb = sh2.select(F.col(id_col).alias("b"), F.col("shingle").alias("s"),
                    F.col("n").alias("nb"))
    scored = (
        cand.join(sa, "a").join(sb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"),
             F.min("na").alias("na"), F.min("nb").alias("nb"))
        .select(
            "a", "b",
            F.round(F.col("common").cast("double") / F.col("na"), 6).alias("containment_a"),
            F.round(F.col("common").cast("double") / F.col("nb"), 6).alias("containment_b"),
            F.round(F.col("common").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("common")), 6).alias("jaccard"),
        )
    )
    return scored.filter(
        (F.col("containment_a") >= threshold) | (F.col("containment_b") >= threshold)
    ).orderBy("a", "b")


def seeded_winsizes(docs, *, n=3, threshold=0.5, seeds_per_doc=4, max_seed_df=64,
                    id_col="doc_id"):
    """containment_short_side with window df (no join-back) and
    window-attached na."""
    from pyspark.sql import Window

    from aegisthus_spark.operators import dedup as _dd

    sh = _dd.word_shingles(docs, n=n, id_col=id_col)
    sized = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
    w = Window.partitionBy(id_col).orderBy("df", "shingle")
    seeds = (
        sized.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") <= seeds_per_doc) & (F.col("df") <= max_seed_df))
        .select(F.col(id_col).alias("a"), F.col("shingle").alias("s"))
    )
    others = sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s"))
    cand = (
        seeds.join(others, "s")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sh2 = sh.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    sa = sh2.select(F.col(id_col).alias("a"), F.col("shingle").alias("s"),
                    F.col("n").alias("na"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("s"))
    return (
        cand.join(sa, "a").join(sb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"), F.min("na").alias("na"))
        .select("a", "b",
                F.round(F.col("common").cast("double") / F.col("na"), 6)
                .alias("containment_a"))
        .filter(F.col("containment_a") >= threshold)
        .orderBy("a", "b")
    )


def main2():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args, _ = ap.parse_known_args(sys.argv[2:])

    from aegisthus_spark.operators import dedup as _dd
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_verify_shapes2")
    docs = _t(spark, args.sf_dir, "documents")
    docs.count()

    a = timeit(spark, "winnow status", lambda: _dd.winnow_containment(
        docs, k=3, w=4, n=3, threshold=0.5), args.reps)
    b = timeit(spark, "winnow winsizes", lambda: winnow_winsizes(docs), args.reps)
    ra = _dd.winnow_containment(docs, k=3, w=4, n=3, threshold=0.5).toPandas()
    rb = winnow_winsizes(docs).toPandas()
    print(f"winnow results identical: {ra.equals(rb)} ({len(ra)} rows)")

    c = timeit(spark, "seeded status", lambda: _dd.containment_short_side(
        docs, n=3, threshold=0.5), args.reps)
    d = timeit(spark, "seeded winsizes", lambda: seeded_winsizes(docs), args.reps)
    rc = _dd.containment_short_side(docs, n=3, threshold=0.5).toPandas()
    rd = seeded_winsizes(docs).toPandas()
    print(f"seeded results identical: {rc.equals(rd)} ({len(rc)} rows)")


if __name__ == "__main__":
    _dispatch()
