"""Experiment (r16): vocabulary df via PARTITIONED WINDOW vs aggregate +
join-back for the remaining join-back consumers — ngram_duplication
(dedup_ngram_coverage, dedup_ngram_coverage_capped) and dup_spans /
cut_spans (dedup_dup_spans, dedup_cut_spans).

cross_doc_ngram_fraction, winnow shared_frac and cdc_chunks already use
the window form ("the join formulation re-runs the explode lineage a
second time for the probe side"); these four queries still pay the
aggregate + join-back. Guide §2.4 (remove shuffles outright) / §1.2
(the distributed algorithm first).

Protocol: r15/r16 alternating min-of-N, result-set equality asserted
before any timing, count() as the timed action (what bench.py times).

Usage: python tools/exp_vocab_window.py [--reps 4] [--sf-dir DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402


def _posh(docs, n):
    toks = docs.select(F.col("doc_id"), F.split(F.col("text"), " ").alias("t"))
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"if(size(t) >= {n}, "
                f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', slice(t, i + 1, {n}))), "
                "array())"
            )
        ).alias("pos", "shingle"),
    )




def dup_spans_join(docs, *, n=3, min_len=2, sort=True):
    """The PRE-r16 join-back dup_spans shape (kept here as the A/B
    baseline after the library moved to the window form)."""
    posh = _posh(docs, n)
    dup = (
        posh.select("doc_id", "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") > 1)
        .select("shingle")
    )
    marked = posh.join(dup, "shingle").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = marked.withColumn("grp", F.col("pos") - F.row_number().over(wd))
    out = (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            F.count(F.lit(1)).cast("int").alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select("doc_id", "span_start", "span_len")
    )
    return out.orderBy("doc_id", "span_start") if sort else out


def ngram_duplication_join(docs, *, n=3, max_shingle_df=None):
    """The PRE-r16 join-back ngram_duplication shape (A/B baseline)."""
    from aegisthus_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, n=n)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if max_shingle_df is not None:
        df_counts = df_counts.filter(F.col("df") <= max_shingle_df)
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .withColumn("dup_frac", F.round(F.col("n_dup") / F.col("n_shingles"), 6))
    )


def cut_spans_join(docs, *, n=3, min_len=2, drop_empty=True, sort_spans=True):
    """The PRE-r16 cut_spans (join-back dup_spans WITH its intermediate
    orderBy when ``sort_spans``; sort_spans=False isolates the
    sort-removal effect alone)."""
    spans = dup_spans_join(docs, n=n, min_len=min_len, sort=sort_spans)
    removed = (
        spans.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(span_start, span_start + span_len + {n - 2})")
            ).alias("widx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("widx").alias("removed"))
    )
    toks = docs.select(F.col("doc_id"), F.split(F.col("text"), " ").alias("t"))
    out = toks.join(removed, "doc_id", "left").select(
        "doc_id",
        F.expr(
            "concat_ws(' ', filter(t, (w, i) -> "
            "removed IS NULL OR NOT array_contains(removed, i)))"
        ).alias("clean_text"),
        F.when(F.col("removed").isNull(), F.lit(0))
        .otherwise(F.size("removed"))
        .cast("int")
        .alias("n_removed"),
    )
    if drop_empty:
        out = out.filter(F.col("clean_text") != "")
    return out.orderBy("doc_id")



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    from aegisthus_spark.operators import dedup as _dd
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_vocab_window", cpus=args.cpus)
    docs = _t(spark, args.sf_dir, "documents")
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()  # warm

    pairs = {
        # join-back baseline (pre-r16, inlined above) vs the adopted
        # library form — _dd.* IS the window form after adoption, so the
        # equality assertion also pins the library against the baseline
        "ngram_coverage": (
            lambda: ngram_duplication_join(docs, n=3).orderBy("doc_id"),
            lambda: _dd.ngram_duplication(docs, n=3).orderBy("doc_id"),
        ),
        "ngram_coverage_capped": (
            lambda: ngram_duplication_join(docs, n=3, max_shingle_df=4).orderBy("doc_id"),
            lambda: _dd.ngram_duplication(docs, n=3, max_shingle_df=4).orderBy("doc_id"),
        ),
        "dup_spans": (
            lambda: dup_spans_join(docs, n=3, min_len=2),
            lambda: _dd.dup_spans(docs, n=3, min_len=2),
        ),
        "cut_spans": (
            lambda: cut_spans_join(docs, n=3, min_len=2, drop_empty=True),
            lambda: _dd.cut_spans(docs, n=3, min_len=2, drop_empty=True),
        ),
        "cut_spans_nosort_only": (
            lambda: cut_spans_join(docs, n=3, min_len=2, drop_empty=True),
            lambda: cut_spans_join(docs, n=3, min_len=2, drop_empty=True,
                                   sort_spans=False),
        ),
    }

    # result equality first: the window form must be value-identical
    if not args.skip_equality:
        for name, (cur, win) in pairs.items():
            a = [tuple(r) for r in cur().collect()]
            b = [tuple(r) for r in win().collect()]
            assert a == b, f"{name}: MISMATCH {len(a)} vs {len(b)} rows"
            print(f"# {name}: equality OK ({len(a)} rows)", flush=True)

    def timed(df_fn):
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        t0 = time.perf_counter()
        df_fn().count()
        return time.perf_counter() - t0

    results = {}
    for name, (cur, win) in pairs.items():
        ts_cur, ts_win = [], []
        for rep in range(args.reps):  # alternating A/B
            ts_cur.append(timed(cur))
            ts_win.append(timed(win))
        results[name] = (min(ts_cur), min(ts_win), ts_cur, ts_win)
        print(f"# {name}: join-back min {min(ts_cur):.3f}s {['%.2f' % t for t in ts_cur]} | "
              f"window min {min(ts_win):.3f}s {['%.2f' % t for t in ts_win]}", flush=True)

    print("\n== summary ==")
    for name, (mc, mw, _, _) in results.items():
        print(f"{name}: {mc:.3f} -> {mw:.3f} s ({mc / mw:.2f}x)")


if __name__ == "__main__":
    main()
