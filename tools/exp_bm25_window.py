"""Experiment (r16): BM25/TF-IDF document-frequency and doc-length via
windows/derived aggregates over the POSTINGS (tf) table, vs the current
shape that re-derives the tokenize+explode lineage for the df join-back,
the dl aggregate and the stats row (text_bm25_topk's initial plan: 4
parquet scans + 4 Generates of the same corpus).

Proposed shape (exact same arithmetic — dl = sum(tf) over the doc is the
token count as a bigint, df identical, stats the same avg/count on the
same dl values):
  toks -> tf (groupBy doc,term)                     [one agg exchange]
  df   -> count window PARTITION BY term over tf    [replaces agg + SMJ]
  dl   -> tf.groupBy(doc).sum(tf), broadcast join   [derives from tf, not
                                                     a fresh toks explode;
                                                     AQE stage reuse can
                                                     dedupe the tf map]
  stats-> 1-row agg over that dl table (as today)

Protocol: result-set equality asserted, then alternating min-of-N with
count() as the timed action (what bench.py times).

Usage: python tools/exp_bm25_window.py [--reps 4] [--sf-dir DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402


def _bm25_term_scores_window(docs, *, k1=1.2, b=0.75, terms=None):
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # per-doc length derived from the postings table (sum of tf == token
    # count, exact in bigint), not from a second toks explode
    dl_tbl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats_tbl = dl_tbl.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("_avgdl"),
    )
    if terms is not None:
        tf = tf.filter(F.col("term").isin(list(terms)))
    # document frequency via a term-partitioned count window on the
    # postings — no join-back, no second corpus evaluation
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    idf = F.log(
        (F.col("_n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    return (
        tf.join(F.broadcast(dl_tbl), "doc_id")
        .join(F.broadcast(stats_tbl))
        .select(
            "doc_id",
            "term",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("s"),
        )
    )


def bm25_top_terms_window(docs, *, k=3, k1=1.2, b=0.75):
    scored = _bm25_term_scores_window(docs, k1=k1, b=b).select(
        "doc_id", "term", F.round(F.col("s"), 6).alias("bm25")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "bm25", "rn")
        .orderBy("doc_id", "rn")
    )


def bm25_query_scores_window(docs, terms, *, k1=1.2, b=0.75):
    return (
        _bm25_term_scores_window(docs, k1=k1, b=b, terms=terms)
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("s").cast("decimal(27,15)")).cast("double"), 6).alias("score"))
    )


def tfidf_top_terms_window(docs, *, k=3):
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_tbl = docs.agg(F.countDistinct("doc_id").cast("double").alias("_n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(n_tbl))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    from aegisthus_spark.operators import text as _tx
    from aegisthus_spark.queries import _t
    from aegisthus_spark.session import get_spark

    spark = get_spark("exp_bm25_window", cpus=args.cpus)
    docs = _t(spark, args.sf_dir, "documents")
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()  # warm

    qterms = ["table", "join", "spark"]
    pairs = {
        "bm25_topk": (
            lambda: _tx.bm25_top_terms(docs, k=3),
            lambda: bm25_top_terms_window(docs, k=3),
        ),
        "bm25_query_scores": (
            lambda: _tx.bm25_query_scores(docs, qterms).orderBy("doc_id"),
            lambda: bm25_query_scores_window(docs, qterms).orderBy("doc_id"),
        ),
        "tfidf_topk": (
            lambda: _tx.tfidf_top_terms(docs, k=3),
            lambda: tfidf_top_terms_window(docs, k=3),
        ),
    }

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
        for _ in range(args.reps):
            ts_cur.append(timed(cur))
            ts_win.append(timed(win))
        results[name] = (min(ts_cur), min(ts_win))
        print(f"# {name}: current min {min(ts_cur):.3f}s {['%.2f' % t for t in ts_cur]} | "
              f"window min {min(ts_win):.3f}s {['%.2f' % t for t in ts_win]}", flush=True)

    print("\n== summary ==")
    for name, (mc, mw) in results.items():
        print(f"{name}: {mc:.3f} -> {mw:.3f} s ({mc / mw:.2f}x)")


if __name__ == "__main__":
    main()
