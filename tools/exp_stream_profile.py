"""R16: profile the availableNow streaming drains' fixed costs (VERDICT #4).

Per query: micro-batch progress (durationMs breakdown: addBatch /
getBatch / latestOffset / queryPlanning / commitOffsets / walCommit,
state-operator commit times), and for aeg_incremental_snapshot a stage
decomposition of the CONSTRUCT path (decode-collect, batch writes,
stream drain, read-back).

Usage: python tools/exp_stream_profile.py [--sf-dir D]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def drain_profile(spark, label, start_fn, reps=3):
    best = None
    for rep in range(reps):
        t0 = time.perf_counter()
        q = start_fn()
        q.awaitTermination(300)
        dt = time.perf_counter() - t0
        prog = [json.loads(p.json if hasattr(p, 'json') else p) for p in q.recentProgress]
        if best is None or dt < best[0]:
            best = (dt, prog)
        print(f"  {label} rep{rep}: {dt:.3f}s, {len(prog)} batches", flush=True)
    dt, prog = best
    print(f"{label}: best {dt:.3f}s")
    for p in prog:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        commit = sum(s.get("commitTimeMs", 0) for s in so)
        print(
            f"  batch {p.get('batchId')}: rows={p.get('numInputRows')} "
            f"addBatch={d.get('addBatch')} getBatch={d.get('getBatch')} "
            f"latestOffset={d.get('latestOffset')} planning={d.get('queryPlanning')} "
            f"commitOffsets={d.get('commitOffsets')} walCommit={d.get('walCommit')} "
            f"triggerExecution={d.get('triggerExecution')} stateCommit={commit}"
        )
    accounted = sum(
        p.get("durationMs", {}).get("triggerExecution", 0) for p in prog
    )
    print(f"  sum(triggerExecution)={accounted}ms of {dt*1000:.0f}ms wall "
          f"-> {dt*1000 - accounted:.0f}ms outside batch execution")
    return dt


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from aegisthus_spark.queries import _SST_TESTDATA, _scratch_dir, _stream_shuffle
    from aegisthus_spark.session import get_spark
    from aegisthus_spark.streaming.events import (
        read_events_stream,
        stream_latest_per_user,
    )

    spark = get_spark("exp_stream")
    print(f"cores: {spark.sparkContext.defaultParallelism}")
    ev_path = f"{args.sf_dir}/events.parquet"
    spark.read.parquet(ev_path).count()  # warm

    # --- ev_stream_latest ---
    import uuid

    def start_latest():
        ev = read_events_stream(spark, ev_path)
        qname = f"prof_latest_{uuid.uuid4().hex[:8]}"
        with _stream_shuffle(spark, input_path=ev_path, floor=8):
            return (
                stream_latest_per_user(ev)
                .writeStream.format("memory").queryName(qname)
                .outputMode("update").trigger(availableNow=True).start()
            )

    drain_profile(spark, "ev_stream_latest drain", start_latest)

    # --- aeg_incremental_snapshot: construct decomposition ---
    from aegisthus_spark.sources import read_sstable_cells
    from aegisthus_spark.streaming.incremental import (
        read_snapshot,
        start_incremental_snapshot,
        strip_range_tombstones,
    )
    from aegisthus_spark.output import to_aeg_json

    for rep in range(3):
        t0 = time.perf_counter()
        cells = read_sstable_cells(
            spark, [f"{_SST_TESTDATA}/2.0.10/randomtable/input"]
        )
        files = sorted(
            r.source_path for r in cells.select("source_path").distinct().collect()
        )
        t1 = time.perf_counter()
        half = files[len(files) // 2]
        root = _scratch_dir("prof_incremental")
        cells_dir = f"{root}/cells"
        cells.filter(F.col("source_path") < half).coalesce(1).write.parquet(
            f"{cells_dir}/batch0.parquet")
        cells.filter(F.col("source_path") >= half).coalesce(1).write.parquet(
            f"{cells_dir}/batch1.parquet")
        t2 = time.perf_counter()
        q = start_incremental_snapshot(
            spark, cells_dir, f"{root}/snapshot", f"{root}/ckpt",
            max_files_per_trigger=1, available_now=True,
        )
        q.awaitTermination(300)
        t3 = time.perf_counter()
        final = strip_range_tombstones(read_snapshot(spark, f"{root}/snapshot"))
        n = to_aeg_json(final).count()
        t4 = time.perf_counter()
        print(
            f"incremental rep{rep}: collect={t1-t0:.3f}s writes={t2-t1:.3f}s "
            f"drain={t3-t2:.3f}s readback={t4-t3:.3f}s total={t4-t0:.3f}s ({n} rows)"
        )
        prog = [json.loads(p.json if hasattr(p, 'json') else p) for p in q.recentProgress]
        for p in prog:
            d = p.get("durationMs", {})
            print(f"    batch {p.get('batchId')}: addBatch={d.get('addBatch')} "
                  f"trigger={d.get('triggerExecution')}")


if __name__ == "__main__":
    main()
