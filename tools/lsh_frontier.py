"""sim_cosine_lsh recall frontier exploration (r14 verdict, Next #7).

The registered config (1 table, 6 planes, Hamming<=2 multiprobe) measures
0.74 mean / 0.2 min recall@10 at sf1 — the weakest honest ANN row. The
annotation claims per-query variance is inherent to single-table sign-bit
LSH; this tool puts DATA behind that claim by measuring the whole nearby
frontier in numpy (bit-exact same buckets as the Spark operator: same
seeded float32 hyperplanes, same sign rule) before paying for a Spark
wall measurement of any point:

- more planes at the same radius (finer buckets, fewer candidates)
- the multi-table OR-construction (classic variance fix: L independent
  plane sets, candidate = union of per-table probes)

For each config: recall@10 mean/min over the SAME stride-40 query sample
tools/ann_recall.py uses, plus the mean candidate fraction (the scan-cost
proxy: LSH wall ~ candidates exact-ranked). A config dominates the
registered one if it raises the min without raising the fraction.

Usage: python tools/lsh_frontier.py [sf_dir=testdata_sf1]
"""

from __future__ import annotations

import itertools
import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from aegisthus_spark.operators.similarity import hyperplanes  # noqa: E402


def buckets(V: np.ndarray, planes: list[list[float]]) -> np.ndarray:
    """Bucket ids for all vectors — float64 dot like _dot_float (numpy sum
    order differs from the strict left fold, but Gaussian plane dots sit
    far from 0, so signs agree; ann_recall.py's Spark-vs-exact agreement
    already validates this)."""
    P = np.asarray(planes, dtype=np.float64)  # (H, dim)
    signs = (V @ P.T) > 0  # (n, H)
    return (signs * (1 << np.arange(P.shape[0]))).sum(axis=1)


def probe_masks(n_planes: int, radius: int) -> list[int]:
    flips = [0]
    if radius >= 1:
        flips += [1 << j for j in range(n_planes)]
    if radius >= 2:
        flips += [(1 << i) | (1 << j)
                  for i, j in itertools.combinations(range(n_planes), 2)]
    return flips


def measure(V: np.ndarray, ids: np.ndarray, qpos: list[int],
            tables: list[tuple[int, int, int]], k: int = 10) -> dict:
    """tables: [(n_planes, seed, radius), ...] — candidates = OR over tables."""
    n, dim = V.shape
    Nrm = V / np.linalg.norm(V, axis=1, keepdims=True)
    cosM = np.round(Nrm[qpos] @ Nrm.T, 6)

    per_table = []
    for n_planes, seed, radius in tables:
        planes = hyperplanes(dim, n_planes, seed)
        b = buckets(V, planes)
        per_table.append((b, probe_masks(n_planes, radius)))

    recalls, fracs = [], []
    for rowi, qi in enumerate(qpos):
        cand = np.zeros(n, dtype=bool)
        for b, masks in per_table:
            qb = b[qi]
            cand |= np.isin(b, [qb ^ m for m in masks])
        cand[qi] = False
        fracs.append(cand.sum() / n)
        # exact top-k (excluding self), same tie rule as ann_recall.py
        order = np.lexsort((ids, -cosM[rowi]))
        exact = [int(ids[j]) for j in order if j != qi][:k]
        # rank within candidates
        cidx = np.nonzero(cand)[0]
        corder = cidx[np.lexsort((ids[cidx], -cosM[rowi][cidx]))][:k]
        got = {int(ids[j]) for j in corder}
        recalls.append(len(got & set(exact)) / k)
    return {
        "recall_mean": round(float(np.mean(recalls)), 3),
        "recall_min": round(float(np.min(recalls)), 3),
        "cand_frac_mean": round(float(np.mean(fracs)), 4),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "testdata_sf1")
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_numpy())
    V = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    n = len(ids)
    step = max(n // 40, 1)
    qpos = [int(i) for i in range(0, n, step)][:40]
    print(f"{sf_dir}: {n} vectors, {len(qpos)} queries")

    # seeds for extra tables follow seed + 7919*t (deterministic, distinct)
    def multi(L, H, r):
        return [(H, 1234 + 7919 * t, r) for t in range(L)]

    configs = {
        "1x6p_r2 (registered)": multi(1, 6, 2),
        "1x8p_r2": multi(1, 8, 2),
        "1x10p_r2": multi(1, 10, 2),
        "2x6p_r2": multi(2, 6, 2),
        "2x8p_r1": multi(2, 8, 1),
        "2x8p_r2": multi(2, 8, 2),
        "3x8p_r1": multi(3, 8, 1),
        "4x8p_r1": multi(4, 8, 1),
        "2x10p_r2": multi(2, 10, 2),
        "3x10p_r2": multi(3, 10, 2),
        "4x10p_r1": multi(4, 10, 1),
        "2x7p_r2": multi(2, 7, 2),
        "3x7p_r2": multi(3, 7, 2),
        "3x8p_r2": multi(3, 8, 2),
        "4x8p_r2": multi(4, 8, 2),
        "4x10p_r2": multi(4, 10, 2),
    }
    out = {}
    for name, tables in configs.items():
        out[name] = measure(V, ids, qpos, tables)
        print(f"{name:24s} mean {out[name]['recall_mean']:.3f} "
              f"min {out[name]['recall_min']:.3f} "
              f"frac {out[name]['cand_frac_mean']:.3f}")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
