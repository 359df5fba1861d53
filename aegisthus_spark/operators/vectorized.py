"""Bit-exact vectorized (Arrow + NumPy) kernels for the embedding operators.

Guide §4.2 (the optimization playbook): let Spark do distribution,
shuffles and I/O; hand whole batches to vectorized native code instead of
evaluating interpreted higher-order-function folds row by row.  The HOF
formulation (``aggregate(zip_with(...))``) is a ``CodegenFallback``
expression — every element of every row pays an interpreted lambda
invocation with boxing, which measured as the dominant cost of the PQ /
k-means / k-NN queries (OPTIMIZATION_r15.md).  These kernels do the same
arithmetic as NumPy ufunc loops over whole Arrow batches.

DETERMINISM CONTRACT (the reason each kernel is written the way it is):
every kernel reproduces the JVM expression's IEEE-754 operation ORDER
bit-for-bit, so results are identical to the HOF fold and to the DuckDB
oracles:

- dot / squared-L2 accumulate dimension-by-dimension (``acc += t``) —
  the same strict left fold (0.0 seed) as ``_dot_float`` / ``_l2_float``.
  NumPy ufuncs are correctly-rounded IEEE-754 doubles with no FMA fusion
  and no reassociation, so a per-dimension loop IS the left fold,
  vectorized across rows instead of across dimensions.
- ``float`` columns are cast to ``double`` before any arithmetic,
  mirroring ``cast(x as double)`` in the SQL expressions.
- squares are non-negative, so the fold's ``0.0 + t0`` == ``t0`` (the
  ``-0.0`` corner cannot occur); for dots the kernels keep the explicit
  0.0 seed by starting from a zero accumulator.
- argmin ties break to the LOWEST centroid id: centroid matrices are
  built in ascending-id order and ``np.argmin`` returns the FIRST
  minimum — identical to ``array_min`` over ``struct(d, j)``.
- NO rounding and NO decimal arithmetic happens here: kernels emit raw
  doubles (dots, squared distances) and the JVM plan applies the same
  ``round(..., 6)`` / decimal casts it always did.

Plan shape: kernels appear as ``MapInArrow`` / ``FlatMapGroupsInPandas``
nodes (the same family as the SSTable decode source and the multimodal
operators) — never ``BatchEvalPython`` / ``ArrowEvalPython`` row-at-a-time
UDF nodes (CI-asserted in tests/test_plans.py).  Inputs are pre-projected
to only the columns the kernel touches (guide §4.1: an opaque function
over ``select("*")`` defeats column pruning).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _list_col_to_matrix(arr) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow ListArray/LargeListArray of
    floats — zero-copy flatten + reshape (uniform dims asserted)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("vectorized kernel: ragged embedding lengths")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    # float32 -> float64 BEFORE any arithmetic == cast(x as double)
    return flat.astype(np.float64, copy=False).reshape(-1, d)[
        : len(widths)
    ]


def _l2_matrix(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared-L2 distances, accumulated dimension-by-dimension —
    the strict left fold of ``_l2_float``, vectorized across rows and
    centroids. ``x``: (n, d) float64; ``cents``: (k, d) float64."""
    n, d = x.shape
    k = cents.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(d):
        t = x[:, i, None] - cents[None, :, i]
        acc += t * t
    return acc


def _dot_matrix(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) dot products with left-fold accumulation order."""
    n, d = x.shape
    k = cents.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(d):
        acc += x[:, i, None] * cents[None, :, i]
    return acc


def _self_dot(x: np.ndarray) -> np.ndarray:
    """(n,) self dot products (for norms), left-fold order."""
    acc = np.zeros(x.shape[0], dtype=np.float64)
    for i in range(x.shape[1]):
        acc += x[:, i] * x[:, i]
    return acc


def pq_encode_codes(
    emb: DataFrame,
    seeds: list[tuple[int, list[float]]],
    *,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): PQ encoding — identical semantics to the HOF
    formulation in ``similarity.pq_encode`` (per-subspace argmin of the
    left-fold squared L2 against the ascending-id codebook, ties to the
    lowest codeword id), vectorized per Arrow batch."""
    import pyarrow as pa

    dim = len(seeds[0][1])
    d = dim // m
    js = np.array([j for j, _ in seeds], dtype=np.int32)
    cb = np.array([vec for _, vec in seeds], dtype=np.float64)  # (k, dim)

    id_field = dict(zip(emb.columns, emb.schema.fields))[id_col]
    out_schema = f"{id_col} {id_field.dataType.simpleString()}, codes array<int>"

    def encode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            x = _list_col_to_matrix(
                batch.column(batch.schema.get_field_index(vec_col))
            )
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                dist = _l2_matrix(
                    x[:, s * d : (s + 1) * d], cb[:, s * d : (s + 1) * d]
                )
                # first minimum == lowest codeword id (ascending order)
                codes[:, s] = js[np.argmin(dist, axis=1)]
            codes_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), type=pa.int32()), m
            ).cast(pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays([ids, codes_arr], [id_col, "codes"])

    return emb.select(id_col, vec_col).mapInArrow(encode, out_schema)


def assign_cells(
    emb: DataFrame,
    cells: list[tuple[int, int, list[float]]],
    *,
    k_c: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 0,
    with_norm: bool = False,
) -> DataFrame:
    """(id, vec, cluster, d2 [, na] [, pcells]): nearest-centroid
    assignment — identical semantics to ``similarity._kmeans_assign_once``
    (flat argmin at ``k_c <= 1``, two-level route+fine search above, ties
    to the lowest centroid id), vectorized per Arrow batch.

    ``probes > 0`` additionally emits the ``probes`` nearest cells by
    FLAT rank over all centroids (``knn_join_ivf``'s probe list — a
    stable argsort, so equal distances rank by ascending centroid id,
    matching ``array_sort`` over ``struct(d, j)``).  ``with_norm`` emits
    the left-fold self-dot square root (the per-vector cosine norm).
    """
    import pyarrow as pa

    js = np.array([j for j, _, _ in cells], dtype=np.int32)
    cell_of = np.array([c for _, c, _ in cells], dtype=np.int32)
    cents = np.array([cent for _, _, cent in cells], dtype=np.float64)
    two_level = k_c > 1
    if two_level:
        rep_idx = np.arange(k_c)  # reps = the k_c lowest ids, in order
        # fine-search index per coarse cell, preserving ascending-id order
        fine_idx = {
            int(m): np.flatnonzero(cell_of == m) for m in np.unique(cell_of)
        }

    fields = dict(zip(emb.columns, (f.dataType.simpleString() for f in emb.schema.fields)))
    out_parts = [
        f"{id_col} {fields[id_col]}",
        f"{vec_col} {fields[vec_col]}",
        "cluster int",
        "d2 double",
    ]
    if with_norm:
        out_parts.append("nrm double")
    if probes:
        out_parts.append("pcells array<int>")
    out_schema = ", ".join(out_parts)

    def assign(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            vecs = batch.column(batch.schema.get_field_index(vec_col))
            x = _list_col_to_matrix(vecs)
            n = x.shape[0]
            if n == 0:
                cluster = np.empty(0, dtype=np.int32)
                d2 = np.empty(0, dtype=np.float64)
            elif not two_level:
                dist = _l2_matrix(x, cents)
                best = np.argmin(dist, axis=1)
                cluster = js[best]
                d2 = dist[np.arange(n), best]
            else:
                rdist = _l2_matrix(x, cents[rep_idx])
                routed = js[rep_idx][np.argmin(rdist, axis=1)]
                cluster = np.empty(n, dtype=np.int32)
                d2 = np.empty(n, dtype=np.float64)
                for mcell in np.unique(routed):
                    rows = np.flatnonzero(routed == mcell)
                    fi = fine_idx[int(mcell)]
                    fdist = _l2_matrix(x[rows], cents[fi])
                    fb = np.argmin(fdist, axis=1)
                    cluster[rows] = js[fi][fb]
                    d2[rows] = fdist[np.arange(len(rows)), fb]
            arrays = [
                ids,
                vecs,
                pa.array(cluster, type=pa.int32()),
                pa.array(d2, type=pa.float64()),
            ]
            names = [id_col, vec_col, "cluster", "d2"]
            if with_norm:
                arrays.append(pa.array(np.sqrt(_self_dot(x)), type=pa.float64()))
                names.append("nrm")
            if probes:
                dist = _l2_matrix(x, cents) if n else np.empty((0, len(js)))
                # stable sort: equal d keeps ascending centroid id — the
                # array_sort(struct(d, j)) tie rule
                order = np.argsort(dist, axis=1, kind="stable")[:, :probes]
                pc = js[order] if n else np.empty((0, probes), dtype=np.int32)
                arrays.append(
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(pc.reshape(-1), type=pa.int32()), probes
                    ).cast(pa.list_(pa.int32()))
                )
                names.append("pcells")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return emb.select(id_col, vec_col).mapInArrow(assign, out_schema)


def cell_pair_dots(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "a",
    right_id: str = "nn",
    cell_col: str = "cell",
    vec_col: str = "vec",
    norm_col: str = "nrm",
    exclude_equal: bool = True,
    left_lt_right: bool = False,
) -> DataFrame:
    """(a, nn, dot, na, nb): all left x right pairs WITHIN each cell with
    the left-fold dot product — the vectorized form of the cell equi-join
    + per-pair HOF cosine fold (``knn_join_ivf`` / ``semantic_dedup``).

    Both inputs carry (id, cell, vec, norm); the kernel groups by cell
    (``applyInPandas`` — one shuffle of id+vec+norm rows, the same bytes
    the equi-join moved) and accumulates the dot dimension-by-dimension
    over the LxR block, preserving the strict left-fold order.  The JVM
    plan applies ``round(dot / (na * nb), 6)`` downstream, unchanged.

    ``exclude_equal`` drops a == nn pairs (the join's ``a != nn``);
    ``left_lt_right`` keeps only a < nn (the pair-dedup rule).  At scale
    this is the production IVF shape: pair work is cell-partitioned, the
    hottest cell bounds a task, and vectors cross the shuffle once.
    """
    import pandas as pd  # noqa: F401

    lid_t = dict(zip(left.columns, (f.dataType.simpleString() for f in left.schema.fields)))[left_id]
    rid_t = dict(zip(right.columns, (f.dataType.simpleString() for f in right.schema.fields)))[right_id]
    out_schema = (
        f"{left_id} {lid_t}, {right_id} {rid_t}, dot double, na double, nb double"
    )

    lcols = left.select(
        F.col(left_id).alias("_id"), F.col(cell_col).alias("_cell"),
        F.col(vec_col).alias("_vec"), F.col(norm_col).alias("_nrm"),
        F.lit(0).alias("_side"),
    )
    rcols = right.select(
        F.col(right_id).alias("_id"), F.col(cell_col).alias("_cell"),
        F.col(vec_col).alias("_vec"), F.col(norm_col).alias("_nrm"),
        F.lit(1).alias("_side"),
    )
    both = lcols.unionByName(rcols)

    def score(pdf):
        import pandas as pd

        lmask = pdf["_side"].values == 0
        lids = pdf["_id"].values[lmask]
        rids = pdf["_id"].values[~lmask]
        if len(lids) == 0 or len(rids) == 0:
            return pd.DataFrame(
                {left_id: [], right_id: [], "dot": [], "na": [], "nb": []}
            )
        lx = np.stack(pdf["_vec"].values[lmask]).astype(np.float64, copy=False)
        rx = np.stack(pdf["_vec"].values[~lmask]).astype(np.float64, copy=False)
        lnrm = pdf["_nrm"].values[lmask]
        rnrm = pdf["_nrm"].values[~lmask]
        acc = np.zeros((len(lids), len(rids)), dtype=np.float64)
        for i in range(lx.shape[1]):
            acc += lx[:, i, None] * rx[None, :, i]
        li, ri = np.meshgrid(
            np.arange(len(lids)), np.arange(len(rids)), indexing="ij"
        )
        li = li.reshape(-1)
        ri = ri.reshape(-1)
        if exclude_equal:
            keep = lids[li] != rids[ri]
            li, ri = li[keep], ri[keep]
        if left_lt_right:
            keep = lids[li] < rids[ri]
            li, ri = li[keep], ri[keep]
        return pd.DataFrame(
            {
                left_id: lids[li],
                right_id: rids[ri],
                "dot": acc[li, ri],
                "na": lnrm[li],
                "nb": rnrm[ri],
            }
        )

    return both.groupBy("_cell").applyInPandas(score, out_schema)
