"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force scan — the exact baseline. One pass, no
  shuffle (global top-k via takeOrdered-style sort+limit; at scale Spark
  runs partial top-k per partition before the single-reducer merge).
- ``cosine_topk_ivf``: IVF-style two-stage search — route the query to the
  nearest coarse cells (here: per-label centroids; on a real corpus,
  k-means cells), scan only those cells. The centroid table is tiny and
  broadcast; the cell filter prunes the scan by the cell/partition column,
  which at 100 TB maps onto partition pruning of a cell-partitioned table.

Dot products use the exact-decimal formulation from dedup._dot_decimal so a
DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _dot_decimal


def _query_lit(query_vec: list[float]) -> str:
    vals = ",".join(f"cast({float(v)!r} as float)" for v in query_vec)
    return f"array({vals})"


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity (rounded to 6 for determinism)."""
    q = _query_lit(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.round(
            F.expr(_dot_decimal(vec_col, q))
            / (F.sqrt(F.expr(_dot_decimal(vec_col, vec_col))) * F.sqrt(F.expr(_dot_decimal(q, q)))),
            6,
        ).alias("cos"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos"), id_col).limit(k)


def label_centroids(emb: DataFrame, *, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid: element-wise mean as exact decimal sums / count.

    Kept order-independent (decimal sums per dimension) so any engine — and
    any partitioning — produces identical centroids.
    """
    dim = emb.select(F.posexplode(vec_col).alias("i", "x"), F.col(label_col))
    return (
        dim.groupBy(label_col, "i")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(27,15)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select(label_col, F.expr("transform(ic, s -> s.c)").alias("centroid"))
    )


def hyperplanes(dim: int, n_planes: int = 6, seed: int = 1234) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded Gaussian) — embedded as
    literals in the plan so any engine reproduces the same buckets. Values
    are rounded through float32 so the Spark literal (array<float>) and an
    oracle's double literal denote the SAME numbers."""
    import random
    import struct

    rng = random.Random(seed)
    f32 = lambda v: struct.unpack("f", struct.pack("f", v))[0]  # noqa: E731
    return [[f32(rng.gauss(0.0, 1.0)) for _ in range(dim)] for _ in range(n_planes)]


def _dot_float(a: str, b: str) -> str:
    """SQL expr: double-precision dot product as a strict LEFT FOLD over the
    array (aggregate with 0.0 seed). Same element order + same IEEE-754 ops
    => bit-identical in any engine that folds left (DuckDB: list_reduce over
    the same products), without decimal's ~10x constant factor. Used where
    only the dot's SIGN or a rounded score is consumed."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )


def _py_bucket(vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket id for a literal query vector: the identical
    strict left fold (0.0 seed, in-order adds over x*y doubles) as
    _dot_float, so sign bits — hence the bucket — match the SQL
    expression bit-for-bit."""
    b = 0
    for j, p in enumerate(planes):
        acc = 0.0
        for x, y in zip(vec, p):
            acc += float(x) * float(y)
        if acc > 0:
            b |= 1 << j
    return b


def _bucket_expr(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL: random-hyperplane LSH bucket id = sign bits of plane dots.

    Sign bits use the FLOAT dot (_dot_float): production bucketing never
    needs exact decimal, and the oracle reproduces the same left fold
    bit-for-bit. Gaussian plane dots sit far from 0 relative to double
    rounding error, so the sign — hence the bucket — is stable."""
    bits = " + ".join(
        f"(case when {_dot_float(vec_sql, _query_lit(p))} > 0 then {1 << j} else 0 end)"
        for j, p in enumerate(planes)
    )
    return f"({bits})"


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    probe_radius: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket every vector by the sign pattern of
    ``n_planes`` fixed Gaussian hyperplane dots (SimHash for vectors), probe
    the query's bucket plus all Hamming-distance<=``probe_radius``
    neighbors, exact-rank the candidates.

    ``n_tables`` > 1 is the classic OR-construction (Indyk-Motwani): L
    independent plane sets (seeds ``seed + 7919*t``), a vector is a
    candidate if it probe-matches in ANY table. Independent tables attack
    per-query recall VARIANCE — a query whose true neighbors straddle >R
    hyperplane flips in one table rarely straddles them in all L — which
    single-table radius/plane tuning cannot (r15 frontier sweep,
    tools/lsh_frontier.py: 2 tables x 8 planes dominates 1x6 on mean
    0.74->0.815, worst-sample 0.2->0.6 AND scan fraction 0.368->0.305
    at sf1; more planes at 1 table strictly LOSES recall).

    Scale shape: each table's bucket id is a pure per-row expression (no
    shuffle to assign), candidate selection is a bucket-id filter — on a
    bucket-partitioned table that is partition pruning, the same story as
    the IVF variant but without needing trained centroids. Probing radius
    R scans ~L*sum(C(H,r))/2^H of the corpus (union overlap makes it
    less); the recall levers are R and L, not H alone.
    """
    if not 0 <= probe_radius <= 2:
        raise ValueError("probe_radius must be 0, 1 or 2 (the probe list "
                         "blows up combinatorially; raise n_planes instead)")
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    flips = [0]
    if probe_radius >= 1:
        flips += [1 << j for j in range(n_planes)]
    if probe_radius >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    hit_terms = []
    for t in range(n_tables):
        planes = hyperplanes(len(query_vec), n_planes, seed + 7919 * t)
        # query-side bucket folded in Python: the same strict left fold
        # over the same doubles as _dot_float, so the bucket id is
        # bit-identical to what the SQL expression would compute — but
        # the probe list becomes a literal int array instead of 37
        # copies of an 8x64-literal expression tree (keeps the plan
        # kilobytes, not megabytes)
        qb = _py_bucket(query_vec, planes)
        probes = "array(" + ", ".join(str(qb ^ m) for m in flips) + ")"
        hit_terms.append(
            f"array_contains({probes}, {_bucket_expr(vec_col, planes)})"
        )
    cand = emb.filter(F.expr(" OR ".join(hit_terms)))
    return cosine_topk(
        cand, query_vec, k=k, id_col=id_col, vec_col=vec_col, exclude_id=exclude_id
    )


def knn_join(
    emb: DataFrame,
    *,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 10,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int = 1,
    salt_bucket_threshold: int = 4096,
) -> DataFrame:
    """ALL-vectors k-NN join — the join form of ANN that corpus curation
    actually runs (near-dup candidate generation, retrieval augmentation):
    for every vector, its top-k neighbors by cosine among LSH-blocked
    candidates (same bucket or Hamming-distance-1, the multiprobe
    criterion), ranked with ties broken on neighbor id.

    Scale shape: bucket assignment is a pure per-row expression; the
    candidate set comes from ONE equi-join on bucket id (the probe list —
    n_planes+1 distinct buckets — is exploded on the left side, so no
    nested-loop join ever appears). Candidate count is
    ~n * (n_planes+1) * n/2^n_planes; pick ``n_planes ~ log2(n / target
    bucket size)`` as the corpus grows — the registered query derives it
    from the corpus count (queries.knn_plane_count), measured 2.5-2.6x
    faster than fixed planes at 20k-40k vectors (tools/stress.py --knn).
    The skew number to watch at scale is the HOTTEST bucket size:
    sign-bit buckets on correlated embeddings run well above the uniform
    n/2^p estimate (the stress tool prints same-bucket pair counts), and
    pairs-per-bucket grow quadratically in it — if one bucket dominates,
    add planes (cheap, per-row) first: they exponentially split CORRELATED
    clusters. For clusters of near-IDENTICAL vectors — which no plane can
    separate (equal sign patterns at any p) — pass ``salt > 1``: left rows
    are salted by id and right rows replicated ``salt`` ways, so the hot
    bucket's join key becomes (bucket, salt) and its pair work spreads
    over ``salt`` tasks. Replication is restricted to HOT buckets
    (``salt_bucket_threshold`` members or more, found by one cheap bucket
    histogram broadcast to both sides — round-10 advice: replicating the
    whole corpus salt ways multiplied shuffle volume to spread a few
    buckets); cold-bucket rows keep salt key 0 on both sides, so the
    candidate set — and therefore the result — is byte-identical with any
    (salt, threshold) setting. Size salt ~ hottest-bucket-pairs /
    pairs-per-task budget, threshold ~ sqrt(pairs-per-task budget)
    (default 4096 ~ 16M pairs per unsplit bucket); tools/stress.py --knn
    --skew records both the plane and the salt lever. Scoring uses the float left-fold
    dot (bit-identical across engines); per-vector ranking windows
    partition on the vector id — corpus-cardinality groups, never a
    single-task funnel.
    """
    from pyspark.sql import Window

    planes = hyperplanes(dim, n_planes, seed)
    b = F.expr(_bucket_expr(vec_col, planes))
    norm = F.sqrt(F.expr(_dot_float(vec_col, vec_col)))  # once per vector
    left = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), b.alias("ab"),
        norm.alias("na"),
    )
    right = emb.select(
        F.col(id_col).alias("nn"), F.col(vec_col).alias("vb"), b.alias("bb"),
        norm.alias("nb"),
    )
    probe = F.explode(
        F.array(F.col("ab"), *[F.expr(f"ab ^ {1 << j}") for j in range(n_planes)])
    ).alias("pb")
    if salt > 1:
        # hot buckets only: one histogram pass finds buckets big enough to
        # need spreading; it broadcasts to both sides (by construction few
        # rows — every entry represents >= threshold corpus rows)
        hot = (
            right.groupBy("bb").agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") >= salt_bucket_threshold)
            .select(F.col("bb").alias("_hb"))
            # both the lhs and rhs broadcasts reference this frame;
            # without pinning, the full-corpus bucket aggregate re-runs
            # once per side (same pattern as triangle_counts /
            # sorted_neighborhood_pairs)
            .localCheckpoint(eager=False)
        )
        # pmod, not %: Spark's % preserves sign, so a negative id would
        # yield a salt value outside [0, salt-1] and silently drop every
        # candidate pair for that row
        lhs = (
            left.select("a", "va", "na", probe)
            .join(F.broadcast(hot), F.col("pb") == F.col("_hb"), "left")
            .select(
                "a", "va", "na", "pb",
                F.when(F.col("_hb").isNotNull(), F.pmod(F.col("a"), F.lit(salt)))
                .otherwise(F.lit(0)).alias("_sl"),
            )
        )
        rhs = (
            right.join(F.broadcast(hot), F.col("bb") == F.col("_hb"), "left")
            .withColumn(
                "_sr",
                F.explode(F.expr(
                    f"sequence(0, if(_hb is not null, {salt - 1}, 0))"
                )),
            )
            .drop("_hb")
        )
        cand = lhs.join(
            rhs,
            (F.col("pb") == F.col("bb"))
            & (F.col("_sl") == F.col("_sr"))
            & (F.col("a") != F.col("nn")),
        )
    else:
        cand = left.select("a", "va", "na", probe).join(
            right, (F.col("pb") == F.col("bb")) & (F.col("a") != F.col("nn"))
        )
    scored = cand.select(
        "a",
        "nn",
        F.round(
            F.expr(_dot_float("va", "vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), "nn")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("a").alias(id_col), F.col("nn"), "cos", F.col("rn").cast("int").alias("rn"))
    )


def knn_join_ivf(
    emb: DataFrame,
    *,
    k: int = 3,
    cells: int = 32,
    probes: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL-vectors k-NN join via IVF (k-means cell) blocking — the
    moderate-similarity complement to :func:`knn_join`'s sign-bit LSH.

    Sign-bit LSH only retrieves near-identical vectors: at the top-1
    neighbor cosine this corpus actually has (~0.67 at sf1,
    tools/ann_recall.py), P(Hamming<=1 over 14 planes) is ~8%, so
    ``knn_join`` is a NEAR-DUP candidate generator, not a general k-NN.
    IVF blocks by data-adaptive k-means cells instead: neighbors at
    moderate cosine share a cell (or the runner-up cell) with high
    probability because the cells are fitted to the corpus's own cluster
    structure, not to random hyperplanes.

    Shape: one Lloyd-refined clustering (``_lloyd_clusters`` — seeds =
    ``cells`` lowest ids, decimal-exact means, shared bit-for-bit with
    kmeans_assign and its green oracle); the RIGHT side is each vector in
    its own (top-1) cell, the LEFT side probes its ``probes`` nearest
    cells by flat centroid rank — candidates come from ONE equi-join on
    cell id, ~``probes * n/cells`` per vector, never all-pairs. With
    ``cells ~ sqrt(n/2)`` (the registered query's choice, the SemDeDup
    contract) total candidate work is ~n^1.5; fixed-size cells
    (``cells ~ n/c``) make it linear at the price of a bigger centroid
    broadcast — at production scale use the two-level route for the
    probe rank too. Scoring and ranking mirror knn_join: float left-fold
    cosine rounded to 6, per-vector rank window, id tie-breaks.

    Own-cell assignment reuses the kmeans two-level route above 32 cells
    (approximate, identical to the kmeans_assign oracle); probe ranks are
    exact flat ranks over the final centroids — both rules are mirrored
    verbatim in the registered oracle, so a vector whose routed own cell
    differs from its flat top-1 produces the same candidates in both
    engines.

    r15 (guide §4.2 + §8): ONE vectorized assignment kernel
    (``vectorized.assign_cells``) computes own cell, probe list and norm
    per vector, and the per-pair cosine fold — formerly an interpreted
    HOF per candidate pair, the bench's single most expensive stage —
    became a per-CELL NumPy block kernel (``vectorized.cell_pair_dots``):
    the pair space never materializes through a JVM expression; vectors
    cross one cell-keyed shuffle and each cell's LxR dot block is
    accumulated dimension-by-dimension (the bit-identical left fold).
    Rounding and the per-vector rank window stay in the JVM plan.
    """
    from pyspark.sql import Window

    from .vectorized import assign_cells, cell_pair_dots

    emb = ensure_parallelism(emb, id_col)
    clusters, k_c = _lloyd_clusters(
        emb, cells, iters=iters, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_cells(
        emb, _cells_for(clusters, k_c), k_c=k_c, id_col=id_col,
        vec_col=vec_col, probes=probes, with_norm=True,
    )
    # right: every vector in its own top-1 cell (two-level above 32 cells,
    # the kmeans_assign rule); left: the flat top-``probes`` cells
    # (stable argsort == ORDER BY d2, cluster)
    right = assigned.select(
        F.col(id_col).alias("nn"), F.col(vec_col).alias("vec"),
        F.col("nrm"), F.col("cluster").alias("cell"),
    )
    left = assigned.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("vec"),
        F.col("nrm"), F.explode("pcells").alias("cell"),
    )
    scored = cell_pair_dots(
        left, right, left_id="a", right_id="nn", cell_col="cell",
        vec_col="vec", norm_col="nrm", exclude_equal=True,
    ).select(
        "a", "nn",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), "nn")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("a").alias(id_col), F.col("nn"), "cos",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    probes: int = 3,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Two-stage ANN: pick `probes` nearest label centroids, then exact
    search within those labels only."""
    q = _query_lit(query_vec)
    cents = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    routed = (
        cents.select(
            label_col,
            F.round(
                F.expr(_dot_decimal("centroid", q))
                / (
                    F.sqrt(F.expr(_dot_decimal("centroid", "centroid")))
                    * F.sqrt(F.expr(_dot_decimal(q, q)))
                ),
                6,
            ).alias("ccos"),
        )
        .orderBy(F.desc("ccos"), label_col)
        .limit(probes)
    )
    pruned = emb.join(F.broadcast(routed.select(label_col)), label_col)
    return cosine_topk(
        pruned, query_vec, k=k, id_col=id_col, vec_col=vec_col, exclude_id=exclude_id
    )


def _dot_int(a: str, b: str) -> str:
    """SQL expr: exact integer dot product of two int arrays (bigint acc)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * cast(y as bigint)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )


def quantize_int8(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = floor(x_i / scale + 0.5)`` — 4x smaller vectors, the standard
    memory-bandwidth lever for billion-vector search. ``floor(x + 0.5)``
    (not ``round``) so every engine quantizes identically regardless of its
    round-half convention. Keeps ``qq`` (the integer self-dot) so cosine
    needs no float norm later.
    """
    s = f"(array_max(transform({vec_col}, x -> abs(cast(x as double)))) / 127)"
    qv = (
        f"CASE WHEN {s} = 0 THEN transform({vec_col}, x -> 0) "
        f"ELSE transform({vec_col}, x -> cast(floor(cast(x as double) / {s} + 0.5d) as int)) END"
    )
    return emb.select(
        F.col(id_col),
        F.expr(s).alias("scale"),
        F.expr(qv).alias("qvec"),
    ).withColumn("qq", F.expr(_dot_int("qvec", "qvec")))


def cosine_topk_quantized(
    emb: DataFrame,
    *,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine over int8-quantized vectors. The per-vector scales
    CANCEL in the cosine (dot/sqrt(qq_a*qq_b) — pure integer arithmetic
    plus one sqrt), so the score is engine-exact with no float dot chains
    and the scan reads 4x fewer bytes than float32. Brute-force scan form;
    compose with the LSH/IVF candidate pruning above for the 100 TB path.
    """
    qz = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    qrow = qz.filter(F.col(id_col) == query_id).select(
        F.col("qvec").alias("_qv"), F.col("qq").alias("_qqq")
    )
    scored = qz.filter(F.col(id_col) != query_id).crossJoin(F.broadcast(qrow))
    return (
        scored.select(
            id_col,
            (
                F.expr(_dot_int("qvec", "_qv"))
                / F.sqrt((F.col("qq") * F.col("_qqq")).cast("double"))
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), id_col)
        .limit(k)
    )


def _l2_float(a: str, b: str) -> str:
    """SQL expr: squared L2 distance as a strict left fold in doubles (same
    determinism argument as _dot_float: fixed element order + identical
    IEEE-754 ops => bit-identical in any left-folding engine)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )


def _l2_float_unrolled(vec: str, base: str, cent: str, d: int) -> str:
    """Squared L2 between ``vec[base+1 .. base+d]`` and ``cent[1..d]`` as
    straight-line arithmetic — no slice, no zip_with/aggregate lambda
    machinery. Addition order is the same strict left-to-right chain as
    _l2_float's fold, so results are bit-identical; the point is encode
    cost for NARROW subspaces (d <= ~8), where per-lambda overhead
    dominates the handful of real subtractions (r14: the 32x64 IVF-PQ
    recall lift doubled codeword evaluations per row — this claws the
    wall back by making each evaluation a few flops instead of a fold)."""
    sq = []
    for i in range(1, d + 1):
        t = (
            f"(cast(element_at({vec}, {base} + {i}) as double) - "
            f"cast(element_at({cent}, {i}) as double))"
        )
        sq.append(f"({t} * {t})")
    return "(" + " + ".join(sq) + ")"


def _lit_double_array(vals: list[float]) -> str:
    return "array(" + ",".join(f"cast({float(v)!r} as double)" for v in vals) + ")"


def ensure_parallelism(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_col`` when the input arrives with
    fewer partitions than the session's cores — the per-row fold work
    downstream (centroid assignment, pair cosines) otherwise serializes on
    however few splits the scan produced (a small parquet file reads as 1-2
    splits regardless of cluster size). A scan that is already wider (the
    100 TB case: maxPartitionBytes-sized splits) passes through untouched —
    no gratuitous shuffle at scale."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        # may be non-numeric on AQE-auto platforms ("auto")
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_parts = cores
    if df.rdd.getNumPartitions() < min(cores, shuffle_parts):
        return df.repartition(F.col(key_col))
    return df


def _l2_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of _l2_float: the SAME strict left fold in IEEE
    doubles (Python floats are doubles; +,-,* are correctly rounded), so a
    mapping computed on the driver lands on exactly the bits either engine's
    fold produces."""
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc += d * d
    return acc


def coarse_cell_count(k: int) -> int:
    """Coarse-level cell count for the two-level k-means assignment:
    1 (= flat search, the exact classic assignment) up to k = 32, else
    ceil(sqrt(k)) — assignment cost per row drops from k to ~2*sqrt(k)
    distance folds. ceil/sqrt are correctly rounded in every engine, so the
    Spark side and a SQL oracle (CEIL(SQRT(CAST(k AS DOUBLE)))) agree."""
    import math

    return 1 if k <= 32 else math.ceil(math.sqrt(k))


def _cells_for(
    clusters: list[tuple[int, list[float]]], k_c: int
) -> list[tuple[int, int, list[float]]]:
    """(j, cell, cent) rows: each fine centroid mapped to its nearest coarse
    representative (the k_c lowest-id centroids; ties to the lowest rep id).
    k*k_c driver-side folds — tiny next to the N-row assignment it prunes;
    at production k (10^5+) compute this mapping as a DataFrame join
    instead."""
    reps = clusters[:k_c]
    out = []
    for cid, cent in clusters:
        best = None
        for rid, rcent in reps:
            key = (_l2_py(cent, rcent), rid)
            if best is None or key < best:
                best = key
        out.append((cid, best[1], [float(v) for v in cent]))
    return out


def _kmeans_assign_once(
    emb: DataFrame,
    clusters: list[tuple[int, list[float]]],
    *,
    id_col: str,
    vec_col: str,
    k_c: int = 1,
) -> DataFrame:
    """(id, vec, cluster, d2): nearest centroid per row.

    The centroids travel as DATA — one broadcast row holding an
    array<struct<j,cell,cent>> — not as plan literals, so the expression
    tree stays O(1) in k (a transform + array_min over the array column):
    no analysis/codegen blow-up at large k, no shuffle (broadcast cross
    join of a 1-row frame). Ties on d2 break to the lowest cluster id via
    struct ordering, identical to a (d2, cluster) ORDER BY.

    With ``k_c > 1`` the search is two-level: route to the nearest of the
    k_c coarse representatives (the k_c lowest-id centroids), then search
    only the fine centroids mapped to that representative — ~k_c + k/k_c
    distance evaluations per row instead of k. ``k_c = 1`` is the exact
    flat search.

    r15: the per-row HOF fold became a vectorized NumPy kernel
    (``vectorized.assign_cells`` — guide §4.2): same shuffle-free shape
    (one ``MapInArrow`` over (id, vec), centroids in the task closure
    instead of a 1-row broadcast frame), bit-identical distances (the
    kernel accumulates dimension-by-dimension, reproducing the strict
    left fold) and tie rule (first-minimum over ascending centroid ids ==
    ``array_min`` over ``struct(d, j)``)."""
    from .vectorized import assign_cells

    return assign_cells(
        emb, _cells_for(clusters, k_c), k_c=k_c, id_col=id_col, vec_col=vec_col
    )


def kmeans_assign(
    emb: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over the embedding column, seeded with the vectors of
    the ``k`` lowest ids (deterministic, engine-reproducible).

    Scale shape (the MLlib pattern): each iteration is ONE scan — the
    assignment is a per-row HOF fold over a one-row BROADCAST centroid
    array (data, not plan literals: the expression tree is O(1) in k, no
    analysis/codegen blow-up, no shuffle) — plus one (cluster, dim)-keyed
    aggregate whose k*dim result is collected to the driver (tiny:
    8 clusters x 64 dims = 512 doubles) and re-broadcast for the next
    iteration. Above k = 32 the assignment is TWO-LEVEL (coarse route to
    ceil(sqrt(k)) reps, fine search within the routed cell): ~2*sqrt(k)
    folds per row instead of k, sub-linear in k (tools/stress.py
    --semantic prints the assign-vs-k curve). Distances fold in doubles
    (fast, engine-reproducible); centroid MEANS sum in DECIMAL(27,15) so
    they are order-independent — any partitioning, any engine produces
    identical centroids, hence identical assignments. A cluster that
    loses all members keeps its previous centroid.

    Returns (id, cluster, dist) after the final assignment, dist = L2
    rounded to 6.
    """
    emb = ensure_parallelism(emb, id_col)
    clusters, k_c = _lloyd_clusters(
        emb, k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    assigned = _kmeans_assign_once(
        emb, clusters, id_col=id_col, vec_col=vec_col, k_c=k_c
    )
    return assigned.select(
        id_col,
        "cluster",
        F.round(F.sqrt("d2"), 6).alias("dist"),
    )


def _lloyd_clusters(
    emb: DataFrame, k: int, *, iters: int, id_col: str, vec_col: str
) -> tuple[list[tuple[int, list[float]]], int]:
    """The Lloyd loop of :func:`kmeans_assign` with the FINAL centroids
    exposed: ``iters - 1`` (assign, decimal-mean) updates from the
    k-lowest-id seeds. Returns (centroids, k_c) so callers (kmeans_assign,
    knn_join_ivf) share one bit-identical clustering."""
    seed_rows = emb.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    clusters = sorted((int(r[0]), [float(v) for v in r[1]]) for r in seed_rows)
    if not clusters:
        raise ValueError(
            f"kmeans_assign: no seed vectors with {id_col} < {k} — seeds are "
            "the k lowest ids; re-key the corpus or lower k"
        )
    # sparse ids can leave fewer than k seeds; the rep set is 'the k_c
    # lowest SEED ids', so clamp (the SQL oracle's row_number <= kc picks
    # the same set when fewer rows exist)
    k_c = min(coarse_cell_count(k), len(clusters))
    for _ in range(iters - 1):
        assigned = _kmeans_assign_once(
            emb, clusters, id_col=id_col, vec_col=vec_col, k_c=k_c
        )
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(
                (
                    F.sum(F.col("x").cast("double").cast("decimal(27,15)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["i"])] = float(r["c"])
        clusters = [
            (cid, [by_cluster[cid][i] for i in range(len(prev))]) if cid in by_cluster else (cid, prev)
            for cid, prev in clusters
        ]
    return clusters, k_c


def _pq_seeds(
    emb: DataFrame, k: int, *, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """The k-lowest-id codebook seed vectors, collected ONCE (pq_topk
    shares them with pq_encode instead of re-running the job)."""
    seed_rows = emb.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    seeds = sorted((int(r[0]), [float(v) for v in r[1]]) for r in seed_rows)
    if not seeds:
        raise ValueError(
            f"pq codebook: no seed vectors with {id_col} < {k} — seeds are "
            "the k lowest ids; re-key the corpus or lower k"
        )
    return seeds


def pq_encode(
    emb: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(id, codes): product-quantization encoding — the vector is split
    into ``m`` subvectors and each is replaced by the id of its nearest
    codebook centroid (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): 64 float32 dims (256 B) become ``m`` small
    codes (m bytes at k <= 256) — the memory/bandwidth lever for
    billion-vector search, composable with the IVF/LSH candidate pruning
    above.

    Codebooks are the subvectors of the ``k`` lowest ids (deterministic,
    engine-reproducible — the same seeding rule as kmeans_assign; a
    production pipeline would Lloyd-refine them per subspace, which
    changes constants, not the shape). The codebook travels in the task
    closure; the encoding is a shuffle-free per-batch NumPy argmin
    (``vectorized.pq_encode_codes`` since r15 — guide §4.2: the per-row
    HOF argmin evaluated m*k interpreted L2 folds per vector, which
    measured as the dominant cost of every PQ query; the kernel does the
    identical arithmetic — strict left-fold subspace L2, first-minimum
    tie to the lowest codeword id — as NumPy ufunc loops over whole
    Arrow batches, bit-identically).
    """
    if seeds is None:
        seeds = _pq_seeds(emb, k, id_col=id_col, vec_col=vec_col)
    dim = len(seeds[0][1])
    if dim % m:
        raise ValueError(
            f"pq_encode: dim {dim} not divisible by m={m} — the trailing "
            f"{dim % m} dimensions would silently drop from every code"
        )
    from .vectorized import pq_encode_codes

    return pq_encode_codes(
        ensure_parallelism(emb, id_col), seeds, m=m,
        id_col=id_col, vec_col=vec_col,
    )


def pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    *,
    m: int = 8,
    k: int = 16,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    restrict_to: DataFrame | None = None,
    topk_df: DataFrame | None = None,
) -> DataFrame:
    """(id, adist): approximate top-k by ASYMMETRIC distance computation
    (ADC): the query stays full-precision, every corpus vector is its PQ
    code, and distance = sum over subspaces of the precomputed
    query-to-centroid L2 table — O(m) lookups per vector against an
    m*k-entry LUT instead of an O(dim) float fold.

    Scale shape: encode is shuffle-free (broadcast codebook per-row
    argmin), the LUT is m*k rows broadcast into one equi-join, and the
    per-vector sum aggregates map-side before the id-keyed exchange.
    Determinism: LUT distances are the strict left fold both engines
    share; the subspace sum casts each addend to DECIMAL(27,15) (order-
    independent), and the final distance rounds to 6 with id tie-breaks.

    ``restrict_to``: optional (id) frame — score only those ids (the
    IVF-PQ composition: a coarse router picks candidate cells, PQ codes
    pay for the scan). Codebook seeds always come from the FULL corpus so
    the codes are stable under any routing — which also means the
    restriction can apply BEFORE encode: a routed vector's code is
    bit-identical whether or not the rest of the corpus was encoded, and
    skipping the non-routed encode mirrors production (codes for only
    the probed cells are ever READ off a cell-partitioned code table).

    ``topk_df``: optional 1-row ``(_lim bigint)`` frame — a corpus-derived
    shortlist size that rides the PLAN (broadcast scalar) instead of a
    driver-side action (r14 verdict: ``sim_ivfpq_refine`` used to
    ``emb.count()`` on the driver). ``topk`` is ignored when given. A
    dynamic limit can't be a literal ``LIMIT``, so selection is a
    two-phase rank: prune to the top-``_lim`` of each partition (keyed,
    no funnel — every global-top-lim row is in its own partition's
    top-lim), then rank the <= partitions*_lim survivors globally. That
    survivor count is exactly what the literal-limit path's
    TakeOrderedAndProject merges on the driver, so the scale shape is
    unchanged; it just stays on an executor.
    """
    spark = emb.sparkSession
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"pq_topk: dim {dim} not divisible by m={m}")
    d = dim // m
    seeds = _pq_seeds(emb, k, id_col=id_col, vec_col=vec_col)
    enc_src = emb
    if restrict_to is not None:
        # no broadcast hint: the routed candidate set is corpus-fraction
        # sized at scale — let AQE pick the strategy
        enc_src = emb.join(restrict_to.select(id_col), id_col, "left_semi")
    codes = pq_encode(
        enc_src, m=m, k=k, id_col=id_col, vec_col=vec_col, seeds=seeds
    )
    lut = [
        (s, j, _l2_py(query_vec[s * d : (s + 1) * d], vec[s * d : (s + 1) * d]))
        for j, vec in seeds
        for s in range(m)
    ]
    lut_df = spark.createDataFrame(lut, schema="sub int, j int, d double")
    scored = (
        codes.select(id_col, F.posexplode("codes").alias("sub", "j"))
        .join(F.broadcast(lut_df), ["sub", "j"])
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("d").cast("decimal(27,15)")).cast("double"), 6
            ).alias("adist")
        )
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    if topk_df is not None:
        from pyspark.sql import Window

        loc = Window.partitionBy("_pid").orderBy("adist", id_col)
        glob = Window.orderBy("adist", id_col)
        pruned = (
            scored.crossJoin(F.broadcast(topk_df))  # 1-row scalar attach
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_lrk", F.row_number().over(loc))
            .filter(F.col("_lrk") <= F.col("_lim"))
        )
        return (
            pruned.withColumn("_rk", F.row_number().over(glob))
            .filter(F.col("_rk") <= F.col("_lim"))
            .select(id_col, "adist")
        )
    return scored.orderBy("adist", id_col).limit(topk)


def pq_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    *,
    probes: int = 3,
    m: int = 8,
    k: int = 16,
    topk: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    topk_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the billion-vector production layout (Jégou et al. 2011,
    §V) — a coarse router (here: per-label centroids, as in
    cosine_topk_ivf) picks ``probes`` cells, and only those cells' PQ
    CODES are scored by the broadcast ADC LUT. The full-precision vectors
    are never read past encode time; on a cell-partitioned code table the
    label restriction is partition pruning, so query cost is
    ~(corpus/cells)*probes LUT lookups. Codebooks stay corpus-seeded,
    independent of routing, so codes are reusable across queries."""
    q = _query_lit(query_vec)
    cents = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    routed = (
        cents.select(
            label_col,
            F.round(
                F.expr(_dot_decimal("centroid", q))
                / (
                    F.sqrt(F.expr(_dot_decimal("centroid", "centroid")))
                    * F.sqrt(F.expr(_dot_decimal(q, q)))
                ),
                6,
            ).alias("ccos"),
        )
        .orderBy(F.desc("ccos"), label_col)
        .limit(probes)
    )
    pruned = emb.join(F.broadcast(routed.select(label_col)), label_col)
    return pq_topk(
        emb, query_vec, m=m, k=k, topk=topk, topk_df=topk_df,
        id_col=id_col, vec_col=vec_col,
        exclude_id=exclude_id, restrict_to=pruned.select(id_col),
    )


def pq_refine_topk(
    emb: DataFrame,
    query_vec: list[float],
    *,
    m: int = 8,
    k: int = 16,
    shortlist: int = 50,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """(id, adist, cos): the standard PQ retrieval architecture — shortlist
    by cheap ADC over the codes (pq_topk), then exact-rerank only the
    shortlist with the full-precision cosine. At scale the exact pass
    touches ``shortlist`` vectors, not the corpus, so the expensive decimal
    dot is O(shortlist*dim) regardless of corpus size; shortlist
    membership and both rankings are deterministic (rounded scores, id
    tie-breaks), so any engine reproduces the same top-k.
    """
    short = pq_topk(
        emb, query_vec, m=m, k=k, topk=shortlist,
        id_col=id_col, vec_col=vec_col, exclude_id=exclude_id,
    )
    return _exact_rerank(emb, short, query_vec, topk=topk,
                         id_col=id_col, vec_col=vec_col)


def _exact_rerank(
    emb: DataFrame, short: DataFrame, query_vec: list[float], *,
    topk: int, id_col: str, vec_col: str,
) -> DataFrame:
    """The shared exact-rerank tail: full-precision decimal cosine over the
    shortlist ONLY (broadcast join — the shortlist is topk-bounded), rank
    desc with id tie-breaks."""
    q = _query_lit(query_vec)
    cand = emb.join(F.broadcast(short.select(id_col, "adist")), id_col)
    return (
        cand.select(
            id_col,
            "adist",
            F.round(
                F.expr(_dot_decimal(vec_col, q))
                / (
                    F.sqrt(F.expr(_dot_decimal(vec_col, vec_col)))
                    * F.sqrt(F.expr(_dot_decimal(q, q)))
                ),
                6,
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(topk)
    )


def pq_refine_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    *,
    probes: int = 3,
    m: int = 32,
    k: int = 64,
    shortlist: int | None = 50,
    topk: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """(id, adist, cos): the COMPLETE production retrieval stack — IVF
    coarse routing + PQ ADC shortlist + exact rerank (Jégou et al. 2011
    §V's IVFADC with the standard refine stage; the FAISS
    IndexIVFPQ+refine composition). Query cost decomposes as: routing
    over the cell centroids (broadcast), ADC over only the probed cells'
    codes (~(corpus/cells)*probes LUT lookups — partition pruning on a
    cell-partitioned code table), and an exact pass that touches
    ``shortlist`` vectors regardless of corpus size. The two approximate
    stages bound WHICH vectors can surface; the exact stage fixes their
    ORDER — so recall is routing*shortlist-bounded while ranking
    precision is exact.

    ``shortlist=None`` derives the corpus-proportional default
    ``GREATEST(50, n//100)`` IN-PLAN as a 1-row broadcast scalar (the
    engine's TF-IDF/BM25 scalar precedent) — no driver-side count action
    before the returned DataFrame (r14 verdict, Next #6)."""
    lim_df = None
    if shortlist is None:
        lim_df = emb.agg(
            F.greatest(
                F.lit(50).cast("long"),
                (F.count(F.lit(1)) / 100).cast("long"),
            ).alias("_lim")
        )
    short = pq_topk_ivf(
        emb, query_vec, probes=probes, m=m, k=k,
        topk=shortlist if shortlist is not None else 0, topk_df=lim_df,
        id_col=id_col, label_col=label_col, vec_col=vec_col,
        exclude_id=exclude_id,
    )
    return _exact_rerank(emb, short, query_vec, topk=topk,
                         id_col=id_col, vec_col=vec_col)


def hybrid_rrf(
    lexical: DataFrame,
    dense: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """(id, lex_rank, dense_rank, rrf): reciprocal-rank fusion of a lexical
    (BM25) and a dense (embedding-cosine) ranking — the standard hybrid
    retrieval combiner (Cormack et al. 2009): rrf = 1/(c+r_lex) + 1/(c+r_dense).

    Inputs are (id, score) frames; each is ranked independently (score
    desc, id asc for determinism) and fused with a FULL OUTER join so a
    document surfaced by only one retriever still scores on that arm.
    Both rankings are top-of-funnel result lists — thousands of rows at
    most, never corpus-scale — so the single-partition rank windows and
    the join are dimension-sized by construction; the corpus-scale work
    (scoring) happens upstream in the retrievers.
    """
    from pyspark.sql import Window

    wl = Window.orderBy(F.desc("score"), F.asc(id_col))
    lex = lexical.select(id_col, "score").withColumn(
        "lex_rank", F.row_number().over(wl).cast("int")
    ).select(id_col, "lex_rank")
    dn = dense.select(id_col, "score").withColumn(
        "dense_rank", F.row_number().over(wl).cast("int")
    ).select(F.col(id_col).alias("_did"), "dense_rank")
    fused = lex.join(dn, lex[id_col] == F.col("_did"), "full_outer").select(
        F.coalesce(F.col(id_col), F.col("_did")).alias(id_col),
        "lex_rank",
        "dense_rank",
    )
    rrf = (
        F.when(F.col("lex_rank").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("lex_rank"))).otherwise(F.lit(0.0))
        + F.when(F.col("dense_rank").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("dense_rank"))).otherwise(F.lit(0.0))
    )
    return (
        fused.withColumn("rrf", F.round(rrf, 9))
        .orderBy(F.desc("rrf"), id_col)
        .limit(k)
    )


def cosine_topk_matryoshka(
    emb: DataFrame,
    query_vec: list[float],
    *,
    prefix_dim: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Coarse-to-fine ANN over nested (matryoshka) embeddings: shortlist by
    cosine on the first ``prefix_dim`` dimensions, re-rank the shortlist by
    full-dimension cosine (Kusupati et al. 2022).

    Scale shape: the coarse pass reads prefix_dim/dim of the vector bytes
    (with a column layout that stores the prefix separately, that is a
    proportional scan-byte reduction) and keeps only ``shortlist`` rows —
    partial top-k per partition, single small merge; the expensive
    full-dimension scoring touches ``shortlist`` rows, not the corpus.
    Coarse scores use the float left-fold (engine-reproducible), the final
    re-rank the exact-decimal dot; both round to 6 with id tiebreaks, so
    shortlist membership and final order are deterministic in any engine.
    """
    from .dedup import _dot_decimal

    qfull = _query_lit(query_vec)
    qpref = _query_lit(query_vec[:prefix_dim])
    pref = f"slice({vec_col}, 1, {prefix_dim})"
    scored = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.round(
            F.expr(_dot_float(pref, qpref))
            / (
                F.sqrt(F.expr(_dot_float(pref, pref)))
                * F.sqrt(F.expr(_dot_float(qpref, qpref)))
            ),
            6,
        ).alias("coarse"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    short = scored.orderBy(F.desc("coarse"), id_col).limit(shortlist)
    return (
        short.select(
            id_col,
            "coarse",
            F.round(
                F.expr(_dot_decimal(vec_col, qfull))
                / (
                    F.sqrt(F.expr(_dot_decimal(vec_col, vec_col)))
                    * F.sqrt(F.expr(_dot_decimal(qfull, qfull)))
                ),
                6,
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def semantic_match_flags(
    emb: DataFrame,
    bench: list[tuple[int, list[float]]],
    *,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, best_bench, best_cos, flagged): nearest benchmark item per
    corpus vector by cosine, flagged when >= tau — SEMANTIC benchmark
    decontamination (the n-gram `text.decontaminate` catches verbatim
    leakage; this catches paraphrases that re-embed close to an eval item).

    Scale shape: the benchmark set rides the plan as literals — a pure
    per-row expression over |bench| * dim constants, no join and no
    shuffle, exactly the k-means assignment pattern. Every cosine is the
    float left fold (engine-reproducible); ties break to the lowest
    benchmark id. Benchmark norms are re-folded per row for oracle
    bit-parity — at production |bench| sizes, precompute them into the
    literal instead.
    """
    if not bench:
        # an upstream filter that matched no benchmark items flags nothing
        # (NULL best) rather than dying on an untyped empty array expression
        return emb.select(
            id_col,
            F.lit(None).cast("bigint").alias("best_bench"),
            F.lit(None).cast("double").alias("best_cos"),
            F.lit(False).alias("flagged"),
        ).orderBy(id_col)
    # zero-norm guard: nullif the denominator so a degenerate (all-zero)
    # corpus or benchmark vector yields NULL cosine, not NaN — NaN orders
    # differently between Spark's array_max and the DuckDB row_number
    # oracle. NULL cosines sort below every real one (ck = -Infinity),
    # surface as NULL best_cos, and never flag.
    structs = ", ".join(
        "named_struct('c', round({dot} / nullif(sqrt({nv}) * sqrt({nb}), 0d), 6), 'b', {bid})".format(
            dot=_dot_float(vec_col, _query_lit(v)),
            nv=_dot_float(vec_col, vec_col),
            nb=_dot_float(_query_lit(v), _query_lit(v)),
            bid=bid,
        )
        for bid, v in bench
    )
    best = F.expr(
        f"array_max(transform(array({structs}), "
        "s -> named_struct('ck', coalesce(s.c, double('-Infinity')), "
        "'nb', -s.b, 'c', s.c)))"
    )
    return emb.select(
        id_col,
        best.alias("_m"),
    ).select(
        id_col,
        (-F.col("_m.nb")).cast("bigint").alias("best_bench"),
        F.col("_m.c").alias("best_cos"),
        F.coalesce(F.col("_m.c") >= F.lit(tau), F.lit(False)).alias("flagged"),
    ).orderBy(id_col)
