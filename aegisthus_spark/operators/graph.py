"""Graph analytics over candidate-pair edge sets (near-dup graphs).

Connected components lives in ``dedup.connected_components`` (min-label
propagation, LSH-fed). This module adds weighted propagation — PageRank —
in the same distributed shape: edges are a DataFrame, each iteration is
one join + one aggregate, lineage is cut per round, and all floating-point
accumulation happens in DECIMAL so the result is independent of
partitioning (and engine — the unrolled oracle reproduces it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    pairs: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str = "doc_id",
    iters: int = 2,
    damping: float = DAMPING,
) -> DataFrame:
    """(id, pr): PageRank after ``iters`` synchronous iterations on the
    UNDIRECTED graph given by (a, b) pairs, uniform start 1/N.

    pr_{t+1}(v) = (1-d)/N + d * sum_{u->v} pr_t(u) / deg(u)

    Scale shape: per iteration ONE equi-join of the edge list against the
    rank vector plus one dst-keyed aggregate (map-side combinable); the
    degree table joins once up front. Per-edge contributions are rounded
    into DECIMAL(27,15) before summing, so ranks are bit-identical under
    any partitioning or engine. Dangling mass is NOT redistributed
    (isolated vertices keep the (1-d)/N floor) — documented deviation from
    the random-surfer model, irrelevant for near-dup graphs where edges
    are symmetric so every edge-touched vertex has out-degree >= 1.

    N is the vertex count — fetched once as a query parameter (one scalar
    driver aggregate, like an LSH query vector).
    """
    n = vertices.count()
    base = (1.0 - damping) / n
    # One evaluation of the (expensive) upstream pair plan: checkpoint the
    # small candidate-pair set before the 2-branch direction union — same
    # rationale as dedup.connected_components.
    pairs = pairs.select("a", "b").localCheckpoint()
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = vertices.select(F.col(id_col).alias("v")).withColumn(
        "pr", F.lit(1.0 / n)
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.select(F.col("v").alias("src"), "pr"), "src")
            .select(
                F.col("dst"),
                (F.col("pr") / F.col("deg")).cast("decimal(27,15)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, ranks.v == contrib.dst, "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("v").alias(id_col), "pr")


def lpa_communities(
    pairs: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str = "doc_id",
    iters: int = 2,
) -> DataFrame:
    """(id, community): SYNCHRONOUS label propagation (Raghavan et al.
    2007) on the undirected (a, b) pair graph, made fully deterministic:
    every round each edge-touched vertex takes the label that is MOST
    FREQUENT among its neighbors, ties to the SMALLEST label; isolated
    vertices keep their own id. A fixed iteration count (synchronous LPA
    oscillates, so 'run to convergence' is not well-defined) + the total
    tie order make the result engine- and partitioning-independent.

    Scale shape: per round ONE edge-label equi-join, one (dst, label)
    count (map-side combinable), one dst-keyed argmin — integer arithmetic
    only, so no decimal guards are needed. Communities differ from
    connected components on dense graphs: a component fragments into
    locally-cohesive label basins (the near-dup CLUSTER structure, not
    mere reachability)."""
    pairs = pairs.select("a", "b").localCheckpoint()
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(F.col(id_col).alias("v")).withColumn(
        "label", F.col("v")
    )
    for _ in range(iters):
        votes = (
            edges.join(labels.select(F.col("v").alias("src"), "label"), "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("dst")
            .agg(
                F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label")))
                .alias("_m")
            )
            .select(F.col("dst"), F.col("_m.label").alias("nlabel"))
        )
        labels = (
            labels.join(votes, labels.v == votes.dst, "left")
            .select("v", F.coalesce("nlabel", "label").alias("label"))
            .localCheckpoint()
        )
    return labels.select(F.col("v").alias(id_col), F.col("label").alias("community"))


def triangle_counts(
    pairs: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_triangles): triangles through each vertex of the undirected
    pair graph — the standard near-dup-graph density signal (a clique of
    k mutual near-dups contributes C(k-1,2) per member).

    Scale shape: triangles enumerate once in canonical a < b < c order —
    two equi-joins on the (small) candidate-pair set, the first keyed on
    the shared middle vertex, the second verifying the closing edge. No
    direction union, no post-hoc dedup: the ordering makes each triangle
    appear exactly once. The per-vertex count is one explode + hash-agg.
    """
    # normalize defensively: this is a public operator, not just the LSH
    # funnel — reversed or duplicate edges would overcount triangles.
    # least/greatest + distinct is a no-op on already-canonical input.
    e = (
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # one eval of the upstream
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        ab.join(bc, "y")
        .join(ac, ["x", "z"])  # closing edge: x < y < z holds transitively
        .select("x", "y", "z")
    )
    member = tri.select(
        F.explode(F.array("x", "y", "z")).alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    ids = vertices.select(F.col(id_col).alias("v"))
    return (
        ids.join(member, "v", "left")
        .select(
            F.col("v").alias(id_col),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .orderBy(id_col)
    )
