"""Distributed graph analytics beyond connected components (which lives
in dedup.py next to its near-dup use case): triangle counting via
degree-ordered edge orientation.

The naive 3-way edge self-join enumerates every wedge at every vertex —
a hub of degree d contributes d(d-1)/2 wedges, so one celebrity node in
a 100 TB graph detonates the join. Orienting each edge from the
lower-(degree, id) endpoint to the higher one makes every vertex's
OUT-degree O(sqrt(|E|)) (a classic bound: a node can only point at
nodes of equal-or-larger degree), so the wedge join over oriented
adjacency is bounded by Σ outdeg² ≤ |E|^1.5 regardless of hubs — the
standard MapReduce triangle algorithm. Each triangle {x,y,z} with
orientation order x<y<z is counted exactly once as the wedge (x→y, x→z)
closed by (y→z).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def orient_edges(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Orient undirected (u, v) edges from the lower-(degree, id) endpoint
    to the higher: returns (src, dst, dst_deg) with one row per edge.
    Degrees come from one aggregate over the exploded endpoints; the two
    broadcast joins attach them back (the degree relation is one row per
    VERTEX — small relative to edges)."""
    ends = edges.select(F.col(u).alias("n")).unionAll(
        edges.select(F.col(v).alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    e = (
        edges.join(
            F.broadcast(deg.select(F.col("n").alias(u), F.col("d").alias("du"))), u
        ).join(
            F.broadcast(deg.select(F.col("n").alias(v), F.col("d").alias("dv"))), v
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col(u) < F.col(v))
    )
    return e.select(
        F.when(u_first, F.col(u)).otherwise(F.col(v)).alias("src"),
        F.when(u_first, F.col(v)).otherwise(F.col(u)).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    )


def triangle_stats(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """One-row (n_edges, n_wedges, n_triangles, clustering): exact
    triangle count by oriented wedge join + closing-edge semi-check, the
    exact wedge total Σ d(d-1)/2 from the degree relation, and the
    global clustering coefficient 3T/W as the single trailing float op
    (floor-rounded to 6dp, engine-identically).

    This plan references ``edges`` from six subtrees (two wedge aliases,
    the closing side, two degree attaches, the wedge total). That is NOT
    a rescan problem: all references live in one query execution, and
    AQE reuses the identical edge-construction shuffle stages at runtime
    (the static executedPlan toString shows them duplicated only because
    the noop write finalizes a separate QueryExecution). Measured at the
    factor-100 co-purchase smoke: an eager localCheckpoint of the edge
    list — the connected_components medicine — is ~1.7x SLOWER here
    (96.4s vs 57.8s): it forfeits stage reuse plus pipeline stats for a
    materialization this single-execution plan never needed. Checkpoints
    pay off only across JOBS (CC's per-iteration actions); keep
    single-collect graph queries declarative."""
    oriented = orient_edges(edges, u, v)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    # wedges at src: pick each unordered {y, z} once via the same
    # (degree, id) total order used for orientation
    later = (F.col("e1.dst_deg") < F.col("e2.dst_deg")) | (
        (F.col("e1.dst_deg") == F.col("e2.dst_deg"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    wedges = e1.join(e2, (F.col("e1.src") == F.col("e2.src")) & later).select(
        F.col("e1.dst").alias("wy"), F.col("e2.dst").alias("wz")
    )
    closing = oriented.select(
        F.col("src").alias("wy"), F.col("dst").alias("wz")
    )
    tri = wedges.join(closing, ["wy", "wz"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    ends = edges.select(F.col(u).alias("n")).unionAll(
        edges.select(F.col(v).alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    # integer sums FIRST, halve after WITH INTEGER DIVISION: d*(d-1)
    # summed as long stays exact, and `div 2` keeps the halving exact
    # past 2^53 where a double `/ 2` would round (both sums are even —
    # handshake lemma / d(d-1) even per term — so div IS the half)
    base = deg.agg(
        F.sum(F.col("d").cast("long")).alias("__sd"),
        F.sum((F.col("d") * (F.col("d") - 1)).cast("long")).alias("__sw"),
    ).select(
        F.expr("__sd div 2").alias("n_edges"),
        F.expr("__sw div 2").alias("n_wedges"),
    )
    return (
        base.crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.floor(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("clustering"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    u: str = "u",
    v: str = "v",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (symmetrized
    internally): returns (node, rank) after ``iters`` synchronous
    updates from the uniform start.

    Cross-engine exact by construction — rare for an iterative float
    algorithm: each per-edge contribution rank/degree is one IEEE
    division, the per-node sum runs in DECIMAL(38,18) (the double→
    decimal rounding is deterministic and order-independent, unlike
    summing raw doubles whose result depends on partitioning), and the
    damping update is a fixed scalar expression. The oracle twin unrolls
    the same ``iters`` updates as chained plain CTEs, because SQL
    recursion forbids aggregates in the recursive term. Per iteration:
    one join on the rank key + one aggregate — the canonical distributed
    PageRank cost, O(|E|) shuffle per round; symmetric edges mean no
    dangling-mass correction is needed. Every iteration references
    ``sym`` anew, but the whole unrolled plan is ONE query execution, so
    AQE reuses the edge-construction stages at runtime — see the
    triangle_stats docstring for the measured evidence that an eager
    checkpoint here is slower, not faster."""
    sym = edges.select(F.col(u).alias("su"), F.col(v).alias("sv")).unionAll(
        edges.select(F.col(v).alias("su"), F.col(u).alias("sv"))
    )
    deg = sym.groupBy(F.col("su").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    ranks = deg.select("n").crossJoin(F.broadcast(nn)).select(
        "n", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            ranks.join(deg, "n")
            .join(sym, ranks["n"] == sym["su"])
            .select(F.col("sv").alias("n"), (F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            contrib.groupBy("n")
            .agg(F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                "n",
                (
                    F.lit(1 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.col("s")
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("n").alias("node"),
        (F.floor(F.col("r") * 1e8 + F.lit(0.5)) / 1e8).alias("rank"),
    )


def two_hop_reach(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    max_degree: int | None = None,
) -> DataFrame:
    """Distinct vertices within <= 2 undirected hops of each vertex,
    self excluded: (node, n_reach_2hop). One symmetric edge union, one
    self-join through the middle vertex, one distinct-count — no
    iteration, no cartesian.

    Scale: the middle join materializes sum(deg(m)^2) wedge rows, the
    same hub hazard the triangle census dodges with degree orientation
    — but reach is path-existence, where orientation doesn't apply.
    ``max_degree`` is the honest cap: vertices with more neighbors are
    excluded AS THE MIDDLE HOP (their own reach rows remain), giving a
    deterministic lower-bound reach — the max_df trade from the
    jaccard posting lists, applied to graphs. Unset it only when the
    degree distribution is known hub-free.

    Input contract: a canonical undirected edge list (each edge once;
    self-loops are dropped here, never counted as reach). Feeding BOTH
    (u,v) and (v,u) stays reach-correct — the final distinct collapses
    them — but doubles the degree counts the cap compares against."""
    a, b = F.col(u).alias("__a"), F.col(v).alias("__b")
    sym = (
        edges.filter(F.col(u) != F.col(v))
        .select(a, b)
        .unionByName(
            edges.filter(F.col(u) != F.col(v)).select(
                F.col(v).alias("__a"), F.col(u).alias("__b")
            )
        )
    )
    mid = sym
    if max_degree is not None:
        # a vertex's degree = its out-edge count in the symmetric form;
        # capping the SOURCE side of the second leg excludes high-degree
        # vertices exactly where they act as the middle hop
        deg = sym.groupBy("__a").agg(F.count(F.lit(1)).alias("__d"))
        ok = deg.filter(F.col("__d") <= max_degree).select("__a")
        mid = sym.join(ok, "__a")
    two = (
        sym.select(F.col("__a"), F.col("__b").alias("__m"))
        .join(
            mid.select(F.col("__a").alias("__m"), F.col("__b")),
            "__m",
        )
        .select("__a", "__b")
        .filter(F.col("__a") != F.col("__b"))
    )
    return (
        sym.unionByName(two)
        .distinct()
        .groupBy(F.col("__a").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_reach_2hop"))
    )
