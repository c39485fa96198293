"""Bounded variable-length path expansion (SURVEY.md J13 generic path).

Two strategies:

1. `interval_paths` — when the edge set is a linear chain per
   partition (the pangenome NEIGHBOUR graph), `(a)-[*m..n]->(b)` is an
   interval predicate over per-partition ordinals: one range join, no
   iteration.  This is the plan the RGP query uses (graph/rgp.py).

2. `expand_paths` — the general fallback for arbitrary digraphs:
   iterative frontier ⋈ edges self-joins, semantically what a Pregel
   BFS would do, with early termination on an empty frontier and
   localCheckpoint every few iterations to truncate the lineage (the
   loop is driver-side control flow; each iteration is a distributed
   join).  Catalyst cannot reorder across the loop, so selective
   source/target filters must be applied to the frontier up front —
   the reference's hand-ordered anchor filters (RGPs.ipynb:451-465)
   become the `sources` argument here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_paths(
    nodes: DataFrame,
    partition_col: str,
    order_col: str,
    id_col: str,
    min_hops: int,
    max_hops: int,
) -> DataFrame:
    """All (src, dst, hops) pairs along each partition's chain with
    min_hops <= hops <= max_hops.  `nodes` must hold one row per chain
    node."""
    w = Window.partitionBy(partition_col).orderBy(order_col, id_col)
    pos = nodes.select(
        F.col(partition_col).alias("part"),
        F.col(id_col).alias("node_id"),
        F.row_number().over(w).alias("pos"),
    )
    a = pos.alias("a")
    b = pos.alias("b")
    hops = F.col("b.pos") - F.col("a.pos")
    return a.join(
        b, (F.col("a.part") == F.col("b.part")) & hops.between(min_hops, max_hops)
    ).select(
        F.col("a.part").alias(partition_col),
        F.col("a.node_id").alias("src"),
        F.col("b.node_id").alias("dst"),
        hops.alias("hops"),
    )


def expand_paths(
    edges: DataFrame,
    min_hops: int,
    max_hops: int,
    sources: DataFrame | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """General bounded-length reachability on an arbitrary edge list
    `(src, dst)`: returns (origin, dst, hops) for every path of length
    min_hops..max_hops.  `sources` (optional, one `src` column)
    restricts the origins — apply selective filters HERE, not after.

    Note: enumerates reachability pairs per hop count, so worst-case
    cost is O(sum of frontier sizes); on the pangenome chain graph each
    frontier is |V|, giving O(max_hops * |V|) — acceptable as fallback,
    but prefer interval_paths when the chain invariant holds.
    """
    e = edges.select(F.col("src"), F.col("dst"))
    frontier = e.select(F.col("src").alias("origin"), F.col("dst"), F.lit(1).alias("hops"))
    if sources is not None:
        frontier = frontier.join(
            sources.select(F.col("src").alias("origin")).distinct(), "origin"
        )
    results = [frontier.filter(F.col("hops") >= min_hops)] if min_hops <= 1 else []

    for depth in range(2, max_hops + 1):
        nxt = e.select(F.col("src").alias("dst"), F.col("dst").alias("next_dst"))
        frontier = (
            frontier.join(nxt, "dst")
            .select("origin", F.col("next_dst").alias("dst"), (F.col("hops") + 1).alias("hops"))
        )
        if depth % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=True)
            if frontier.isEmpty():
                break
        if depth >= min_hops:
            results.append(frontier)

    if not results:
        return frontier.limit(0)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
