"""Connected components over an edge list — the grouping step of
near-duplicate deduplication (each dup-cluster collapses to one
canonical document).

Min-label propagation: every node starts labelled with its own id;
each round a node takes the min of its label and its neighbours'
labels.  The component minimum reaches every member in at most
`diameter` rounds, so the loop is driver-side control flow over
distributed joins (like operators/traversal.py `expand_paths`), with
`localCheckpoint` per round to truncate lineage and an emptiness probe
for convergence.

Small-graph fast path: when the (deduplicated, symmetrized) edge set
fits comfortably in one task, the iterative machinery is pure
overhead — a near-dup candidate graph is usually a few hundred edges
even over a huge corpus, but each distributed round still pays two
job launches.  Below `small_graph_edges` the edges collapse to a
single Arrow batch and union-find solves them in one `mapInPandas`
task (executor-side, not driver).  The same semantics (component =
minimum member id), one job instead of ~2×diameter.

Scale notes (100 TB): the per-round cost of the iterative path is one
shuffle of |E| + |V| on the node key — no all-pairs anywhere.
Near-dup graphs have tiny diameter (dup chains of 2-5 docs), so 3-4
rounds suffice.  For adversarial graphs with long chains, swap the
update rule for alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce"), which converges in O(log n)
rounds with the same per-round shuffle shape; min-propagation is kept
here because the dedup workload never sees deep chains and the
constant factor is lower.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(sym_one_partition: DataFrame) -> DataFrame:
    """Union-find over a single-partition edge frame inside one
    mapInPandas task.  Input must already be coalesced to 1 partition
    (the caller guarantees the size gate)."""
    import pandas as pd

    def solve(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"], pdf["dst"]):
                s, d = int(s), int(d)
                parent.setdefault(s, s)
                parent.setdefault(d, d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[max(rs, rd)] = min(rs, rd)
        nodes = sorted(parent)
        yield pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="int64"),
                "component": pd.Series([find(n) for n in nodes], dtype="int64"),
            }
        )

    return sym_one_partition.mapInPandas(solve, "node long, component long")


def connected_components(
    edges: DataFrame, max_iter: int = 50, small_graph_edges: int = 250_000
) -> DataFrame:
    """Labels every node of the undirected graph `edges` (columns
    `src`, `dst`) with its component's minimum node id.  Returns
    (node, component).  Raises if not converged within `max_iter`
    rounds — a silent partial merge would corrupt dedup groups.

    Edge sets at or below `small_graph_edges` (after symmetrize +
    distinct) are solved by single-task union-find (one job); larger
    graphs run the distributed min-label iteration.  Pass
    small_graph_edges=0 to force the iterative path.

    The fast-path gate bounds ONE task's work: a python dict over up
    to 2x`small_graph_edges` nodes is ~100 B/entry, so the 250k
    default caps the task at ~50 MB / well under a second — sized for
    the motivating workload (near-dup candidate graphs of hundreds of
    edges) while leaving big margin before single-task memory or
    stragglers matter (ADVICE r4: the old 2M default admitted ~4M-node
    dicts, hundreds of MB on one core)."""
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    if small_graph_edges and sym.count() <= small_graph_edges:
        return _union_find_components(sym.coalesce(1))

    lab = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new = lab.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                "component", F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            F.col("component").alias("prev"),
        )
        new = new.localCheckpoint(eager=True)
        converged = new.filter(F.col("component") < F.col("prev")).isEmpty()
        lab = new.select("node", "component")
        if converged:
            return lab
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
