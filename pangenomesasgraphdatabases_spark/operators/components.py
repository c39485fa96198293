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

Scale notes (100 TB): the per-round cost is one shuffle of |E| + |V|
on the node key — no all-pairs anywhere.  Near-dup graphs have tiny
diameter (dup chains of 2-5 docs), so 3-4 rounds suffice.  For
adversarial graphs with long chains, swap the update rule for
alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce"), which converges in O(log n) rounds with the
same per-round shuffle shape; min-propagation is kept here because the
dedup workload never sees deep chains and the constant factor is
lower.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Labels every node of the undirected graph `edges` (columns
    `src`, `dst`) with its component's minimum node id.  Returns
    (node, component).  Raises if not converged within `max_iter`
    rounds — a silent partial merge would corrupt dedup groups."""
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

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
