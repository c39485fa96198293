"""RGP post-processing analytics (03_analyses/RGPs.ipynb cells 13-117).

The reference pulls the RGP result into pandas and loops; here every
insertion-level computation stays a DataFrame op — arrays are reduced
with higher-order functions, pair logic is join-shaped, and only the
final hierarchical clustering collects (a documented driver boundary
on a provably small, pre-aggregated frame; SURVEY.md F17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _arr_mean(col):
    return F.aggregate(
        col, F.lit(0.0), lambda acc, x: acc + x, lambda acc: acc / F.size(col)
    )


def _arr_std(col):
    """Sample stddev of an array column via sum of squares."""
    n = F.size(col)
    s = F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt((ss - s * s / n) / (n - 1))


def insertion_ttests(rgps: DataFrame, n_strain: int = 5000) -> DataFrame:
    """F14: two-sample t + two-sided p of each insertion's GC/CAI list
    against the strain background from summary stats (RGPs.ipynb cell
    19, :1033-1077: scipy ttest_ind_from_stats with its DEFAULT
    equal_var=True — pooled Student's t, not Welch — nobs1 =
    InsertionNbFeatures, nobs2 hardcoded to 5000).  Pure column math
    over the array columns — no scipy, no collect; the p-value uses the
    shared approximation in functions/stats.py (error < 1e-4 at these
    df).  Reference quirks kept: list means/stdevs skip None elements
    while nobs1 stays InsertionNbFeatures, and an insertion too short
    for a stdev (n<2) yields NULL (the reference's NaN except-path)."""
    from pangenomesasgraphdatabases_spark.functions.stats import t_pvalue_col

    gc, cai = F.col("InsertionListGC"), F.col("InsertionListCAI")
    n1 = F.col("InsertionNbFeatures").cast("double")
    n2 = F.lit(float(n_strain))

    def pooled(list_col, mu_col, sd_col):
        vals = F.filter(list_col, lambda x: x.isNotNull())
        m1 = _arr_mean(vals)
        s1 = _arr_std(vals)
        v1, v2 = s1 * s1, F.col(sd_col) * F.col(sd_col)
        sp2 = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
        t = (m1 - F.col(mu_col)) / F.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
        t = F.when((F.size(vals) > 1) & (n1 > 1), t)
        return t, t_pvalue_col(t, n1 + n2 - 2.0)

    t_gc, p_gc = pooled(gc, "StrainAvgGC", "StrainStDevGC")
    t_cai, p_cai = pooled(cai, "StrainAvgCAI", "StrainStDevCAI")
    return rgps.select(
        "StrainName",
        "Anchor1ID",
        "Anchor2ID",
        "InsertionStart",
        "InsertionEnd",
        F.size(gc).alias("n_features"),
        _arr_mean(gc).alias("insertion_avg_GC"),
        t_gc.alias("t_GC"),
        p_gc.alias("p_GC"),
        _arr_mean(cai).alias("insertion_avg_CAI"),
        t_cai.alias("t_CAI"),
        p_cai.alias("p_CAI"),
    )


def anchor_pair_distance_stats(rgps: DataFrame, tree_distances: DataFrame) -> DataFrame:
    """J10 + A7: for each anchor pair, pairwise phylogenetic distances
    between the strains carrying an insertion there, reduced to
    min/avg/max (RGPs.ipynb cells 48-51).  tree_distances is the
    broadcast S10 table (symmetric)."""
    membership = rgps.select(
        "Anchor1ID", "Anchor2ID", F.col("StrainName").alias("strain")
    ).distinct()
    a = membership.alias("a")
    b = membership.alias("b")
    pairs = a.join(
        b,
        (F.col("a.Anchor1ID") == F.col("b.Anchor1ID"))
        & (F.col("a.Anchor2ID") == F.col("b.Anchor2ID"))
        & (F.col("a.strain") < F.col("b.strain")),
    ).select(
        F.col("a.Anchor1ID").alias("Anchor1ID"),
        F.col("a.Anchor2ID").alias("Anchor2ID"),
        F.col("a.strain").alias("strain1"),
        F.col("b.strain").alias("strain2"),
    )
    j = pairs.join(F.broadcast(tree_distances), ["strain1", "strain2"])
    return j.groupBy("Anchor1ID", "Anchor2ID").agg(
        F.min("distance").alias("min_dist"),
        F.avg("distance").alias("avg_dist"),
        F.max("distance").alias("max_dist"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def insertion_dice_similarity(
    rgps: DataFrame,
    min_dice: float = 0.0,
    max_pair_fanout: int | None = 100_000_000,
) -> DataFrame:
    """J11: insertion x insertion Dice similarity over cluster-ID sets
    (RGPs.ipynb:2073-2098) in the explode -> equi-join -> group-count
    formulation.  Insertions are keyed by (strain, anchors, start).

    The equi-join on cluster_id only pairs insertions that actually
    share a cluster, but a cluster carried by f insertions fans out to
    f^2 join rows — with `max_pair_fanout` set (default 1e8), the exact
    fan-out sum(f_c^2) is pre-computed on the small exploded frame and
    the function refuses oversized inputs instead of silently launching
    an unbounded join (VERDICT r1 gate request).  Pass None to skip the
    pre-check job."""
    ins = rgps.select(
        F.concat_ws(
            "|", "StrainName", "Anchor1ID", "Anchor2ID", F.col("InsertionStart")
        ).alias("ins_id"),
        F.array_distinct("InsertionListClusterID").alias("cl"),
    )
    ex = ins.select("ins_id", F.explode("cl").alias("cluster_id"))
    if max_pair_fanout is not None:
        fanout_row = (
            ex.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("f"))
            .agg(F.sum(F.col("f") * F.col("f")).alias("fanout"))
            .first()
        )
        fanout = fanout_row.fanout or 0
        if fanout > max_pair_fanout:
            raise ValueError(
                f"dice pair fan-out {fanout} exceeds gate {max_pair_fanout}; "
                "prune hot clusters or raise/disable max_pair_fanout"
            )
    sizes = ex.groupBy("ins_id").agg(F.count(F.lit(1)).alias("sz"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.ins_id") < F.col("b.ins_id")),
        )
        .groupBy(F.col("a.ins_id").alias("ins1"), F.col("b.ins_id").alias("ins2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("ins_id").alias("ins1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("ins_id").alias("ins2"), F.col("sz").alias("sz2"))
    dice = 2.0 * F.col("n_common") / (F.col("sz1") + F.col("sz2"))
    return (
        inter.join(s1, "ins1")
        .join(s2, "ins2")
        .select("ins1", "ins2", "n_common", dice.alias("dice"))
        .filter(F.col("dice") >= min_dice)
    )


# Hard limits of the driver-side exact algorithm: ~100 B/dict-entry
# puts a 20k x avg-degree adjacency comfortably in driver memory; 2e6
# collected pair rows is ~100 MB.  linkage_clusters_scalable clamps
# caller-supplied gates to these so oversized requests fall back to the
# distributed path instead of raising here.
_EXACT_MAX_ITEMS = 20_000
_EXACT_MAX_PAIRS = 2_000_000


def complete_linkage_clusters(
    pair_distances: list[tuple[str, str, float]], threshold: float
) -> dict[str, int]:
    """F17: complete-linkage agglomerative clustering, driver-side, on
    a pre-aggregated pairwise distance list (the reference collects the
    insertion matrix into scipy linkage/fcluster(t, 'distance'),
    RGPs.ipynb:2671/2712; scipy is absent in this container).

    Nearest-neighbor-chain algorithm: complete linkage is reducible, so
    NN-chain produces the same dendrogram as the greedy best-pair loop
    in O(n * avg_degree) work instead of O(n^3) (VERDICT r1: the naive
    loop's gate admitted inputs it could never finish).  Missing pairs
    are infinitely distant; a cluster with no finite neighbor retires
    immediately.  The partition is the fcluster-style cut: union of all
    merges at height <= threshold (complete linkage is monotone, so
    cutting the full dendrogram equals stopping at the threshold).
    Merge order on exact ties may differ from scipy's, which can only
    affect pairs tied exactly at the threshold."""
    items = sorted({x for p in pair_distances for x in p[:2]})
    n = len(items)
    if n > _EXACT_MAX_ITEMS or len(pair_distances) > _EXACT_MAX_PAIRS:
        raise ValueError(
            "driver-side clustering gated to "
            f"n<={_EXACT_MAX_ITEMS} items / {_EXACT_MAX_PAIRS} pairs"
        )
    idx = {x: i for i, x in enumerate(items)}
    inf = float("inf")
    dist: list[dict[int, float]] = [{} for _ in range(n)]
    for a, b, d in pair_distances:
        i, j = idx[a], idx[b]
        if i == j:
            continue
        if d < dist[i].get(j, inf):
            dist[i][j] = d
            dist[j][i] = d

    alive = set(range(n))
    merges: list[tuple[int, int, float]] = []
    chain: list[int] = []
    while len(alive) > 1:
        if not chain:
            chain.append(min(alive))
        while True:
            a = chain[-1]
            best, bd = None, inf
            for c, d in dist[a].items():
                if c in alive and (d < bd or (d == bd and (best is None or c < best))):
                    best, bd = c, d
            if best is None:
                # No finite neighbor: this cluster can never merge
                # below any threshold — retire it.
                alive.discard(a)
                chain.clear()
                break
            # Reciprocal nearest neighbors (tie-safe: accept the
            # predecessor whenever it sits at the chain-minimum
            # distance, preventing tie cycles).
            if len(chain) >= 2 and dist[a].get(chain[-2], inf) == bd:
                b_ = chain[-2]
                chain.pop()
                chain.pop()
                merges.append((a, b_, bd))
                # Lance-Williams (complete): d(a∪b, c) = max(da, db).
                alive.discard(b_)
                merged: dict[int, float] = {}
                for c in set(dist[a]) | set(dist[b_]):
                    if c not in alive or c == a:
                        continue
                    da, db = dist[a].get(c, inf), dist[b_].get(c, inf)
                    m = da if da > db else db
                    if m < inf:
                        merged[c] = m
                for c in set(dist[a]) | set(dist[b_]):
                    dist[c].pop(a, None)
                    dist[c].pop(b_, None)
                dist[a] = merged
                for c, m in merged.items():
                    dist[c][a] = m
                break
            chain.append(best)

    # fcluster(t, 'distance') cut via union-find over merge heights.
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b_, d in merges:
        if d <= threshold:
            ra, rb = find(a), find(b_)
            if ra != rb:
                parent[rb] = ra

    roots: dict[int, int] = {}
    out: dict[str, int] = {}
    for x in items:
        r = find(idx[x])
        if r not in roots:
            roots[r] = len(roots)
        out[x] = roots[r]
    return out


# Round cap for the distributed parallel-RNN merge loop over
# pathological (percolating) components.  Each round merges EVERY
# mutual-nearest-neighbor cluster pair at once, so compact percolating
# blobs converge in O(log n) rounds; only an adversarial chain with
# strictly increasing consecutive distances needs one round per merge.
# Past the cap the still-unfinished components fall back to the
# single-linkage coarsening, flagged approx per component — the cap
# bounds the number of Spark jobs, never correctness.
_RNN_MAX_ROUNDS = 48
# Stall-bail floor: a stalled loop (<= 2 merges/round, 4 rounds
# running) only coarsens early when MORE than this many clusters still
# hold mergeable edges — small tails and small legitimate chains run
# to convergence.
_RNN_STALL_MIN_CLUSTERS = 256


def _parallel_rnn_cut(
    big_cpairs: DataFrame,
    big_members: DataFrame,
    threshold: float,
    max_rounds: int = _RNN_MAX_ROUNDS,
) -> tuple[DataFrame, DataFrame | None]:
    """Distributed EXACT complete-linkage cut over components too big
    for one applyInPandas group (VERDICT r11 #5 — the percolating
    residue, reference RGPs.ipynb:2671 fcluster cut).

    Parallel nearest-neighbor merging: complete linkage is REDUCIBLE
    (d(A+B, X) = max(d(A,X), d(B,X)) never shrinks below either
    input), so merging every mutual-nearest-neighbor cluster pair
    concurrently yields the same dendrogram as any sequential order —
    the same property the driver-side NN-chain exploits, fanned out.
    State lives in two bounded frames, re-aggregated per round:

    * ``members (component, item, cl)`` — current cluster label per
      item (label = lexicographic-min member, the output contract);
    * ``cedges (component, ca, cb, n_cross, dmax)`` — cluster-level
      edges aggregated from the <= threshold pair graph.

    A cluster pair is MERGEABLE iff ``n_cross == size_a * size_b``
    (every cross pair present, i.e. every cross distance <= t — the
    complete-linkage requirement; any missing pair means the cluster
    distance exceeds the cut and the exact value is irrelevant) —
    then its distance is ``dmax``.  Each round: per-cluster argmin by
    ``(dmax, neighbor)`` over mergeable edges, mutual pairs merge to
    the min label, edges re-aggregate with sum/max (Lance-Williams
    for complete linkage IS max).  A mutual pair always exists while
    mergeable edges remain (the pointer cycle argument: distances
    non-increasing around any nn-pointer cycle forces all-equal, and
    the neighbor tie-break then forces a 2-cycle), so every round
    makes progress.  Exact ties between DIFFERENT cluster pairs may
    merge in a different order than the NN-chain twin — ambiguous in
    scipy too; can only affect pairs tied exactly at the threshold.

    Memory per task is bounded by the shuffle partition, never the
    component: no component's pairs ever assemble in one buffer —
    this is the path the 20k-item/2M-pair applyInPandas gate exists
    to protect, removed rather than widened.

    Returns ``(labels, unfinished)``: labels ``(component, item,
    cl)`` for every big-component item after convergence or the round
    cap, and a distinct-``component`` frame of still-unfinished
    components (None when the loop converged everywhere)."""
    members = big_members.select(
        "component", "item", F.col("item").alias("cl")
    ).localCheckpoint(eager=True)
    # Defensive: the mergeability invariant (n_cross == size_a*size_b
    # means every cross distance <= threshold) only holds when the
    # input pair graph is pre-cut at the threshold.  The caller
    # (linkage_clusters_scalable) already filters; enforcing it here
    # keeps a future caller from feeding an unfiltered pair frame and
    # silently over-merging (ADVICE r12).
    big_cpairs = big_cpairs.filter(F.col("dist") <= F.lit(threshold))
    cedges = (
        big_cpairs.select(
            "component",
            F.least("item1", "item2").alias("ca"),
            F.greatest("item1", "item2").alias("cb"),
            "dist",
        )
        .groupBy("component", "ca", "cb")
        # Initial clusters are singletons, so every DISTINCT unordered
        # pair contributes exactly one cross edge — n_cross is 1 by
        # definition, NOT the input row count: a duplicated pair row
        # would otherwise inflate n_cross past size_a*size_b and make
        # the pair permanently unmergeable (silent coarsening).  A
        # dup with conflicting distances takes the max — the
        # complete-linkage-consistent reading of ill-defined input
        # (the driver NN-chain's dict is last-row-wins there).
        .agg(F.max("dist").alias("dmax"))
        .withColumn("n_cross", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )

    def _mergeable(cedges: DataFrame, sizes: DataFrame) -> DataFrame:
        return (
            cedges.join(
                sizes.select(
                    "component",
                    F.col("cl").alias("ca"),
                    F.col("sz").alias("_sza"),
                ),
                ["component", "ca"],
            )
            .join(
                sizes.select(
                    "component",
                    F.col("cl").alias("cb"),
                    F.col("sz").alias("_szb"),
                ),
                ["component", "cb"],
            )
            .filter(F.col("n_cross") == F.col("_sza") * F.col("_szb"))
            .select("component", "ca", "cb", "dmax")
        )

    sizes = members.groupBy("component", "cl").agg(
        F.count(F.lit(1)).alias("sz")
    )
    converged = False
    # Stall detector: a CHAIN-shaped component admits only ~1 mutual
    # pair per round, so a large one would burn the whole round budget
    # making no real progress before coarsening anyway.  If 4
    # consecutive rounds each merged <= 2 pairs while many clusters
    # still hold mergeable edges (> _RNN_STALL_MIN_CLUSTERS — small
    # near-converged tails and small legit chains are exempt), bail to
    # the coarsening fallback early.  Only ever trades exactness the
    # cap would also have traded, for far fewer wasted Spark jobs.
    stall = 0
    for _ in range(max_rounds):
        mergeable = _mergeable(cedges, sizes)
        directed = mergeable.select(
            "component", F.col("ca").alias("c"), F.col("cb").alias("nb"), "dmax"
        ).unionByName(
            mergeable.select(
                "component",
                F.col("cb").alias("c"),
                F.col("ca").alias("nb"),
                "dmax",
            )
        )
        nn = (
            directed.groupBy("component", "c")
            .agg(F.min(F.struct("dmax", "nb")).alias("m"))
            .select("component", "c", F.col("m.nb").alias("nb"))
        )
        mutual = (
            nn.join(
                nn.select(
                    "component",
                    F.col("nb").alias("c"),
                    F.col("c").alias("nb"),
                ),
                ["component", "c", "nb"],
            )
            .filter(F.col("c") < F.col("nb"))
            .localCheckpoint(eager=True)
        )
        if mutual.isEmpty():
            converged = True
            break
        n_merges = mutual.agg(F.count(F.lit(1))).first()[0]
        if n_merges <= 2:
            stall += 1
            if stall >= 4:
                n_cl = (
                    mergeable.select("component", F.col("ca").alias("cl"))
                    .unionByName(
                        mergeable.select(
                            "component", F.col("cb").alias("cl")
                        )
                    )
                    .distinct()
                    .agg(F.count(F.lit(1)))
                    .first()[0]
                )
                if n_cl > _RNN_STALL_MIN_CLUSTERS:
                    break
                stall = 0
        else:
            stall = 0
        relabel = mutual.select(
            "component", F.col("nb").alias("old"), F.col("c").alias("new")
        )
        members = (
            members.join(
                relabel.withColumnRenamed("old", "cl"),
                ["component", "cl"],
                "left",
            )
            .select(
                "component", "item", F.coalesce("new", "cl").alias("cl")
            )
            .localCheckpoint(eager=True)
        )
        cedges = (
            cedges.join(
                relabel.select(
                    "component",
                    F.col("old").alias("ca"),
                    F.col("new").alias("_na"),
                ),
                ["component", "ca"],
                "left",
            )
            .join(
                relabel.select(
                    "component",
                    F.col("old").alias("cb"),
                    F.col("new").alias("_nb"),
                ),
                ["component", "cb"],
                "left",
            )
            .select(
                "component",
                F.coalesce("_na", "ca").alias("_x"),
                F.coalesce("_nb", "cb").alias("_y"),
                "n_cross",
                "dmax",
            )
            .filter(F.col("_x") != F.col("_y"))
            .select(
                "component",
                F.least("_x", "_y").alias("ca"),
                F.greatest("_x", "_y").alias("cb"),
                "n_cross",
                "dmax",
            )
            .groupBy("component", "ca", "cb")
            .agg(
                F.sum("n_cross").alias("n_cross"),
                F.max("dmax").alias("dmax"),
            )
            .localCheckpoint(eager=True)
        )
        sizes = members.groupBy("component", "cl").agg(
            F.count(F.lit(1)).alias("sz")
        )
    if converged:
        return members, None
    leftover = _mergeable(cedges, sizes)
    unfinished = (
        leftover.select("component").distinct().localCheckpoint(eager=True)
    )
    if unfinished.isEmpty():
        return members, None
    return members, unfinished


def _exact_rows_within_gates(
    rows: list[tuple], max_items: int, max_pairs: int
) -> bool:
    """TRUE-size re-check on the collected pair rows (free at that
    point): the pre-collect gate counts items with
    ``approx_count_distinct`` + a 5% margin, so an undercount past
    ~5 sigma — or a caller-supplied ``exact_max_items`` tighter than
    the approximation resolved — could otherwise run the NN-chain
    oversized.  Falling back keeps the documented contract: exact path
    only within the gates (VERDICT r7 #6 / ADVICE r7)."""
    true_items = len({it for r in rows for it in (r[0], r[1])})
    return true_items <= max_items and len(rows) <= max_pairs


def linkage_clusters_scalable(
    pair_distances: DataFrame,
    threshold: float,
    exact_max_items: int = _EXACT_MAX_ITEMS,
    exact_max_pairs: int = _EXACT_MAX_PAIRS,
    exact_ids: bool = False,
) -> DataFrame:
    """F17 with a scale path (VERDICT r4 #4): cluster items from a
    pairwise-distance frame ``(item1, item2, dist)`` at ``threshold``.

    Inputs inside the exact gates run the driver-side complete-linkage
    NN-chain (:func:`complete_linkage_clusters`, the reference's scipy
    fcluster cut, RGPs.ipynb:2671/2712) — ``approx = false``.

    Larger inputs run the DISTRIBUTED EXACT path (VERDICT r10 #5):
    the fcluster-style cut at ``threshold`` is fully determined by the
    pairs with ``dist <= threshold`` — a complete-linkage merge at
    height h requires EVERY cross pair <= h, so every cluster in the
    cut is internally all-<=threshold and therefore confined to one
    connected component of the <=threshold pair graph, and no merge
    across components can land at or below the cut.  Hence: connected
    components over the close-pair graph, then the SAME NN-chain run
    independently per component (``applyInPandas`` over the component
    key — parallel, executor-side, each component's pair list bounded
    by the per-component gates).  Output is exactly the global cut,
    ``approx = false``; isolated items are singleton clusters, also
    exact.  A PATHOLOGICAL component — one exceeding the
    per-component gates, i.e. the <=threshold graph percolates — runs
    the distributed parallel-RNN merge loop (:func:`_parallel_rnn_cut`,
    r12): still the exact cut, with per-task memory bounded by the
    shuffle partition instead of the component.  Only a component
    unfinished after ``_RNN_MAX_ROUNDS`` rounds (adversarial chain
    structure: one merge per round) keeps the single-linkage
    coarsening (the whole component becomes one cluster) and is
    flagged ``approx = true``; the flag is per-component, not
    per-run.

    MEASURED divergence of that coarsening (VERDICT r9 #4 — now
    reachable only through a pathological component; fixtures
    and exact numbers pinned by tests/test_linkage.py::
    test_single_linkage_divergence_is_measured — "split pairs" are
    item pairs complete-linkage co-clusters but the approximation
    separates, "over-merge rate" is the fraction of approx co-clustered
    pairs that exact complete linkage does NOT co-cluster):

    ======================================  ===========  ================
    fixture family                          split pairs  over-merge rate
    ======================================  ===========  ================
    well-separated blobs (diam <= 0.3t)          0            0.000
    chain, consecutive dist 0.9t (n=40)          0            0.974
    2D geometric, above percolation (t so        0            0.980
    the <=t graph spans all 200 points)
    2D geometric, below percolation              0            0.565
    (same points, t halved)
    ======================================  ===========  ================

    Reading: when true clusters are compact and separated (the RGP
    insertion-similarity regime the reference's fcluster cut targets,
    RGPs.ipynb:2712), the fallback is EXACT in practice; divergence is
    driven entirely by chain/percolation structure at the threshold —
    if the <=t pair graph percolates, single linkage degenerates
    toward one component and the approx flag must be treated as
    "upper envelope", not "almost complete-linkage".

    Returns ``(item, cluster, approx)`` where ``cluster`` is the
    lexicographic-min member — a deterministic label under both paths.
    Node ids for the distributed path come from ``xxhash64(item)``
    (collision odds ~n^2/2^64; a collision could merge two clusters).
    Pass ``exact_ids=True`` to assign collision-free ids instead
    (``monotonically_increasing_id`` pinned by a localCheckpoint so
    every branch of the plan sees the same assignment) — one extra
    materialization, zero collision odds; the output labels are
    unaffected either way because ``cluster`` is always the min item
    STRING of the component, never the internal id.

    Gate order (ADVICE r5, folded to ONE action in r7 per VERDICT r6
    #4): both gates — pair count AND distinct item count — come from a
    single aggregation job over the exploded endpoint column (exact
    pair count + ``approx_count_distinct(rsd=0.01)`` item count)
    BEFORE any collect, so the gate costs one pass instead of the two
    separate ``count()`` jobs it used to run.  The approximate item
    count carries a 5% safety margin (~5 sigma at rsd 0.01) against
    undercount, and the exact path still re-checks the true size after
    collecting — an undercount past the margin falls through to the
    distributed path instead of raising.  Caller-supplied gates are
    clamped to the exact algorithm's hard limits so oversized values
    fall back to the distributed path instead of raising."""
    exact_max_items = min(exact_max_items, _EXACT_MAX_ITEMS)
    exact_max_pairs = min(exact_max_pairs, _EXACT_MAX_PAIRS)
    spark = pair_distances.sparkSession
    gate = (
        pair_distances.select(
            F.explode(F.array("item1", "item2")).alias("item")
        )
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("pairs"),
            F.approx_count_distinct("item", 0.01).alias("items_approx"),
        )
        .first()
    )
    if (
        gate["pairs"] <= exact_max_pairs
        and gate["items_approx"] * 1.05 <= exact_max_items
    ):
        rows = [
            (r[0], r[1], float(r[2]))
            for r in pair_distances.select("item1", "item2", "dist").collect()
        ]
        labels = None
        if _exact_rows_within_gates(rows, exact_max_items, exact_max_pairs):
            labels = complete_linkage_clusters(rows, threshold)
        if labels is not None:
            rep: dict[int, str] = {}
            for it, lab in labels.items():
                rep[lab] = min(rep.get(lab, it), it)
            return spark.createDataFrame(
                [(it, rep[lab], False) for it, lab in labels.items()],
                "item string, cluster string, approx boolean",
            )

    all_items = (
        pair_distances.select(F.col("item1").alias("item"))
        .unionByName(pair_distances.select(F.col("item2").alias("item")))
        .distinct()
    )
    if exact_ids:
        ids = all_items.select(
            "item", F.monotonically_increasing_id().alias("nid")
        ).localCheckpoint(eager=True)
    else:
        ids = all_items.select("item", F.xxhash64("item").alias("nid"))
    close = pair_distances.filter(F.col("dist") <= F.lit(threshold))
    edges = (
        close.join(
            ids.select(F.col("item").alias("item1"), F.col("nid").alias("src")),
            "item1",
        )
        .join(
            ids.select(F.col("item").alias("item2"), F.col("nid").alias("dst")),
            "item2",
        )
        .select("src", "dst")
    )
    from pangenomesasgraphdatabases_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(edges)
    membership = ids.join(
        comp.withColumnRenamed("node", "nid"), "nid"
    ).select("item", "component")
    cpairs = close.join(
        membership.select(
            F.col("item").alias("item1"), "component"
        ),
        "item1",
    ).select("component", "item1", "item2", "dist")

    # Per-component gates are enforced IN THE PLAN, before any pandas
    # materialization: a pathological (percolating) component's pair
    # rows must never be loaded into one in-memory group just to
    # discover it is oversized — that is exactly the input the
    # fallback exists for.  One narrow agg per component, then the
    # big set routes to the fully distributed single-linkage labeling
    # (the component IS the cluster: groupBy min) and only gate-sized
    # components reach applyInPandas.
    max_items, max_pairs = exact_max_items, exact_max_pairs
    comp_stats = (
        membership.groupBy("component")
        .agg(F.count(F.lit(1)).alias("_ni"))
        .join(
            cpairs.groupBy("component").agg(F.count(F.lit(1)).alias("_np")),
            "component",
            "left",
        )
        .select(
            "component",
            (
                (F.col("_ni") > F.lit(max_items))
                | (F.coalesce("_np", F.lit(0)) > F.lit(max_pairs))
            ).alias("_big"),
        )
    )
    big = comp_stats.filter(F.col("_big")).select("component")

    def cluster_component(pdf):
        import pandas as pd  # noqa: PLC0415 (executor-side import)

        rows = list(
            zip(pdf["item1"], pdf["item2"], (float(d) for d in pdf["dist"]))
        )
        labels = complete_linkage_clusters(rows, threshold)
        rep: dict[int, str] = {}
        for it, lab in labels.items():
            rep[lab] = min(rep.get(lab, it), it)
        return pd.DataFrame(
            {
                "item": list(labels),
                "cluster": [rep[labels[it]] for it in labels],
                "approx": [False] * len(labels),
            }
        )

    exact_part = (
        cpairs.join(big, "component", "left_anti")
        .groupBy("component")
        .applyInPandas(
            cluster_component, "item string, cluster string, approx boolean"
        )
    )
    # Pathological components (r12, VERDICT r11 #5): the distributed
    # parallel-RNN merge loop computes the EXACT complete-linkage cut
    # for components past the applyInPandas gates — bounded memory
    # per task, every mutual-NN cluster pair merged per round.  Only
    # a component still unfinished at the round cap (adversarial
    # chain structure) keeps the single-linkage coarsening — the
    # whole component one cluster (min-item label), flagged approx —
    # as distributed joins/aggs, never a driver or single-task pandas
    # materialization (divergence table above).
    big = big.localCheckpoint(eager=True)
    clustered = exact_part
    if not big.isEmpty():
        big_members = membership.join(big, "component")
        rnn_labels, unfinished = _parallel_rnn_cut(
            cpairs.join(big, "component"),
            big_members,
            threshold,
            # read the module global at call time so tests can pin the
            # cap (0 = the pre-r12 pure-coarsening behavior)
            max_rounds=_RNN_MAX_ROUNDS,
        )
        if unfinished is not None:
            rnn_labels = rnn_labels.join(unfinished, "component", "left_anti")
            unf_members = big_members.join(unfinished, "component")
            unf_rep = unf_members.groupBy("component").agg(
                F.min("item").alias("cluster")
            )
            approx_part = unf_members.join(unf_rep, "component").select(
                "item", "cluster", F.lit(True).alias("approx")
            )
            clustered = clustered.unionByName(approx_part)
        rnn_exact = rnn_labels.select(
            "item",
            F.col("cl").alias("cluster"),
            F.lit(False).alias("approx"),
        )
        clustered = clustered.unionByName(rnn_exact)
    # Isolated items (no pair within threshold) are their own singleton
    # cluster — exact under complete linkage, not an approximation.
    close_items = (
        close.select(F.col("item1").alias("item"))
        .unionByName(close.select(F.col("item2").alias("item")))
        .distinct()
    )
    singles = all_items.join(close_items, "item", "left_anti").select(
        "item", F.col("item").alias("cluster"), F.lit(False).alias("approx")
    )
    return clustered.unionByName(singles)


def core_clusters_per_group(
    insertion_groups: DataFrame,
    rgps: DataFrame,
    clusters: DataFrame,
    frac: float = 0.95,
) -> DataFrame:
    """A9-A11 + J15 (RGPs.ipynb cells 107-114): per insertion group,
    the clusters present in more than `frac` of the group's insertions,
    enriched with cluster metadata.

    The reference pivots to a dense insertion x cluster matrix, prunes
    zero columns (A9), counts non-zeros (A10), selects >95% columns
    (A11) and then point-looks-up each cluster (J15 loop).  Long form
    here: explode + distinct -> group counts -> having filter -> one
    metadata join.

    insertion_groups: (ins_id, group_id) — e.g. from
    complete_linkage_clusters over insertion_dice_similarity output.
    """
    ins = rgps.select(
        F.concat_ws(
            "|", "StrainName", "Anchor1ID", "Anchor2ID", F.col("InsertionStart")
        ).alias("ins_id"),
        F.explode(F.array_distinct("InsertionListClusterID")).alias("cluster_id"),
    )
    with_groups = ins.join(insertion_groups, "ins_id")
    sizes = (
        with_groups.select("group_id", "ins_id")
        .distinct()
        .groupBy("group_id")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    counts = with_groups.groupBy("group_id", "cluster_id").agg(
        F.countDistinct("ins_id").alias("n_insertions")
    )
    core = counts.join(sizes, "group_id").filter(
        F.col("n_insertions") > frac * F.col("group_size")
    )
    meta = clusters.select("cluster_id", "description", "number_genomes")
    return core.join(F.broadcast(meta), "cluster_id", "left").select(
        "group_id",
        "cluster_id",
        "n_insertions",
        "group_size",
        "description",
        "number_genomes",
    )
