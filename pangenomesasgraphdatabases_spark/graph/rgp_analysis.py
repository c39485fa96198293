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


def insertion_dice_similarity(rgps: DataFrame, min_dice: float = 0.0) -> DataFrame:
    """J11: insertion x insertion Dice similarity over cluster-ID sets
    (RGPs.ipynb:2073-2098) in the explode -> equi-join -> group-count
    formulation.  Insertions are keyed by (strain, anchors, start)."""
    ins = rgps.select(
        F.concat_ws(
            "|", "StrainName", "Anchor1ID", "Anchor2ID", F.col("InsertionStart")
        ).alias("ins_id"),
        F.array_distinct("InsertionListClusterID").alias("cl"),
    )
    ex = ins.select("ins_id", F.explode("cl").alias("cluster_id"))
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


def complete_linkage_clusters(
    pair_distances: list[tuple[str, str, float]], threshold: float
) -> dict[str, int]:
    """F17: complete-linkage agglomerative clustering, driver-side, on
    a pre-aggregated pairwise distance list (the reference collects the
    insertion matrix into scipy linkage/fcluster, RGPs.ipynb:2671/2712;
    scipy is not in this container, so this is a small pure-python
    equivalent for the same O(n^2) input — gated to stay a boundary for
    provably small n).  The naive best-pair loop is O(n^3)-ish, so the
    gate admits only sizes it actually finishes in seconds (the r1
    gate of 20000 allowed inputs it could never complete)."""
    items = sorted({x for p in pair_distances for x in p[:2]})
    if len(items) > 2000:
        raise ValueError("driver-side clustering gated to n<=2000 items")
    dist = {}
    for a, b, d in pair_distances:
        dist[(a, b)] = d
        dist[(b, a)] = d

    def d_of(x, y):
        return dist.get((x, y), float("inf"))

    clusters: list[set[str]] = [{x} for x in items]
    while len(clusters) > 1:
        best = None
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                # complete linkage: max pairwise distance
                dmax = max(
                    d_of(x, y) for x in clusters[i] for y in clusters[j]
                )
                if best is None or dmax < best[0]:
                    best = (dmax, i, j)
        if best is None or best[0] > threshold:
            break
        _, i, j = best
        clusters[i] |= clusters[j]
        del clusters[j]
    return {x: idx for idx, c in enumerate(clusters) for x in c}


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
