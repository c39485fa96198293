"""All-pairs similarity joins (SURVEY.md J11/J12, F16).

The reference computes an insertion x insertion Dice matrix with a
nested Python loop (RGPs.ipynb:2073-2098) and a scipy pdist Jaccard
matrix (:2598).  Here both are the explode -> self-equi-join ->
group-count formulation, which shuffles on the shared element key and
scales out; the LSH variant for 100 TB lives in
pangenomesasgraphdatabases_spark.operators.dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register

# Shared CTE: distinct (orderkey, partkey) pairs for urgent orders.
_SETS_SQL = """
    sets AS (
        SELECT DISTINCT o.o_orderkey AS ok, l.l_partkey AS pk
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    sizes AS (SELECT ok, CAST(count(*) AS BIGINT) AS sz FROM sets GROUP BY ok),
    inter AS (
        SELECT a.ok AS ok1, b.ok AS ok2, CAST(count(*) AS BIGINT) AS n_common
        FROM sets a JOIN sets b ON a.pk = b.pk AND a.ok < b.ok
        GROUP BY a.ok, b.ok
    )
"""


def _element_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )


def _pair_counts(sets: DataFrame):
    """Intersection counts for every set pair sharing an element.

    r15 shape (guide §2.4, the canonical_pair_dedup array-surgery
    lesson applied to the posting list): one groupBy(pk) collects each
    element's sorted set-id posting list and the pair expansion is
    per-row array surgery — the former two-sided self-equi-join on pk
    executed the `sets` lineage twice and paid two exchanges plus a
    sort-merge join for the identical pair multiset (per pk the ids
    are distinct, so i<j over the sorted array IS a.ok < b.ok).

    r16 skew guard (VERDICT r15 #3, guide §2.5): the in-row expansion
    built the |L|^2/2 pair array as ONE flatten value, so a hot
    element's posting list risked executor OOM; the expansion now goes
    through operators.skew.capped_pair_rows, whose chunked form bounds
    every in-row pair batch at cap^2 while keeping the single-lineage
    no-join shape (and the exact pair multiset) unchanged."""
    from pangenomesasgraphdatabases_spark.operators.skew import (
        capped_pair_rows,
    )

    sizes = sets.groupBy("ok").agg(F.count(F.lit(1)).alias("sz"))
    posts = sets.groupBy("pk").agg(
        F.sort_array(F.collect_list("ok")).alias("oks")
    )
    inter = (
        capped_pair_rows(posts, "oks")
        .groupBy(F.col("lo").alias("ok1"), F.col("hi").alias("ok2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("ok").alias("ok1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("ok").alias("ok2"), F.col("sz").alias("sz2"))
    return inter.join(s1, "ok1").join(s2, "ok2")


@register(
    "dice_similarity_pairs",
    oracle=f"""
    WITH {_SETS_SQL}
    SELECT i.ok1, i.ok2, i.n_common,
           round(2.0 * i.n_common / (s1.sz + s2.sz), 4) AS dice
    FROM inter i
    JOIN sizes s1 ON i.ok1 = s1.ok
    JOIN sizes s2 ON i.ok2 = s2.ok
    WHERE 2.0 * i.n_common / (s1.sz + s2.sz) >= 0.25
    """,
    tags=("J11", "F16", "U3"),
)
def dice_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: all-pairs Dice similarity 2|A∩B|/(|A|+|B|) over element sets
    (RGPs.ipynb:2073-2098) via explode + self-equi-join + group-count."""
    pairs = _pair_counts(_element_sets(spark, sf_dir))
    dice = 2.0 * F.col("n_common") / (F.col("sz1") + F.col("sz2"))
    return pairs.filter(dice >= 0.25).select(
        "ok1", "ok2", "n_common", F.round(dice, 4).alias("dice")
    )


@register(
    "jaccard_distance_pairs",
    oracle=f"""
    WITH {_SETS_SQL}
    SELECT i.ok1, i.ok2,
           round(1.0 - CAST(i.n_common AS DOUBLE)
                 / (s1.sz + s2.sz - i.n_common), 4) AS jaccard_dist
    FROM inter i
    JOIN sizes s1 ON i.ok1 = s1.ok
    JOIN sizes s2 ON i.ok2 = s2.ok
    WHERE CAST(i.n_common AS DOUBLE) / (s1.sz + s2.sz - i.n_common) >= 0.2
    """,
    tags=("J12", "F16"),
)
def jaccard_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: all-pairs Jaccard distance 1-|∩|/|∪| (pdist 'jaccard',
    RGPs.ipynb:2598) from the same intersection counts."""
    pairs = _pair_counts(_element_sets(spark, sf_dir))
    jac = F.col("n_common").cast("double") / (
        F.col("sz1") + F.col("sz2") - F.col("n_common")
    )
    return pairs.filter(jac >= 0.2).select(
        "ok1", "ok2", F.round(1.0 - jac, 4).alias("jaccard_dist")
    )


@register(
    "pairwise_distance_within_group",
    oracle="""
    WITH members AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
        WHERE l_partkey < 30
    ),
    sup AS (SELECT s_suppkey, s_acctbal FROM supplier)
    SELECT m1.pk AS group_key, m1.sk AS sup1, m2.sk AS sup2,
           round(abs(a.s_acctbal - b.s_acctbal), 4) AS dist
    FROM members m1
    JOIN members m2 ON m1.pk = m2.pk AND m1.sk < m2.sk
    JOIN sup a ON m1.sk = a.s_suppkey
    JOIN sup b ON m2.sk = b.s_suppkey
    """,
    tags=("J10",),
)
def pairwise_distance_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: pairwise-distance join — all strain pairs sharing an anchor,
    joined to a precomputed distance table (tree.distance loop,
    RGPs.ipynb:1648-1663).  supplier acctbal-distance plays the
    broadcast tree-distance table."""
    li = table(spark, sf_dir, "lineitem")
    members = (
        li.filter(F.col("l_partkey") < 30)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    m1 = members.alias("m1")
    m2 = members.alias("m2")
    a = sup.alias("a")
    b = sup.alias("b")
    return (
        m1.join(m2, (F.col("m1.pk") == F.col("m2.pk")) & (F.col("m1.sk") < F.col("m2.sk")))
        .join(F.broadcast(a), F.col("m1.sk") == F.col("a.s_suppkey"))
        .join(F.broadcast(b), F.col("m2.sk") == F.col("b.s_suppkey"))
        .select(
            F.col("m1.pk").alias("group_key"),
            F.col("m1.sk").alias("sup1"),
            F.col("m2.sk").alias("sup2"),
            F.round(F.abs(F.col("a.s_acctbal") - F.col("b.s_acctbal")), 4).alias("dist"),
        )
    )
