"""Core relational operators (SURVEY.md sections 2.2, 2.3, 2.4, 2.6, 2.7)
mapped onto the driver's star schema.

Each query cites the reference operator id it re-expresses; the domain
-shaped implementations live in pangenomesasgraphdatabases_spark.graph,
these star-schema isomorphs provide the DuckDB-oracle correctness gate
(FIXTURES.md section 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register


# --------------------------------------------------------------------------
# Projections / filters (P1-P7)
# --------------------------------------------------------------------------

@register(
    "typed_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           upper(l_returnflag) AS flag,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price
    FROM lineitem
    """,
    tags=("P1", "P2"),
)
def typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: column projection + rename + explicit casts.

    Reference: pirateToDatabase.py:25-28 (usecols + rename),
    01_creatingDatabase.cypher:4-14 (toInteger/toString cast blocks).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.upper("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double").alias("net_price"),
    )


@register(
    "threshold_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size > 40 OR p_retailprice > 1200.0
    """,
    tags=("P3",),
)
def threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: numeric threshold filter (c.number_genomes > 0.95*770,
    RGPs.ipynb:452)."""
    p = table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") > 40) | (F.col("p_retailprice") > 1200.0)).select(
        "p_partkey", "p_name", "p_size"
    )


@register(
    "contains_predicate",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%green%' OR p_name LIKE '%red%'
    """,
    tags=("P6",),
)
def contains_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: string-contains predicate (name CONTAINS 'integrase' OR
    'transposase', RGPs.ipynb:466)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").contains("green") | F.col("p_name").contains("red")
    ).select("p_partkey", "p_name")


@register(
    "null_predicate_backfill",
    oracle="""
    SELECT c.c_custkey, coalesce(o.order_count, 0) AS order_count,
           CASE WHEN o.order_count IS NULL THEN 1 ELSE 0 END AS is_orderless
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_count
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("P5", "J4", "J5"),
)
def null_predicate_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J4/J5: left outer join with null-indicator + coalesce backfill.

    Reference: pirateToDatabase.py:238-240 (left merge with indicator),
    01_creatingDatabase.cypher:131 (IS NULL backfill).
    """
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.when(F.col("order_count").isNull(), 1).otherwise(0).alias("is_orderless"),
    )


# --------------------------------------------------------------------------
# Joins (J1, J7, J8, semi, self-join J3, J16)
# --------------------------------------------------------------------------

@register(
    "multiway_join_revenue",
    oracle="""
    SELECT n.n_name, r.r_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("J1", "J7", "A1"),
)
def multiway_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: graph pattern as multi-way equi-join (feature-cluster-strain
    chains, 01_creatingDatabase.cypher:61-68, RGPs.ipynb:470).

    nation/region are tiny dims -> broadcast (SURVEY.md section 4).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "anti_join_orderless",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    tags=("J8",),
)
def anti_join_orderless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: anti-join (features without ORTHOLOG edge,
    01_creatingDatabase.cypher:71-72) — customers with no urgent order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "semi_join_active_parts",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
    tags=("J8", "J15"),
)
def semi_join_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join / point-lookup-join batch form (J15: N point lookups
    collapse to one join, RGPs.ipynb:3381-3402)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


@register(
    "self_join_adjacent",
    oracle="""
    SELECT a.l_orderkey AS okey,
           a.l_linenumber AS src_line, b.l_linenumber AS dst_line,
           a.l_partkey AS src_part, b.l_partkey AS dst_part
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
    """,
    tags=("J3",),
)
def self_join_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: self-join with aliases (alignedSeq x alignedSeq,
    pirateToDatabase.py:131-132); adjacency within a group."""
    li = table(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") + 1 == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("okey"),
        F.col("a.l_linenumber").alias("src_line"),
        F.col("b.l_linenumber").alias("dst_line"),
        F.col("a.l_partkey").alias("src_part"),
        F.col("b.l_partkey").alias("dst_part"),
    )


@register(
    "merge_distinct_membership",
    oracle="""
    SELECT DISTINCT c.c_nationkey AS nationkey, o.o_orderpriority AS priority
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("J16", "A6"),
)
def merge_distinct_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: MERGE-as-distinct-join (CLUSTER_IN_STRAIN membership edges,
    01_creatingDatabase.cypher:148-153)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(F.col("c_nationkey").alias("nationkey"), F.col("o_orderpriority").alias("priority"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Aggregations (A1, A2, A3/P4, A5-A8, A11, A12, A13)
# --------------------------------------------------------------------------

@register(
    "group_avg_stddev",
    oracle="""
    SELECT c_nationkey,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(stddev_samp(c_acctbal), 4) AS std_bal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("A1",),
)
def group_avg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-group avg + sample stddev (per-strain GC/CAI stats,
    02_addNucleotideCompositionMetrics.cypher:14-28; Neo4j stDev is the
    sample stddev -> stddev_samp)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "group_collect_list",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS number_of_members,
           array_to_string(list_sort(list(l_partkey)), ';') AS members
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("A2", "A14"),
)
def group_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A14: count + collect_list per group (cluster NEIGHBOUR edge
    aggregation keeps duplicate members, 01_creatingDatabase.cypher:
    97-106).  Lists are sorted, then stringified — ArrayType output
    crashes the driver's canonicalizer (VERDICT r1)."""
    li = table(spark, sf_dir, "lineitem")
    members = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("l_partkey")), lambda x: x.cast("string")
        ),
        ";",
    )
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("number_of_members"),
        members.alias("members"),
    )


@register(
    "ratio_filter_on_aggregate",
    oracle="""
    WITH sup AS (
        SELECT l_suppkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l.l_suppkey, CAST(count(*) AS BIGINT) AS n_big_items
    FROM lineitem l JOIN sup s ON l.l_suppkey = s.l_suppkey
    WHERE l.l_quantity > 0.0015 * s.total_qty
    GROUP BY l.l_suppkey
    """,
    tags=("A3", "P4"),
)
def ratio_filter_on_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+P4: aggregate per node, join back, ratio filter
    (nb_out = sum of edge members then 0.7*nb_out < members,
    RGPs.ipynb:456-462)."""
    li = table(spark, sf_dir, "lineitem")
    sup = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("total_qty"))
    return (
        li.join(sup, "l_suppkey")
        .filter(F.col("l_quantity") > 0.0015 * F.col("total_qty"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_big_items"))
    )


@register(
    "histogram_binned",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 500.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1
    """,
    tags=("A8",),
)
def histogram_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: histogram as binned groupBy-count (plt.hist over insertion
    sizes etc., RGPs.ipynb cells 14-16)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_extendedprice") / 500.0).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "having_core_selection",
    oracle="""
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_uses
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) > 35
    """,
    tags=("A11",),
)
def having_core_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: HAVING-style core selection (clusters in >95% of insertions,
    RGPs.ipynb:3358-3373)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_uses"))
        .filter(F.col("n_uses") > 35)
    )


@register(
    "pivot_presence_matrix",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS status_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A12",),
)
def pivot_presence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: presence/pivot matrix (insertion x cluster occurrence counts,
    RGPs.ipynb:2156-2185).  Expressed as conditional aggregation so the
    wide-column names are controlled on both sides."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("status_o"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("status_f"),
    )


@register(
    "scalar_aggregates",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(max(l_extendedprice), 4) AS max_price,
           round(min(l_extendedprice), 4) AS min_price,
           round(stddev_samp(l_quantity), 4) AS std_qty,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    """,
    tags=("A13", "A6"),
)
def scalar_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: scalar aggregates (shape[0], max(), std(), RGPs.ipynb:910+)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "group_min_mean_max",
    oracle="""
    SELECT o_orderpriority,
           round(min(o_totalprice), 4) AS min_price,
           round(avg(o_totalprice), 4) AS avg_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A7",),
)
def group_min_mean_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: min/mean/max per group (distance stats per anchor pair,
    RGPs.ipynb:1707-1724)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


# --------------------------------------------------------------------------
# Sorts / top-k (O1-O4)
# --------------------------------------------------------------------------

@register(
    "topk_parts_by_revenue",
    oracle="""
    SELECT l_partkey, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY sum(l_extendedprice) DESC, l_partkey ASC
    LIMIT 10
    """,
    tags=("O3",),
)
def topk_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-k (10 largest insertion clusters, RGPs.ipynb:2840-2845).
    Deterministic tie-break on the key."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("rev_raw"))
        .orderBy(F.desc("rev_raw"), F.asc("l_partkey"))
        .limit(10)
        .select("l_partkey", F.round("rev_raw", 2).alias("revenue"))
    )


@register(
    "argmax_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey AS top_custkey, c_acctbal AS top_bal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    ) WHERE rn = 1
    """,
    tags=("O4", "P11"),
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/P11: argmax row selection (strain achieving max distance,
    RGPs.ipynb cells 54-66) via row_number window."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_custkey").alias("top_custkey"),
            F.col("c_acctbal").alias("top_bal"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (U1-U5)
# --------------------------------------------------------------------------

@register(
    "union_distinct",
    oracle="""
    SELECT DISTINCT p_partkey, p_brand FROM (
        SELECT p_partkey, p_brand FROM part WHERE p_size > 45
        UNION ALL
        SELECT p_partkey, p_brand FROM part WHERE p_retailprice > 1800.0
    )
    """,
    tags=("U1", "U2"),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: union-all then distinct (concat of per-strain frames,
    pirateToDatabase.py:27; accumulated set union, RGPs.ipynb:2156)."""
    p = table(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") > 45).select("p_partkey", "p_brand")
    b = p.filter(F.col("p_retailprice") > 1800.0).select("p_partkey", "p_brand")
    return a.unionByName(b).distinct()


@register(
    "canonical_pair_dedup",
    oracle="""
    SELECT least(a.l_partkey, b.l_partkey) AS part_lo,
           greatest(a.l_partkey, b.l_partkey) AS part_hi,
           CAST(count(*) AS BIGINT) AS n_cooccur
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("U4",),
)
def canonical_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: symmetric-pair canonicalization ((min,max) anchor tuples,
    RGPs.ipynb:1464-1474) — co-occurring part pairs within orders.

    Shape (r5): pairs live WITHIN an order, so instead of the
    self-join (which shuffles the input twice — once per side), one
    groupBy collects each order's sorted part list and the pair
    expansion is per-row array surgery (transform over a slice —
    map-side, no join).  Group width is bounded by lines-per-order
    (~7 in TPC-H-shaped data), so the quadratic expansion is a
    per-row constant, and the only shuffles are the input groupBy and
    the pair aggregation.  Sorted positions i<j replicate the
    row-pair multiplicity of the a.p < b.p self-join exactly
    (duplicate partkeys pair by position; equal values filtered)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ps = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice("ps", i + 2, F.size("ps") - i - 1),
                lambda y: F.struct(x.alias("lo"), y.alias("hi")),
            ),
        )
    )
    return (
        ps.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.lo").alias("part_lo"), F.col("p.hi").alias("part_hi"))
        .filter(F.col("part_lo") < F.col("part_hi"))
        .groupBy("part_lo", "part_hi")
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= 2)
    )


@register(
    "collect_set_membership",
    oracle="""
    SELECT l_suppkey,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ';') AS flags,
           CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
    FROM lineitem
    GROUP BY l_suppkey
    """,
    tags=("U5",),
)
def collect_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: membership set per group (anchor-pair -> set(strains),
    RGPs.ipynb:1522-1543).  collect_set sorted + stringified — ArrayType
    output crashes the driver's canonicalizer (VERDICT r1)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.array_join(F.sort_array(F.collect_set("l_returnflag")), ";").alias("flags"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@register(
    "regional_revenue_q5",
    oracle="""
    SELECT n.n_name AS nation,
           r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice
                    * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    tags=("ext-olap", "tpch-q5", "J1"),
)
def regional_revenue_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local-supplier revenue by nation and region
    (extension; the one query exercising ALL six relational tables in
    a single plan, including the classic same-nation join between the
    customer and supplier sides): revenue in exact integer cents with
    the discount applied before quantization.

    Scale shape: the canonical star plan — lineitem-orders is the one
    big-big shuffle (bucketed/co-located at deployment), customer /
    supplier / nation / region are dimensions Catalyst broadcasts;
    the same-nation predicate rides the supplier broadcast join, not
    a separate shuffle.  Plan-tested for >= 3 broadcast joins."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_cents"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "orders_q3_topk_unshipped",
    oracle="""
    SELECT o.o_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice
                    * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS order_day,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue_cents DESC, o.o_orderkey
    LIMIT 10
    """,
    tags=("ext-olap", "tpch-q3", "O3"),
)
def orders_q3_topk_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (extension) — top-10 highest-revenue orders from
    BUILDING-segment customers placed before the cutoff but (partly)
    shipped after it: the classic "urgent unshipped backlog" join +
    group + top-k.  Revenue in exact integer cents (discount applied
    before quantization, as regional_revenue_q5); order date projected
    as an epoch-day integer; the top-k tie-breaks on o_orderkey so the
    limit is deterministic.

    Scale shape: the segment filter broadcasts the surviving customer
    keys into the orders scan, the date filters push to both parquet
    scans, and lineitem-orders is the one big-big shuffle.  The top-10
    is a TakeOrdered — per-partition heaps, no global sort
    materialization."""
    cutoff = F.to_timestamp(F.lit("1998-01-01"))
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400")
            .alias("order_day"),
            "o_orderpriority",
        )
        .agg(F.sum("rev_cents").cast("bigint").alias("revenue_cents"))
        .select("o_orderkey", "revenue_cents", "order_day", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


@register(
    "lineitem_promo_share",
    oracle="""
    WITH m AS (
        SELECT CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
                    AS BIGINT) AS midx,
               CAST(round(l.l_extendedprice
                    * (1 - l.l_discount) * 100) AS BIGINT) AS cents,
               p.p_type = 'PROMO' AS is_promo
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT midx,
           CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT)
               AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) * 1000000
                // sum(cents) AS BIGINT) AS promo_ppm
    FROM m GROUP BY midx
    """,
    tags=("ext-olap", "tpch-q14", "A1"),
)
def lineitem_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (extension) — monthly share of revenue from
    PROMO-type parts: conditional aggregation over a fact-dimension
    join, the canonical "what fraction of X is Y per period" report.
    All arithmetic exact-integer: revenue in cents, the share as
    parts-per-million via integer division (promo*1e6 div total), so
    no float summation order can perturb the hash.  (At petabyte
    month-totals the ppm numerator nears int64 range — production
    widens to decimal(38); the cents totals here are bounded by the
    bench scales.)

    Scale shape: part is the broadcast dimension; one shuffle to the
    (month) rollup with map-side partial aggregation; the month domain
    bounds the result regardless of data size."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    m = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("midx"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
        "is_promo",
    )
    return (
        m.groupBy("midx")
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("promo_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "midx",
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 1000000L div total_cents")
            .cast("bigint")
            .alias("promo_ppm"),
        )
    )


@register(
    "customer_band_range_join",
    oracle="""
    WITH bands AS (
        SELECT s_nationkey,
               CAST(min(round(s_acctbal * 100)) AS BIGINT) AS lo_cents,
               CAST(max(round(s_acctbal * 100)) AS BIGINT) AS hi_cents
        FROM supplier GROUP BY s_nationkey
    )
    SELECT b.s_nationkey AS nationkey,
           CAST(b.lo_cents AS BIGINT) AS lo_cents,
           CAST(b.hi_cents AS BIGINT) AS hi_cents,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents
    FROM bands b
    JOIN customer c
      ON CAST(round(c.c_acctbal * 100) AS BIGINT)
             BETWEEN b.lo_cents AND b.hi_cents
    GROUP BY 1, 2, 3
    """,
    tags=("ext-join", "range-join", "broadcast-nested-loop"),
)
def customer_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast band/range lookup join (extension): derive a per-nation
    [min, max] supplier account-balance band, then count the customers
    whose balance falls INSIDE each band — a containment (non-equi)
    join, the shape of IP-to-geo lookups, tariff tables, and SLA-tier
    assignment.  Many-to-many by construction: one customer can fall in
    several nations' bands.  Balances quantized to exact cents before
    any comparison so both engines band identically.

    Scale shape: the band table is GROUP-BY-bounded (one row per
    nation) and explicitly broadcast, so the non-equi join is a
    broadcast nested loop over a 25-row build side — never a cartesian
    shuffle; the fact side streams through map-side.  With thousands of
    bands the plan upgrades to bucketing bands into a sorted structure
    joined via range-bucket keys (the interval_sweep approach)."""
    s = table(spark, sf_dir, "supplier")
    bands = (
        s.select(
            "s_nationkey",
            F.round(F.col("s_acctbal") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("s_nationkey")
        .agg(
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
    )
    c = table(spark, sf_dir, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acct_cents")
    )
    return (
        c.join(
            F.broadcast(bands),
            (F.col("acct_cents") >= F.col("lo_cents"))
            & (F.col("acct_cents") <= F.col("hi_cents")),
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"), "lo_cents", "hi_cents"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("acct_cents").cast("bigint").alias("sum_acctbal_cents"),
        )
    )


@register(
    "lineitem_skewsafe_distinct",
    oracle="""
    WITH pre AS (
        SELECT p.p_brand, l.l_suppkey,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l.l_extendedprice
                    * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(n_items) AS BIGINT) AS n_items,
           CAST(sum(rev_cents) AS BIGINT) AS revenue_cents
    FROM pre GROUP BY p_brand
    """,
    tags=("ext-olap", "skew", "two-stage-distinct"),
)
def lineitem_skewsafe_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct count per hot key (extension — the two-stage
    expansion that keeps a COUNT(DISTINCT) over a handful of hot
    groups from collapsing onto a handful of reducers): distinct
    suppliers + exact revenue per brand, computed by FIRST aggregating
    on the composite (brand, suppkey) key — the shuffle spreads over
    the full composite key space — and THEN reducing the pre-frame by
    brand, where each group is now at most |suppliers| rows.  A direct
    count_distinct groupBy("p_brand") shuffles every row to one of 25
    reducers; this plan's first exchange fans out over brand x supplier.

    Scale shape: two exchanges by construction (the plan test pins the
    first on the composite key); the part dimension broadcasts; all
    sums exact integer cents riding the same pre-aggregation."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pre = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    return pre.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("n_items").cast("bigint").alias("n_items"),
        F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
    )


_TRGM_PATTERN = "gear"  # literal probe; trigrams derived below


@register(
    "part_trigram_like_search",
    oracle=f"""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%{_TRGM_PATTERN}%'
    """,
    tags=("ext-search", "trigram-index", "P6"),
)
def part_trigram_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-accelerated substring search (extension — the pg_trgm /
    search-index pattern for `LIKE '%...%'`, which no B-tree or
    parquet min/max can serve): build a trigram posting list over
    p_name, intersect the posting lists of the pattern's trigrams
    (a candidate must contain ALL of them), and verify survivors with
    the real `contains` — exact result set, but the scan touches only
    posting-list rows for the pattern's trigrams instead of every
    name.  The oracle is the plain LIKE scan: identical output proves
    the index path lossless.

    Scale shape: the posting list shuffles once on trigram (the
    inverted-index discipline); the pattern's trigram set is a
    literal broadcast; candidates are the posting intersection sized
    by the rarest trigram, and only they pay verification.  At 100 TB
    the posting list is the persisted search index and this query is
    its lookup path."""
    pat = _TRGM_PATTERN
    grams = [pat[i : i + 3] for i in range(len(pat) - 2)]
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    postings = p.select(
        "p_partkey",
        F.explode(
            F.transform(
                # sequence(1, n) DESCENDS when n < 1 (the _gram_starts
                # pitfall): guard short names to an empty array.
                F.when(
                    F.length("p_name") >= 3,
                    F.sequence(F.lit(1), F.length("p_name") - 2),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.col("p_name").substr(i, F.lit(3)),
            )
        ).alias("trigram"),
    ).distinct()
    cands = (
        postings.filter(F.col("trigram").isin(grams))
        .groupBy("p_partkey")
        .agg(F.count_distinct("trigram").alias("n_hit"))
        .filter(F.col("n_hit") == len(grams))
        .select("p_partkey")
    )
    return (
        p.join(cands, "p_partkey")
        .filter(F.col("p_name").contains(pat))
        .select("p_partkey", "p_name")
    )


@register(
    "star_referential_integrity",
    oracle="""
    WITH checks AS (
        SELECT 'lineitem.l_orderkey -> orders' AS fk,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_partkey -> part',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM part p
                                       WHERE p.p_partkey = l.l_partkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'lineitem.l_suppkey -> supplier',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                       WHERE s.s_suppkey = l.l_suppkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               CAST((SELECT count(*) FROM customer) AS BIGINT),
               CAST((SELECT count(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'nation.n_regionkey -> region',
               CAST((SELECT count(*) FROM nation) AS BIGINT),
               CAST((SELECT count(*) FROM nation n
                     WHERE NOT EXISTS (SELECT 1 FROM region r
                                       WHERE r.r_regionkey = n.n_regionkey))
                    AS BIGINT)
    )
    SELECT fk, n_child, n_orphans, n_orphans = 0 AS intact
    FROM checks
    """,
    tags=("ext-olap", "referential-integrity", "J8"),
)
def star_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star (extension —
    the constraint check a lake must RUN because nothing enforces it
    at write time, the relational twin of the reference's uniqueness
    constraint 01_creatingDatabase.cypher:136): orphan counts for all
    six FK edges via left-anti joins, with an `intact` verdict per
    edge.  One row per FK — the table a data-quality dashboard reads.

    Scale shape: each check is one anti-join; dimension-sided checks
    broadcast the parent key set (nation/region/customer/supplier/
    part), so only the two fact-to-fact checks shuffle, keyed on
    their join columns.  Spark runs the six checks as one union DAG —
    shared scans are reused by the optimizer."""
    def check(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, label: str) -> DataFrame:
        orphans = child.select(ckey).join(
            parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_orphans")
                )
            )
            .select(
                F.lit(label).alias("fk"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    su = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    checks = [
        check(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey -> orders"),
        check(li, "l_partkey", p, "p_partkey", "lineitem.l_partkey -> part"),
        check(li, "l_suppkey", su, "s_suppkey", "lineitem.l_suppkey -> supplier"),
        check(o, "o_custkey", c, "c_custkey", "orders.o_custkey -> customer"),
        check(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey -> nation"),
        check(n, "n_regionkey", r, "r_regionkey", "nation.n_regionkey -> region"),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out


@register(
    "orders_large_basket_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS order_day,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("ext-olap", "tpch-q18", "A11"),
)
def orders_large_basket_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (extension) — large-volume orders: aggregate
    the fact table by order, keep orders whose total quantity clears
    the threshold (HAVING — the A11 core-selection shape on the star
    schema), then join the small surviving set back to orders and
    customers for the report.  Quantities and prices exact integers;
    the date an epoch-day.

    Scale shape: the big aggregation happens FIRST and the threshold
    collapses it to a tiny key set, so the enrichment joins run on
    the survivors (broadcast-sized) — the aggregate-then-join-back
    discipline that avoids joining the full fact table to customers."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 150)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400")
            .alias("order_day"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("total_cents"),
            "total_qty",
        )
    )


def _cksum_limb_sql(expr: str, shift: int) -> str:
    h = (
        f"CAST(('0x' || substr(md5({expr}), 1, 12)) AS BIGINT)"
    )
    return f"CAST(sum(({h} >> {shift}) & 65535) AS BIGINT)"


def _cksum_table_sql(tbl: str, expr: str) -> str:
    return f"""
    SELECT '{tbl}' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_cksum_limb_sql(expr, 32)} AS sum_hi,
           {_cksum_limb_sql(expr, 16)} AS sum_mid,
           {_cksum_limb_sql(expr, 0)} AS sum_lo
    FROM {tbl}"""


@register(
    "star_table_checksums",
    oracle=" UNION ALL ".join(
        [
            _cksum_table_sql(
                "orders",
                "CAST(o_orderkey AS VARCHAR) || '|' || "
                "CAST(o_custkey AS VARCHAR) || '|' || "
                "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
            ),
            _cksum_table_sql(
                "lineitem",
                "CAST(l_orderkey AS VARCHAR) || '|' || "
                "CAST(l_linenumber AS VARCHAR) || '|' || "
                "CAST(l_partkey AS VARCHAR) || '|' || "
                "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)",
            ),
            _cksum_table_sql(
                "customer",
                "CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || "
                "CAST(c_nationkey AS VARCHAR)",
            ),
        ]
    ),
    tags=("ext-olap", "reconciliation", "checksum"),
)
def star_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksums (extension — the replica/
    migration reconciliation primitive: two copies of a table match
    iff their additive row-hash sums match, no sort or row-by-row
    diff needed): per table, a 48-bit md5-derived integer per row
    (keys + exact-cent payloads rendered canonically) summed as THREE
    16-bit LIMBS (hi/mid/lo) — addition commutes, so partition order,
    file order, and engine never change the result, and partial
    checksums merge like any other partial aggregate.  The limb split
    is the scale fix the r14 full-registry sf0.1 gate forced: a
    single sum of 48-bit values overflows int64 at ~130k rows
    (2^48 x 2^17 > 2^63 — the r13 shape failed LOUDLY at sf0.1 under
    ANSI mode, and sf0.01 passed only by headroom luck), while a
    16-bit limb sum stays inside int64 to ~1.4e14 rows per partition
    tree — genuinely 100 TB-safe with no decimal/hugeint cross-engine
    types.  The limb-sum TRIPLE carries the same reconciliation power
    as one sum (equal tables give equal triples; a mismatch flips at
    least one limb with overwhelming probability).

    Scale shape: a narrow map + one scalar aggregation per table —
    the cheapest possible full-table pass; at 100 TB this runs as
    the post-copy verification job, per partition if you group by
    the partition key instead."""
    def cksum(df: DataFrame, tbl: str, cols) -> DataFrame:
        rowhash = F.conv(
            F.substring(F.md5(F.concat_ws("|", *cols)), 1, 12), 16, 10
        ).cast("long")
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.shiftright(rowhash, 32).bitwiseAND(F.lit(65535)))
            .cast("bigint")
            .alias("sum_hi"),
            F.sum(F.shiftright(rowhash, 16).bitwiseAND(F.lit(65535)))
            .cast("bigint")
            .alias("sum_mid"),
            F.sum(rowhash.bitwiseAND(F.lit(65535)))
            .cast("bigint")
            .alias("sum_lo"),
        ).select(
            F.lit(tbl).alias("tbl"), "n_rows", "sum_hi", "sum_mid", "sum_lo"
        )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    parts = [
        cksum(
            o,
            "orders",
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            ],
        ),
        cksum(
            li,
            "lineitem",
            [
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .cast("string"),
            ],
        ),
        cksum(
            c,
            "customer",
            [
                F.col("c_custkey").cast("string"),
                F.col("c_name"),
                F.col("c_nationkey").cast("string"),
            ],
        ),
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
