"""Window operators (SURVEY.md section 2.5) + interval path join (J13/J14).

The reference's genome is a linear chain of features per strain; every
traversal it performs is either a per-partition sort, a lag, or a
bounded-range interval query — all expressible as window functions +
range self-joins (no BFS needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register

# Deterministic genome-order: partition by supplier, order by a column
# set that is unique per row (lineitem has no single natural key; ties
# on (orderkey, linenumber) would make Spark/DuckDB window frames
# diverge).
_ORDER_COLS = (
    "l_orderkey",
    "l_linenumber",
    "l_extendedprice",
    "l_quantity",
    "l_discount",
    "l_partkey",
)
_WIN_SQL = "PARTITION BY l_suppkey ORDER BY " + ", ".join(_ORDER_COLS)


def _win(Window):
    return Window.partitionBy("l_suppkey").orderBy(*_ORDER_COLS)


@register(
    "lag_adjacency_edges",
    oracle=f"""
    SELECT l_suppkey AS strain,
           prev_key AS src_okey, prev_line AS src_line,
           l_orderkey AS dst_okey, l_linenumber AS dst_line
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               lag(l_orderkey) OVER ({_WIN_SQL}) AS prev_key,
               lag(l_linenumber) OVER ({_WIN_SQL}) AS prev_line
        FROM lineitem
    ) WHERE prev_key IS NOT NULL
    """,
    tags=("W1",),
)
def lag_adjacency_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: sort + lag -> NEIGHBOUR adjacency edges.

    Reference: pirateToDatabase.py:299-327 builds feature->feature edges
    with a sequential loop guarded by `previous_start < start` (buggy at
    strain boundaries, :314).  We implement the *intended* semantics:
    partition by strain so no cross-strain edge can leak (SURVEY.md
    section 7.5 documents the divergence).
    """
    li = table(spark, sf_dir, "lineitem")
    w = _win(Window)
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.lag("l_orderkey").over(w).alias("prev_key"),
            F.lag("l_linenumber").over(w).alias("prev_line"),
        )
        .filter(F.col("prev_key").isNotNull())
        .select(
            F.col("l_suppkey").alias("strain"),
            F.col("prev_key").alias("src_okey"),
            F.col("prev_line").alias("src_line"),
            F.col("l_orderkey").alias("dst_okey"),
            F.col("l_linenumber").alias("dst_line"),
        )
    )


@register(
    "genome_ordinal",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           row_number() OVER ({_WIN_SQL}) AS pos
    FROM lineitem
    """,
    tags=("W2", "J14", "O1"),
)
def genome_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/J14: genome ordinal via row_number.  Cypher's
    shortestPath((first)-[NEIGHBOURS*]->(last)) over a chain
    (GIsInStrain.ipynb:56-57) degenerates to this sort."""
    li = table(spark, sf_dir, "lineitem")
    w = _win(Window)
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber", F.row_number().over(w).alias("pos")
    )


@register(
    "zscore_vs_group",
    oracle="""
    WITH cents AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100.0) AS BIGINT) AS xi
        FROM lineitem
    ), base AS (
        SELECT *,
               CAST(sum(xi) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS s,
               CAST(sum(xi * xi) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS ss,
               CAST(count(*) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS n
        FROM cents
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           -- + 0.0 folds -0.0 to +0.0 (IEEE): DuckDB's round emits
           -- -0.0 for tiny negatives, Spark's emits 0.0; they compare
           -- equal but hash differently in the driver (r2).
           round((CAST(xi AS DOUBLE) - s / n)
                 / sqrt((ss - s * s / n) / (n - 1.0)), 4) + 0.0 AS z
    FROM base
    """,
    tags=("W6",),
)
def zscore_vs_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: z-score against group stats ((CAI - avg)/stDev,
    GIsInStrain.ipynb:64-65).  Group stats come from exact integer-cent
    accumulators so both engines produce bitwise-identical doubles —
    double avg/stddev accumulate in partition order and can flip the
    4th decimal of round(z, 4) (VERDICT r1)."""
    li = table(spark, sf_dir, "lineitem")
    part = Window.partitionBy("l_suppkey")
    xi = F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("bigint")
    s = F.sum(xi).over(part).cast("double")
    ss = F.sum(xi * xi).over(part).cast("double")
    n = F.count(F.lit(1)).over(part).cast("double")
    z = (xi.cast("double") - s / n) / F.sqrt((ss - s * s / n) / (n - F.lit(1.0)))
    # + 0.0 folds -0.0 to +0.0 (IEEE) so both engines emit the same
    # zero bit pattern — the driver hashes float bits (r2).
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.round(z, 4) + F.lit(0.0)).alias("z"),
    )


@register(
    "interval_path_counts",
    oracle=f"""
    WITH pos AS (
        SELECT l_suppkey, l_partkey,
               row_number() OVER ({_WIN_SQL}) AS pos
        FROM lineitem
    )
    SELECT a.l_suppkey, CAST(count(*) AS BIGINT) AS n_paths,
           CAST(min(b.pos - a.pos) AS BIGINT) AS min_hops,
           CAST(max(b.pos - a.pos) AS BIGINT) AS max_hops
    FROM pos a
    JOIN pos b ON a.l_suppkey = b.l_suppkey
              AND b.pos - a.pos BETWEEN 5 AND 20
    WHERE a.l_partkey < 50 AND b.l_partkey < 50
    GROUP BY a.l_suppkey
    """,
    tags=("J13",),
)
def interval_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: variable-length path `(f1)-[:NEIGHBOUR*5..200]->(f2)`
    (RGPs.ipynb:465) re-expressed as an *interval join* on genome
    ordinals — a chain-shaped graph needs no BFS (SURVEY.md section 4).
    Anchor predicate (partkey < 50) plays the core-cluster filter."""
    li = table(spark, sf_dir, "lineitem")
    w = _win(Window)
    pos = li.select("l_suppkey", "l_partkey", F.row_number().over(w).alias("pos"))
    a = pos.filter(F.col("l_partkey") < 50).alias("a")
    b = pos.filter(F.col("l_partkey") < 50).alias("b")
    hops = F.col("b.pos") - F.col("a.pos")
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & hops.between(5, 20),
        )
        .groupBy(F.col("a.l_suppkey").alias("l_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.min(F.col("b.pos") - F.col("a.pos")).alias("min_hops"),
            F.max(F.col("b.pos") - F.col("a.pos")).alias("max_hops"),
        )
    )


@register(
    "rolling_mean_min_periods",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CASE WHEN count(*) OVER ({_WIN_SQL}
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) = 10
                THEN round(avg(l_extendedprice) OVER ({_WIN_SQL}
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4)
           END AS roll_mean
    FROM lineitem
    """,
    tags=("W3",),
)
def rolling_mean_min_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: trailing rolling(10) mean with pandas min_periods parity
    (null until the window is full), GIsInStrain.ipynb:157/:165."""
    li = table(spark, sf_dir, "lineitem")
    w = _win(Window)
    roll = w.rowsBetween(-9, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.count(F.lit(1)).over(roll) == 10, F.round(F.avg("l_extendedprice").over(roll), 4)
        ).alias("roll_mean"),
    )


@register(
    "rolling_flag_runs",
    oracle=f"""
    WITH flags AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_partkey,
               CASE WHEN l_discount >= 0.08 THEN 1 ELSE 0 END AS dev
        FROM lineitem
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CASE WHEN sum(dev) OVER ({_WIN_SQL}
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 5
                THEN 1 ELSE 0 END AS dev_run,
           CASE WHEN max(l_quantity) OVER ({_WIN_SQL}
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) <= 25
                THEN 1 ELSE 0 END AS low_run
    FROM flags
    """,
    tags=("W4", "W5"),
)
def rolling_flag_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/W5: trailing rolling(20) sum-of-flags > 5 and rolling(5)
    max <= threshold (GIsInStrain.ipynb:160/:168/:176)."""
    li = table(spark, sf_dir, "lineitem")
    w = _win(Window)
    dev = F.when(F.col("l_discount") >= 0.08, 1).otherwise(0)
    return (
        li.withColumn("dev", dev)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            (F.sum("dev").over(w.rowsBetween(-19, 0)) > 5).cast("int").alias("dev_run"),
            (F.max("l_quantity").over(w.rowsBetween(-4, 0)) <= 25).cast("int").alias("low_run"),
        )
    )


@register(
    "lineitem_running_distinct",
    oracle="""
    WITH seq AS (
        SELECT l_suppkey, l_partkey,
               CAST(epoch(l_shipdate) AS BIGINT) // 86400 AS ship_day,
               l_orderkey, l_linenumber,
               row_number() OVER (
                   PARTITION BY l_suppkey, l_partkey
                   ORDER BY CAST(epoch(l_shipdate) AS BIGINT) // 86400,
                            l_orderkey, l_linenumber) AS occ
        FROM lineitem
    )
    SELECT l_suppkey, ship_day, l_orderkey, l_linenumber,
           CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) OVER (
                PARTITION BY l_suppkey
                ORDER BY ship_day, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_parts_so_far
    FROM seq
    """,
    tags=("ext-window", "running-distinct"),
)
def lineitem_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — a shape SQL window
    frames cannot express directly (extension; per-strain cumulative
    distinct gene clusters over genome position, or distinct SKUs a
    supplier has ever shipped as of each shipment).  The classic
    first-occurrence decomposition: row_number per (key, element)
    marks each element's first appearance, and a running sum of those
    marks IS the running distinct count — two windows, exact, no
    quadratic re-scan.

    Both windows order by the same total key (ship_day, orderkey,
    linenumber — unique per row), so the frame is deterministic and
    identical across engines.

    Scale shape: both windows partition by a data key (suppkey /
    suppkey+partkey) — fully distributed; the shuffles are the two
    unavoidable key repartitions, and AQE coalesces them at small
    SF."""
    li = table(spark, sf_dir, "lineitem")
    ship_day = F.expr("CAST(unix_timestamp(l_shipdate) AS BIGINT) div 86400")
    base = li.select(
        "l_suppkey",
        "l_partkey",
        ship_day.alias("ship_day"),
        "l_orderkey",
        "l_linenumber",
    )
    w_occ = Window.partitionBy("l_suppkey", "l_partkey").orderBy(
        "ship_day", "l_orderkey", "l_linenumber"
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = base.withColumn(
        "is_first", (F.row_number().over(w_occ) == 1).cast("int")
    )
    return flagged.select(
        "l_suppkey",
        "ship_day",
        "l_orderkey",
        "l_linenumber",
        F.sum("is_first").over(w_run).cast("bigint").alias("distinct_parts_so_far"),
    )
