"""Multi-dimensional aggregation + array-lateral operators.

Engine extensions (the reference has no grouping sets / cube / rollup,
SURVEY.md section 2.4 note) plus posexplode/exists coverage for the
array surface (F12 exists/any; A4 explode-with-position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register


@register(
    "cube_aggregation",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 4) AS total_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("ext-olap", "cube"),
)
def cube_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all 2^2 grouping sets in
    one pass (extension)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
    )


@register(
    "rollup_aggregation",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    tags=("ext-olap", "rollup"),
)
def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (priority -> status -> grand total) (extension)."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "exists_any_predicate",
    oracle="""
    SELECT p_partkey,
           CAST(CASE WHEN len(list_filter(string_split(p_name, ' '),
                w -> length(w) >= 8)) > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS has_long_word,
           CAST(CASE WHEN len(list_filter(string_split(p_name, ' '),
                w -> w = 'green')) > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS has_green
    FROM part
    """,
    tags=("F12", "exists"),
)
def exists_any_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 `any(...)` / `exists` higher-order predicate
    (`any(node in nodes(path) where ...)`, RGPs.ipynb:466)."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.exists(words, lambda w: F.length(w) >= 8).cast("int").alias("has_long_word"),
        F.exists(words, lambda w: w == F.lit("green")).cast("int").alias("has_green"),
    )


@register(
    "posexplode_tokens",
    oracle="""
    SELECT p_partkey,
           CAST(i - 1 AS INTEGER) AS pos,
           string_split(p_type, ' ')[i] AS tok
    FROM part, generate_series(1, 8) t(i)
    WHERE i <= len(string_split(p_type, ' '))
    """,
    tags=("A4", "explode"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: lateral explode with element position — the
    UNWIND-with-ordinality shape used for path node lists (A4)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos", "tok")
    )


@register(
    "interval_sweep_concurrency",
    oracle="""
    WITH iv AS (
        SELECT least(CAST(epoch(o.o_orderdate) AS BIGINT) // 86400,
                     CAST(epoch(l.l_shipdate) AS BIGINT) // 86400) AS lo,
               greatest(CAST(epoch(o.o_orderdate) AS BIGINT) // 86400,
                        CAST(epoch(l.l_shipdate) AS BIGINT) // 86400) AS hi
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deltas AS (
        SELECT lo AS day, CAST(1 AS BIGINT) AS delta FROM iv
        UNION ALL
        SELECT hi + 1 AS day, CAST(-1 AS BIGINT) AS delta FROM iv
    ),
    net AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net_delta
        FROM deltas GROUP BY day
    )
    SELECT day, net_delta,
           CAST(sum(net_delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open_intervals
    FROM net
    """,
    tags=("ext-analytics", "interval", "sweep"),
)
def interval_sweep_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency (extension — the genomic
    coverage-depth / orders-in-flight operator): each lineitem defines
    an inclusive day interval spanning its order and ship dates (via
    least/greatest — the synthetic data orders the two dates both
    ways), and the result is the number of OPEN intervals on every day
    the count changes.  The classic sweep turns each interval into two
    boundary deltas (+1 at lo, -1 after hi), nets them per day, and
    takes a running sum over the day order — O(distinct days) output
    rows with NO per-position expansion, the same algebra that scales
    read-coverage depth over a 3 Gb genome or concurrent sessions over
    a year of traffic.

    Scale shape: the lineitem-orders join is a keyed shuffle join
    (bucketing co-locates it at deployment); the delta aggregation is
    map-side combinable into at most 2x distinct-days rows; the global
    running sum uses operators/prefix.global_cumsum — range partition
    + per-partition window + broadcast partition offsets — NOT a
    single-partition Window.orderBy, so the sweep stays distributed at
    any day range."""
    from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    day = lambda c: F.expr(f"CAST(unix_timestamp({c}) AS BIGINT) div 86400")
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.least(day("o_orderdate"), day("l_shipdate")).alias("lo"),
        F.greatest(day("o_orderdate"), day("l_shipdate")).alias("hi"),
    )
    deltas = iv.select(F.col("lo").alias("day"), F.lit(1).alias("delta")).unionByName(
        iv.select((F.col("hi") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    net = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net_delta"))
    return global_cumsum(net, ["day"], "net_delta", "open_intervals").select(
        "day", "net_delta", F.col("open_intervals").cast("bigint").alias("open_intervals")
    )
