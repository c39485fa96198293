"""Engine-surface breadth: ranking/navigation/range-frame windows,
percentiles, string aggregation, calendar bucketing, native pivot, and
the spark.sql API with correlated subqueries.

These are extensions beyond the reference's operator set (SURVEY.md
notes: no ranking functions, no range frames, no grouping sets in the
reference) — registered so a user of the engine has the full standard
analytic surface, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register

# Total order for lineitem windows (no natural unique key — see
# windows_q._ORDER_COLS).
_ORD = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
_ORD_SQL = ", ".join(_ORD)


@register(
    "ranking_functions",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber, rnk, drnk, quartile,
           CASE WHEN cnt > 1 THEN ((rnk - 1) * 1000000) // (cnt - 1)
                ELSE 0 END AS prnk_ppm
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               CAST(count(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS cnt
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_ORD_SQL})
    ) t
    """,
    tags=("ext-window", "rank"),
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank (extension — absent from the
    reference, SURVEY.md section 2.5 note).  percent_rank is emitted
    as exact integer parts-per-million ((rank-1)*1e6 div (n-1)):
    round(double, 6) put values like 0.5046875 on a half-ulp rounding
    boundary where Spark (decimal-string HALF_UP) and DuckDB (binary
    double) disagree — integer division cannot."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(*_ORD)
    wp = Window.partitionBy("l_suppkey")
    base = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("cnt"),
    )
    return base.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "rnk",
        "drnk",
        "quartile",
        F.when(
            F.col("cnt") > 1,
            F.expr("(rnk - 1) * CAST(1000000 AS BIGINT) div (cnt - 1)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("prnk_ppm"),
    )


@register(
    "window_navigation",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           lead(l_partkey) OVER w AS next_part,
           first_value(l_partkey) OVER w AS first_part,
           last_value(l_partkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {_ORD_SQL})
    """,
    tags=("ext-window", "navigation"),
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/first_value/last_value navigation (extension)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(*_ORD)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.lead("l_partkey").over(w).alias("next_part"),
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(wfull).alias("last_part"),
    )


@register(
    "range_frame_window",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           CAST(count(*) OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice
                RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_in_band
    FROM lineitem
    """,
    tags=("ext-window", "range-frame"),
)
def range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — value-defined frames are
    tie-order independent, so no tie-break columns needed (extension)."""
    li = table(spark, sf_dir, "lineitem")
    # Python Window.rangeBetween only accepts integral offsets; the
    # float-valued frame goes through the SQL expression form.
    band = F.expr(
        "count(*) OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        band.alias("n_in_band"),
    )


@register(
    "percentile_stats",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext-agg", "percentile"),
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) per
    group (extension)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q1_qty"),
    )


@register(
    "string_agg_group",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    GROUP BY c_nationkey
    """,
    tags=("ext-agg", "string-agg"),
)
def string_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg shape) via sorted
    collect_list + concat_ws (extension)."""
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias(
            "segments"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "orders_by_month",
    oracle="""
    SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS month_revenue
    FROM orders
    GROUP BY 1
    """,
    tags=("ext-datetime", "F15"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing (date_trunc month) compared as epoch seconds
    (extension; the reference uses no date arithmetic — F15 note).

    month_start is pure DATE arithmetic (days-since-epoch * 86400),
    never date->timestamp: date_trunc returns a LOCAL-midnight
    timestamp, so unix_timestamp of it shifts by the session-timezone
    offset under a non-UTC consumer session (r9, caught by
    tools/probe_env.py) while DuckDB's epoch(DATE) is always UTC
    midnight."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
        )
        .select(
            (
                F.datediff(F.col("m"), F.lit("1970-01-01")).cast("bigint")
                * 86400
            ).alias("month_start"),
            "n_orders",
            "month_revenue",
        )
    )


@register(
    "pivot_native",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS O,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A12", "pivot"),
)
def pivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 with the native .pivot() API (explicit value list pins the
    output column names)."""
    li = table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return out


@register(
    "sql_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
    tags=("ext-sql", "exists"),
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the spark.sql API (same Catalyst plan
    as the DataFrame semi-join; demonstrates the SQL entry point)."""
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """
    )


@register(
    "sql_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_retailprice,
           round(p_retailprice - (SELECT avg(p_retailprice) FROM part), 4)
               AS price_vs_avg
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
    tags=("ext-sql", "scalar-subquery"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in projection + predicate via spark.sql."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice,
               round(p_retailprice - (SELECT avg(p_retailprice) FROM part), 4)
                   AS price_vs_avg
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        """
    )


@register(
    "pricing_summary_report",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS sum_disc_c4,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                AS BIGINT) AS sum_charge_c6,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS avg_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS avg_price_c,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS avg_disc_c,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("sql-surface", "tpch", "aggregate"),
)
def pricing_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (extension): grouped sums and
    means of quantity/price/discounted price/charge over shipped line
    items — the canonical scan-heavy aggregate every OLAP engine is
    judged by.

    Exactness: money quantized to integer cents before summation
    (BIGINT sums are associative, so partial map-side aggregation and
    any shuffle order give identical bits; the derived products stay
    well inside 64 bits at any scale factor the harness runs).  Means
    are integer divisions of those exact sums.  Scale shape: one scan,
    map-side partial agg, a 4-row result — the filter and the 7-column
    projection both push into the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_c = F.round(F.col("l_tax") * 100).cast("bigint")
    return (
        li.filter(
            # Cast the cutoff to the column's own type (TIMESTAMP_NTZ in
            # the current testdata) so no NTZ/TZ coercion sits between
            # the predicate and the parquet pushdown.
            F.col("l_shipdate")
            <= F.lit("2001-06-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qty_c"),
            price_c.alias("price_c"),
            disc_c.alias("disc_c"),
            (price_c * (100 - disc_c)).alias("disc_price_c4"),
            (price_c * (100 - disc_c) * (100 + tax_c)).alias("charge_c6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").alias("sum_qty_c"),
            F.sum("price_c").alias("sum_base_c"),
            F.sum("disc_price_c4").alias("sum_disc_c4"),
            F.sum("charge_c6").alias("sum_charge_c6"),
            F.expr("sum(qty_c) div count(*)").alias("avg_qty_c"),
            F.expr("sum(price_c) div count(*)").alias("avg_price_c"),
            F.expr("sum(disc_c) div count(*)").alias("avg_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    tags=("ext-olap", "grouping-sets"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form CUBE/ROLLUP are sugar
    for (extension): the priority marginal, the status marginal, and
    the grand total in ONE pass over orders, NULL-marked per set.
    Catalyst expands the sets into a single Expand + partial-agg plan
    (one scan, one shuffle), exactly the multi-marginal report shape
    dashboards re-scan three times for.

    Scale shape: Expand multiplies rows by the set count (3x) BEFORE
    the map-side combine — still one shuffle keyed on the grouping
    columns, and each marginal's cardinality bounds its reduce side."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )
