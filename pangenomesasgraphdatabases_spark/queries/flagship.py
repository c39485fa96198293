"""Flagship query: the GIsInStrain genome scan, star-schema isomorph.

Reference: 03_analyses/GIsInStrain.ipynb:45-111 (cells 3-4) joins
feature -> cluster -> strain stats, z-scores CAI/GC against per-strain
aggregates (cell 3 :64-65), orders features along the genome, then runs
trailing rolling windows (cells 8+: rolling(10) mean at :157/:165,
rolling(20) sum of deviation flags > 5 at :160/:168, rolling(5) max of
number_genomes <= 600 at :176).

Star-schema isomorphism (FIXTURES.md section 5): lineitem rows per
supplier ordered by shipdate play the role of features per strain
ordered by feature_start; l_extendedprice plays GC/CAI; l_quantity
plays number_genomes.

Operators exercised: W2 (genome ordinal), W3-W5 (trailing rolling
frames with pandas min_periods parity), W6 (z-score vs group stats),
P8 (absolute-deviation flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register

_ORACLE = """
WITH cents AS (
    -- Engine-order-independent group stats: prices have 2 decimals, so
    -- integer-cent sums and sums-of-squares are EXACT and Spark/DuckDB
    -- agree bitwise regardless of aggregation order (double avg/stddev
    -- accumulate in partition order and diverge in the last ulp,
    -- flipping round(z, 4) — VERDICT r1).  z is scale-invariant, so
    -- computing it in the cents domain changes nothing.
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS xi
    FROM lineitem
), base AS (
    SELECT *,
        CAST(sum(xi) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS sup_s,
        CAST(sum(xi * xi) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS sup_ss,
        CAST(count(*) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS sup_n
    FROM cents
), z AS (
    SELECT *,
        (CAST(xi AS DOUBLE) - sup_s / sup_n)
            / sqrt((sup_ss - sup_s * sup_s / sup_n) / (sup_n - 1.0)) AS zval,
        CASE WHEN abs((CAST(xi AS DOUBLE) - sup_s / sup_n)
                 / sqrt((sup_ss - sup_s * sup_s / sup_n) / (sup_n - 1.0))) >= 1.5
             THEN 1 ELSE 0 END AS deviating
    FROM base
), w AS (
    SELECT
        l_suppkey, l_orderkey, l_linenumber, zval, deviating,
        row_number() OVER win AS pos,
        CASE WHEN count(*) OVER (win ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) = 10
             THEN avg(zval) OVER (win ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        END AS roll_mean_z,
        CASE WHEN sum(deviating) OVER (win ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) > 5
             THEN 1 ELSE 0 END AS dev_run,
        CASE WHEN max(l_quantity) OVER (win ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) <= 10
             THEN 1 ELSE 0 END AS low_qty_run
    FROM z
    WINDOW win AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber,
                   l_extendedprice, l_quantity)
)
SELECT l_suppkey, l_orderkey, l_linenumber, pos,
       -- + 0.0 folds -0.0 to +0.0 (IEEE): DuckDB's round emits -0.0
       -- for tiny negatives, Spark's emits 0.0; they compare equal
       -- but hash differently in the driver (r2).
       round(zval, 4) + 0.0 AS z,
       deviating,
       round(roll_mean_z, 4) + 0.0 AS roll_mean_z,
       dev_run, low_qty_run
FROM w
"""


@register("gi_scan_flagship", oracle=_ORACLE, tags=("flagship", "W2", "W3", "W4", "W5", "W6", "P8"))
def gi_scan_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # Genome order == per-partition sort; ties broken on the unique
    # (orderkey, linenumber) key so Spark and the oracle agree exactly.
    win = Window.partitionBy("l_suppkey").orderBy(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    part = Window.partitionBy("l_suppkey")
    roll10 = win.rowsBetween(-9, 0)
    roll20 = win.rowsBetween(-19, 0)
    roll5 = win.rowsBetween(-4, 0)

    # Group stats from exact integer-cent accumulators (order-
    # independent; see _ORACLE header) — then identical double math on
    # both engines.  z is scale-invariant so the cents domain is exact.
    xi = F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("bigint")
    s = F.sum(xi).over(part).cast("double")
    ss = F.sum(xi * xi).over(part).cast("double")
    n = F.count(F.lit(1)).over(part).cast("double")
    z = (xi.cast("double") - s / n) / F.sqrt((ss - s * s / n) / (n - F.lit(1.0)))
    df = (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .withColumn("zval", z)
        .withColumn("deviating", F.when(F.abs(F.col("zval")) >= 1.5, 1).otherwise(0))
    )
    df = (
        df.withColumn("pos", F.row_number().over(win))
        # pandas rolling(10) parity: null until the frame holds 10 rows.
        .withColumn(
            "roll_mean_z",
            F.when(F.count(F.lit(1)).over(roll10) == 10, F.avg("zval").over(roll10)),
        )
        .withColumn("dev_run", (F.sum("deviating").over(roll20) > 5).cast("int"))
        .withColumn("low_qty_run", (F.max("l_quantity").over(roll5) <= 10).cast("int"))
    )
    return df.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "pos",
        # + 0.0 folds -0.0 to +0.0 so both engines emit the same zero
        # bit pattern — the driver hashes float bits (r2).
        (F.round("zval", 4) + F.lit(0.0)).alias("z"),
        "deviating",
        (F.round("roll_mean_z", 4) + F.lit(0.0)).alias("roll_mean_z"),
        "dev_run",
        "low_qty_run",
    )
