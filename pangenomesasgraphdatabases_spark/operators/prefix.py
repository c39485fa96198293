"""Distributed global prefix sum — cumulative aggregation over a total
order WITHOUT a single-partition window.

`Window.orderBy(...)` with no partitionBy moves the whole dataset to
one partition (Spark even warns); at 100 TB that is not a slow plan,
it is a dead one.  The classic two-phase formulation keeps the data
distributed:

1. range-partition by the order columns (`repartitionByRange`), so
   partition i holds a contiguous slice of the total order;
2. per-partition running sum via a PARTITIONED window over
   `spark_partition_id()` — each window is one already-local slice, no
   extra shuffle;
3. per-partition totals (a tiny frame, one row per partition) turn
   into exclusive cumulative offsets on the driver-free path: a window
   over the totals frame itself (numPartitions rows — broadcastable);
4. broadcast-join the offsets back and add.

Cost: the one range shuffle you cannot avoid for a global order, plus
a broadcast of numPartitions rows.  The same shape generalizes to any
associative aggregate (count, min/max) — sum is what sequence packing
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
) -> DataFrame:
    """Adds `out_col` = inclusive cumulative sum of `value_col` over
    the total order given by `order_cols` (which must be a unique key
    so the order — and therefore the result — is well defined)."""
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_local_sum", F.sum(value_col).over(local_w))
    totals = local.groupBy("_pid").agg(
        F.sum(value_col).alias("_part_total"),
        # range partitioning keeps order-col ranges disjoint; the min
        # keys order the partition totals without trusting pid order.
        *[F.min(c).alias(f"_min_{c}") for c in order_cols],
    )
    off_w = (
        Window.orderBy(*[f"_min_{c}" for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_part_total").over(off_w), F.lit(0)).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_sum") + F.col("_offset"))
        .drop("_pid", "_local_sum", "_offset")
    )
