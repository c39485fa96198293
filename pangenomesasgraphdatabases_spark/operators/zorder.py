"""Z-order (Morton) data layout for data-skipping file pruning.

At 100 TB, predicates on two independent columns can't both benefit
from a single-column sort: sorting by A gives perfect min/max pruning
on A and none on B.  Interleaving the bits of both columns into one
Z-value and range-partitioning by it gives each output file a small
rectangle of (A, B) space, so parquet footer min/max stats prune files
for predicates on EITHER column — the OPTIMIZE ZORDER story from
Delta/Iceberg, on plain parquet with no table format required.

The z-value expression uses only floor/%/* arithmetic (no bit-op
builtins) so the identical SQL runs on Spark and DuckDB — see
queries/pipeline_q._zvalue_sql, which oracles it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative int columns (x bit i ->
    z bit 2i, y bit i -> z bit 2i+1), JVM-side arithmetic only."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (F.shiftright(x.cast("bigint"), i) % 2) * F.lit(1 << (2 * i))
        z = z + (F.shiftright(y.cast("bigint"), i) % 2) * F.lit(1 << (2 * i + 1))
    return z


def zorder_repartition(
    df: DataFrame, col_x: str, col_y: str, n_files: int, bits: int = 16
) -> DataFrame:
    """Repartition `df` into `n_files` range partitions of the Z-value
    of (col_x, col_y) — write the result with .write.parquet() and each
    file covers a compact rectangle of the key space.  The z column is
    dropped after partitioning; sortWithinPartitions keeps rows z-local
    inside each file so page-level stats prune too."""
    mask = (1 << bits) - 1
    z = zvalue(F.col(col_x) % F.lit(mask + 1), F.col(col_y) % F.lit(mask + 1), bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
