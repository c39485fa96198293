"""Loaders for the driver's synthetic star-schema parquet tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default.  Read nanos as long (legacy conf, safe to
    set at runtime) and expose both the exact nanos (`ts_ns`) and a
    micros-truncated proper timestamp (`ts`)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based queries)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
