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


def normalize_events(raw: DataFrame) -> DataFrame:
    """Normalize the raw events frame to a stable surface regardless of
    how the generator stored `ts`:

    - TIMESTAMP(NANOS) read as long via the nanosAsLong legacy conf
      (older testdata drops): ts_ns is the raw value, ts is the
      micros-truncated timestamp.
    - TIMESTAMP(MICROS) (current testdata, arrives as TIMESTAMP_NTZ or
      TIMESTAMP): ts is the column itself, ts_ns = unix_micros * 1000.

    SESSION-TIMEZONE PROOFING (r9, caught by tools/probe_env.py): a
    bare NTZ->TZ cast interprets the stored wall time in the SESSION
    timezone, so under a non-UTC driver session every epoch (and every
    day-bucket boundary) would shift by the UTC offset —
    events_error_budget_burn read 31 rows instead of 30 under an
    America/New_York session.  The NTZ branch therefore re-anchors the
    cast with from_utc_timestamp(.., current_timezone()), which is the
    bit-exact identity under UTC and "treat the wall time as UTC"
    under any other session timezone — matching DuckDB's naive
    epoch(ts) everywhere.  (Instants inside a DST transition hour
    could still shift by 1h under a DST session; the synthetic data
    has none, and UTC sessions are unaffected.)

    Downstream queries only ever see (ts_ns BIGINT, ts TIMESTAMP)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(raw.schema["ts"].dataType, LongType):
        ts_ns = F.col("ts").alias("ts_ns")
        ts = F.timestamp_micros(F.expr("ts div 1000")).alias("ts")
    else:
        if isinstance(raw.schema["ts"].dataType, TimestampNTZType):
            ts_col = F.expr(
                "from_utc_timestamp(cast(ts as timestamp), current_timezone())"
            )
        else:
            ts_col = F.col("ts").cast("timestamp")
        ts_ns = (F.unix_micros(ts_col) * F.lit(1000)).alias("ts_ns")
        ts = ts_col.alias("ts")
    return raw.select(
        "event_id", ts_ns, ts, "user_id", "event_type", "value", "props"
    )


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet through normalize_events (schema-adaptive;
    the nanosAsLong conf is harmless when the file stores micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_events(spark.read.parquet(f"{sf_dir}/events.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based queries)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
