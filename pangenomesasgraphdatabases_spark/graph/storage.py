"""Persistence for the pangenome graph: Parquet as the internal format
(typed, columnar — replaces the reference's header-only CSV
interchange, SURVEY.md section 1.1), with the partitioning strategy a
100 TB deployment needs baked into the layout:

- `features` partitioned by strain prefix buckets: genome-order windows
  then read one genome entirely within a partition (partition pruning
  for single-strain queries, no shuffle for per-strain windows when the
  in-memory frame is already strain-partitioned).
- edge tables laid out by join key so co-located joins are possible via
  bucketing (saveAsTable path) or at minimum benefit from file-level
  min/max pruning.

CSV writers are kept for reference-format compatibility (S6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.graph.build import PangenomeGraph

_TABLES = (
    "features",
    "clusters",
    "strains",
    "ortholog",
    "feature_neighbour",
    "cluster_neighbour",
    "feature_in_strain",
    "cluster_in_strain",
)


def save_graph(graph: PangenomeGraph, path: str, strain_buckets: int = 64) -> None:
    """Write every vertex/edge table as parquet under <path>/<table>.

    features/feature_in_strain gain a `strain_bucket` partition column
    (stable hash mod strain_buckets) so a 770-strain — or 770k-strain —
    dataset neither creates one tiny partition per strain nor loses
    strain pruning entirely."""
    bucketed = graph.features.withColumn(
        "strain_bucket", F.pmod(F.xxhash64("strain"), F.lit(strain_buckets))
    )
    bucketed.write.mode("overwrite").partitionBy("strain_bucket").parquet(
        f"{path}/features"
    )
    fis = graph.feature_in_strain.withColumn(
        "strain_bucket", F.pmod(F.xxhash64("strain"), F.lit(strain_buckets))
    )
    fis.write.mode("overwrite").partitionBy("strain_bucket").parquet(
        f"{path}/feature_in_strain"
    )
    for name in _TABLES:
        if name in ("features", "feature_in_strain"):
            continue
        getattr(graph, name).write.mode("overwrite").parquet(f"{path}/{name}")


def load_graph(spark: SparkSession, path: str) -> PangenomeGraph:
    dfs = {}
    for name in _TABLES:
        df = spark.read.parquet(f"{path}/{name}")
        if "strain_bucket" in df.columns:
            df = df.drop("strain_bucket")
        dfs[name] = df
    return PangenomeGraph(**dfs)


def save_bucketed_tables(
    graph: PangenomeGraph,
    spark: SparkSession,
    database: str = "pangenome",
    n_buckets: int = 16,
) -> None:
    """Bucketed saveAsTable layout for co-located joins: features and
    ortholog bucketed + sorted by feature_id, ortholog additionally
    mirrored bucketed by cluster_id, cluster tables by cluster_id.

    On a cluster this is THE layout for the hot joins
    (feature <-> ortholog <-> cluster): both sides pre-hashed into the
    same bucket count means the join plans with zero Exchange
    (SortMergeJoin reads matching buckets directly) — the declarative
    replacement for Neo4j's id indexes (01_creatingDatabase.cypher:57).
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    (
        graph.features.write.mode("overwrite")
        .bucketBy(n_buckets, "feature_id")
        .sortBy("feature_id")
        .saveAsTable(f"{database}.features_by_fid")
    )
    (
        graph.ortholog.write.mode("overwrite")
        .bucketBy(n_buckets, "feature_id")
        .sortBy("feature_id")
        .saveAsTable(f"{database}.ortholog_by_fid")
    )
    (
        graph.ortholog.write.mode("overwrite")
        .bucketBy(n_buckets, "cluster_id")
        .sortBy("cluster_id")
        .saveAsTable(f"{database}.ortholog_by_cid")
    )
    (
        graph.clusters.write.mode("overwrite")
        .bucketBy(n_buckets, "cluster_id")
        .sortBy("cluster_id")
        .saveAsTable(f"{database}.clusters_by_cid")
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files; returns the new file count.

    Streaming sinks and incremental appends accumulate files far below
    the scan-efficient size; at 100 TB that poisons listing time and
    task planning.  Periodic compaction is the plain-parquet equivalent
    of Delta/Iceberg OPTIMIZE.  The rewrite lands in a temp directory
    first; the swap is rename-aside (path -> path__old, tmp -> path,
    delete path__old) so the original data survives every crash point:
    a failure before the swap-in rename leaves `path__old` (or `path`)
    intact and recoverable, never a window with no table at all
    (delete-then-rename had exactly that window — ADVICE r2)."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp_p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_tmp")
    old_p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    df.repartition(n).write.mode("overwrite").parquet(tmp_p.toString())
    if fs.exists(old_p):  # leftover from an earlier crash after swap-in
        fs.delete(old_p, True)
    if not fs.rename(hpath, old_p):
        raise IOError(f"compact_parquet: cannot move {path} aside")
    if not fs.rename(tmp_p, hpath):
        # roll the original straight back; nothing was lost.
        fs.rename(old_p, hpath)
        raise IOError(f"compact_parquet: cannot swap in compacted {path}")
    fs.delete(old_p, True)
    return n
