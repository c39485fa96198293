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


def materialize_graph(
    graph: PangenomeGraph,
    write,
    max_workers: int = 4,
) -> None:
    """Materialize every graph table by submitting the independent
    output jobs from a small thread pool (r15, guide §2.6: actions are
    only sequential because driver code calls them sequentially — the
    eight table jobs share no dependency, so the scheduler back-fills
    cores idled by one job's stage tails with the next job's tasks).

    ``write(df, name)`` performs one table's output action (noop sink,
    parquet write, ...).  ``ortholog`` runs FIRST and alone: it is the
    cheapest full scan of the shared slim hub (`fc`, persisted by
    build_graph), so when the graph is built with persist=True the
    cache populates exactly once instead of racing across concurrent
    jobs.  That persist IS the no-duplicate-work guarantee (ADVICE
    r15): Spark SQL reuses exchanges only WITHIN one compiled plan —
    separately submitted DataFrame actions get fresh shuffle IDs, so
    with persist=False the concurrent jobs each recompute the shared
    fc lineage (correct, and no slower than the old sequential loop,
    but duplicated).  Do not drop persist=True in the build job
    expecting cross-job stage sharing to cover it.  Job descriptions
    are thread-local, so each table labels its own jobs in the UI."""
    from concurrent.futures import ThreadPoolExecutor

    spark = graph.ortholog.sparkSession

    def _one(name: str) -> None:
        spark.sparkContext.setJobDescription(f"materialize {name}")
        try:
            write(getattr(graph, name), name)
        finally:
            spark.sparkContext.setJobDescription(None)

    _one("ortholog")
    rest = [n for n in _TABLES if n != "ortholog"]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        # list() drains the iterator so the first failure re-raises.
        list(pool.map(_one, rest))


def save_graph(graph: PangenomeGraph, path: str, strain_buckets: int = 64) -> None:
    """Write every vertex/edge table as parquet under <path>/<table>.

    features/feature_in_strain gain a `strain_bucket` partition column
    (stable hash mod strain_buckets) so a 770-strain — or 770k-strain —
    dataset neither creates one tiny partition per strain nor loses
    strain pruning entirely.  Table writes go through materialize_graph
    (r15): eight independent parquet jobs overlap instead of running
    back-to-back."""

    def _write(df, name: str) -> None:
        if name in ("features", "feature_in_strain"):
            df = df.withColumn(
                "strain_bucket",
                F.pmod(F.xxhash64("strain"), F.lit(strain_buckets)),
            )
            df.write.mode("overwrite").partitionBy("strain_bucket").parquet(
                f"{path}/{name}"
            )
        else:
            df.write.mode("overwrite").parquet(f"{path}/{name}")

    materialize_graph(graph, _write)


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
