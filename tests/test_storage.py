"""Graph persistence round-trip + RGP equivalence on the reloaded graph."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_save_load_roundtrip(spark, pangenome, tmp_path_factory):
    from pangenomesasgraphdatabases_spark.graph.rgp import find_rgps
    from pangenomesasgraphdatabases_spark.graph.storage import load_graph, save_graph

    path = str(tmp_path_factory.mktemp("graph_store"))
    save_graph(pangenome, path, strain_buckets=4)
    g2 = load_graph(spark, path)

    # Multiset comparison on feature_id, not bare counts: one r16 full-suite
    # run read 342 rows back for a 332-row frame (unreproducible in 20
    # isolated roundtrips + cache churn); if that race ever recurs, the
    # failure must name the duplicated/missing ids, not just the delta.
    before_ids = sorted(r.feature_id for r in pangenome.features.select("feature_id").collect())
    after_ids = sorted(r.feature_id for r in g2.features.select("feature_id").collect())
    if before_ids != after_ids:
        from collections import Counter

        b, a = Counter(before_ids), Counter(after_ids)
        raise AssertionError(
            f"roundtrip id multiset mismatch: extra={sorted((a - b).elements())} "
            f"missing={sorted((b - a).elements())}"
        )
    assert sorted(g2.features.columns) == sorted(pangenome.features.columns)
    assert g2.cluster_neighbour.count() == pangenome.cluster_neighbour.count()

    before = {
        (r.StrainName, r.Anchor1ID, r.Anchor2ID, r.InsertionStart)
        for r in find_rgps(pangenome).collect()
    }
    after = {
        (r.StrainName, r.Anchor1ID, r.Anchor2ID, r.InsertionStart)
        for r in find_rgps(g2).collect()
    }
    assert before == after and before


def test_compact_parquet_reduces_files(spark, tmp_path):
    from pangenomesasgraphdatabases_spark.graph.storage import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    n = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n == 1
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 1
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before  # lossless rewrite


def test_compact_parquet_recovers_stale_old_dir(spark, tmp_path):
    """Rename-aside swap (ADVICE r2): a leftover `path__old` from a
    crash after swap-in must not block the next compaction, and the
    table stays readable with identical contents afterwards."""
    from pangenomesasgraphdatabases_spark.graph.storage import compact_parquet

    path = str(tmp_path / "t")
    spark.range(1000).repartition(8).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    # simulate debris from an earlier crash
    spark.range(5).write.parquet(path + "__old")
    compact_parquet(spark, path, target_file_bytes=10**9)
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before
    import os
    assert not os.path.exists(path + "__old"), "debris cleaned up"
    assert not os.path.exists(path + "__compact_tmp")
