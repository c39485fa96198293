"""Traversal equivalence: iterative expansion == interval formulation
on the chain-shaped pangenome graph, plus a non-chain digraph case."""

from __future__ import annotations

from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.operators.traversal import (
    expand_paths,
    interval_paths,
)


def test_interval_matches_iterative_on_chain(spark, pangenome):
    nodes = pangenome.features.select("feature_id", "strain", "feature_start")
    iv = interval_paths(
        nodes, "strain", "feature_start", "feature_id", min_hops=2, max_hops=4
    )
    edges = pangenome.feature_neighbour.select(
        F.col("src_feature_id").alias("src"), F.col("dst_feature_id").alias("dst")
    )
    it = expand_paths(edges, min_hops=2, max_hops=4)
    a = {(r.src, r.dst, r.hops) for r in iv.collect()}
    b = {(r.origin, r.dst, r.hops) for r in it.collect()}
    assert a == b
    assert len(a) > 0


def test_expand_paths_source_filter(spark, pangenome):
    edges = pangenome.feature_neighbour.select(
        F.col("src_feature_id").alias("src"), F.col("dst_feature_id").alias("dst")
    )
    srcs = spark.createDataFrame([("S01_00000",)], ["src"])
    out = expand_paths(edges, 1, 3, sources=srcs).collect()
    got = {(r.dst, r.hops) for r in out}
    assert got == {
        ("S01_00001", 1),
        ("S01_00002", 2),
        ("S01_00003", 3),
    }


def test_expand_paths_on_dag(spark):
    # Diamond a->b, a->c, b->d, c->d: two 2-hop paths a->d (pair
    # reported per hop count once per route).
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], ["src", "dst"]
    )
    out = expand_paths(edges, 1, 2)
    rows = [(r.origin, r.dst, r.hops) for r in out.collect()]
    assert ("a", "d", 2) in rows
    assert rows.count(("a", "d", 2)) == 2  # both routes enumerated
    assert ("a", "b", 1) in rows and ("a", "c", 1) in rows
