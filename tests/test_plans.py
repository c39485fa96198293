"""Physical-plan regression guards: pushdown, broadcasts, bucketed
co-located joins (the 100 TB story, asserted on actual plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    from pangenomesasgraphdatabases_spark.queries.relational import threshold_filter

    plan = _plan(threshold_filter(spark, SF))
    assert "DataFilters: [" in plan
    assert "p_size" in plan.split("DataFilters")[1][:200]


def test_multiway_join_broadcasts_dims(spark):
    from pangenomesasgraphdatabases_spark.queries.relational import (
        multiway_join_revenue,
    )

    plan = _plan(multiway_join_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_flagship_single_shuffle(spark):
    from pangenomesasgraphdatabases_spark.queries.flagship import gi_scan_flagship

    plan = _plan(gi_scan_flagship(spark, SF))
    # All windows share the l_suppkey partitioning: exactly one
    # shuffle exchange in the whole plan.
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bucketed_join_has_no_shuffle(spark, pangenome, tmp_path_factory):
    from pangenomesasgraphdatabases_spark.graph.storage import save_bucketed_tables

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed_tables(pangenome, spark, database="pg_test", n_buckets=4)
        f = spark.table("pg_test.features_by_fid")
        o = spark.table("pg_test.ortholog_by_fid")
        joined = f.join(o, "feature_id").select("feature_id", "cluster_id", "strain")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # Co-located buckets: no shuffle exchange anywhere in the join.
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == pangenome.ortholog.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP DATABASE IF EXISTS pg_test CASCADE")
