"""Distributed prefix sum: equality with the naive single-partition
window, robustness to input partitioning, and the plan property that
motivates it (bulk data never funnels through one partition)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.operators.prefix import global_cumsum


def _naive(df, order_cols, value_col):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cs", F.sum(value_col).over(w))


def test_global_cumsum_matches_naive_window(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    got = {r.k: r.cs for r in global_cumsum(df, ["k"], "v", "cs").collect()}
    want = {r.k: r.cs for r in _naive(df, ["k"], "v").collect()}
    assert got == want


def test_global_cumsum_partitioning_invariant(spark):
    base = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13 + 1).alias("v")
    )
    a = global_cumsum(base.repartition(1), ["k"], "v", "cs")
    b = global_cumsum(base.repartition(17), ["k"], "v", "cs")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_cumsum_plan_has_no_bulk_single_partition(spark):
    """The only SinglePartition exchange allowed is over the tiny
    per-partition-totals frame (numPartitions rows); the row-level path
    must stay range/hash partitioned."""
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan = (
        global_cumsum(df, ["k"], "v", "cs")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan, "row path must be range partitioned"
    # the offsets window runs over the totals aggregate, which sits
    # beneath a hash aggregate of the ranged data — the Range scan
    # itself must never feed SinglePartition directly.
    import re

    bulk_single = re.findall(r"Exchange SinglePartition[^\n]*\n(?:[^\n]*\n){0,3}[^\n]*Range \(0, 100000", plan)
    assert not bulk_single, "bulk rows funneled into one partition"


def test_pack_sequences_covers_corpus_contiguously(spark):
    """Packed offsets tile the concatenated corpus with no gaps."""
    from pangenomesasgraphdatabases_spark.queries.curation_q import (
        doc_pack_sequences,
    )

    rows = sorted(
        doc_pack_sequences(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.doc_id,
    )
    pos = 0
    for r in rows:
        assert r.start_tok == pos, "gap or overlap in packed layout"
        assert r.seq_id == r.start_tok // 256
        assert r.offset_in_seq == r.start_tok % 256
        pos += r.n_tok


def test_interval_sweep_invariants(spark):
    """Sweep-line concurrency: never negative, closes at zero (every
    +1 has its -1), peak bounded by the interval count, and the exact
    day-by-day count matches a brute-force cover check on a sample of
    days."""
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        interval_sweep_concurrency,
    )

    sf = "/root/testdata/sf0.001"
    out = interval_sweep_concurrency(spark, sf).cache()
    rows = sorted(out.collect(), key=lambda r: r.day)
    assert all(r.open_intervals >= 0 for r in rows)
    assert rows[-1].open_intervals == 0, "sweep must close at zero"
    assert sum(r.net_delta for r in rows) == 0

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    n_iv = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert max(r.open_intervals for r in rows) <= n_iv

    day = lambda c: F.expr(f"CAST(unix_timestamp({c}) AS BIGINT) div 86400")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.least(day("o_orderdate"), day("l_shipdate")).alias("lo"),
            F.greatest(day("o_orderdate"), day("l_shipdate")).alias("hi"),
        )
        .collect()
    )
    for r in rows[::200]:
        brute = sum(1 for p in iv if p.lo <= r.day <= p.hi)
        assert brute == r.open_intervals, f"day {r.day}"
    spark.catalog.clearCache()


def test_basket_pairs_measures(spark):
    """Support/confidence/lift consistency: support <= min(freq_a,
    freq_b), conf = support/freq_a in micros, and support >= 2 floor
    holds."""
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        order_basket_pairs,
    )

    rows = order_basket_pairs(spark, "/root/testdata/sf0.001").collect()
    assert rows, "sf0.001 has co-occurring pairs"
    for r in rows:
        assert 2 <= r.support <= min(r.freq_a, r.freq_b)
        assert r.conf_a_to_b_micro == r.support * 1_000_000 // r.freq_a
        assert r.conf_a_to_b_micro <= 1_000_000
        assert r.lift_micro > 0


def test_ols_trend_matches_exact_rational(spark):
    """slope_milli equals the exact rational (n*sxy - sx*sy)/(n*sxx -
    sx^2) scaled by 1000 and truncated toward zero — verified against
    Python's Fraction on the raw points, including negative slopes."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        orders_ols_trend,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r.o_orderpriority: r for r in orders_ols_trend(spark, sf).collect()}
    o = table(spark, sf, "orders").select(
        "o_orderpriority",
        F.expr("CAST(unix_timestamp(o_orderdate) AS BIGINT) div 86400").alias("d"),
        F.round("o_totalprice").cast("bigint").alias("y"),
    )
    pts = o.collect()
    d0 = min(r.d for r in pts)
    by_p = {}
    for r in pts:
        by_p.setdefault(r.o_orderpriority, []).append((r.d - d0, r.y))
    assert any(rows[p].slope_milli < 0 for p in rows), "negative slope case"
    for p, xy in by_p.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        frac = Fraction(n * sxy - sx * sy, n * sxx - sx * sx) * 1000
        want = int(frac)  # truncation toward zero, matching div/%
        assert rows[p].slope_milli == want, p
        assert (rows[p].n, rows[p].sx, rows[p].sy) == (n, sx, sy)
