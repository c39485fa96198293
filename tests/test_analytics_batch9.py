"""Property tests for the final round-6 batches: TwoNN sanity,
held-out LM scoring, IVF/PQ health reports, islands algebra,
error-budget monotonicity, ABC-XYZ completeness."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_twonn_dimension_in_plausible_range(spark):
    """The embeddings are 64-d synthetic vectors: the TwoNN estimate
    must be positive and cannot exceed the ambient dimension by much
    (estimator noise allows some overshoot, not orders of magnitude)."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        emb_twonn_intrinsic_dim,
    )

    r = emb_twonn_intrinsic_dim(spark, SF).collect()[0]
    assert r["n_queries"] >= 10
    assert r["sum_ln_mu_e4"] > 0
    dim = r["intrinsic_dim_micro"] / 1_000_000
    assert 1.0 <= dim <= 128.0, dim


def test_heldout_ppl_scores_only_test_docs(spark):
    """Only odd doc_ids (the held-out half) appear, and every score is
    a genuine NLL (negative sum_lp, positive avg)."""
    from pangenomesasgraphdatabases_spark.queries.text_q import (
        doc_bigram_heldout_ppl,
    )

    rows = doc_bigram_heldout_ppl(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 2 == 1
        assert r["sum_lp_fx"] < 0 and r["avg_nll_e4"] > 0
        assert r["n_bigrams"] >= 1


def test_index_health_reports_cover_everything(spark):
    """IVF balance loads average to ~even (sum of loads = k * 1e6 up
    to integer-division loss) and PQ distortion reports all 8
    subspaces over the full vector count."""
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        _PQ_M,
        emb_ivf_list_balance,
        emb_pq_distortion_report,
    )

    n_vec = table(spark, SF, "embeddings").count()

    bal = emb_ivf_list_balance(spark, SF).collect()
    assert sum(r["n_members"] for r in bal) == n_vec
    k = len(bal)
    total_load = sum(r["load_ppm_of_even"] for r in bal)
    assert k * 1_000_000 - k * k <= total_load <= k * 1_000_000

    dist = emb_pq_distortion_report(spark, SF).collect()
    assert {r["sub"] for r in dist} == set(range(_PQ_M))
    for r in dist:
        assert r["n_vectors"] == n_vec
        assert 0 <= r["mean_sq_dist_micro"] <= r["max_sq_dist_micro"]


def test_islands_algebra(spark):
    """Per customer: islands >= 1, longest <= active months, and the
    total active months equal the customer's distinct order months."""
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        orders_activity_islands,
    )
    from pyspark.sql import functions as F

    rows = orders_activity_islands(spark, SF).collect()
    months = {
        r["o_custkey"]: r["m"]
        for r in table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count_distinct(
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("m")
        )
        .collect()
    }
    assert rows
    for r in rows:
        assert 1 <= r["n_islands"] <= r["active_months"]
        assert r["longest_streak"] <= r["active_months"]
        assert r["active_months"] == months[r["o_custkey"]]


def test_error_budget_burn_monotone_within_window(spark):
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_error_budget_burn,
    )

    by_win = defaultdict(list)
    for r in events_error_budget_burn(spark, SF).collect():
        by_win[r["m30"]].append((r["day"], r["budget_burn_ppm"], r["cum_err"]))
    assert by_win
    for _, rows in by_win.items():
        rows.sort()
        burns = [b for _, b, _ in rows]
        assert burns == sorted(burns), rows


def test_abc_xyz_partitions_all_parts(spark):
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        part_abc_xyz_matrix,
    )
    from pyspark.sql import functions as F

    rows = part_abc_xyz_matrix(spark, SF).collect()
    n_parts_with_sales = (
        table(spark, SF, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts_with_sales
    assert all(r["abc_class"] in "ABC" and r["xyz_class"] in "XYZ" for r in rows)
