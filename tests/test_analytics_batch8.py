"""Property tests for the late-round-6 batches 9-13: checksum
determinism, Benford share algebra, KM monotonicity, drawdown and
lateness invariants, ANOVA dof sanity, calendar completeness, PMI
support bounds."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_table_checksums_deterministic_and_match_reference(spark):
    """Two runs agree (order-insensitivity is the whole point), and
    the customer checksum matches an independent Python fold of the
    same canonical rendering."""
    import hashlib

    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.relational import (
        star_table_checksums,
    )

    def run():
        return {
            r["tbl"]: (r["n_rows"], r["sum_hi"], r["sum_mid"], r["sum_lo"])
            for r in star_table_checksums(spark, SF).collect()
        }

    a, b = run(), run()
    assert a == b and set(a) == {"orders", "lineitem", "customer"}

    # r14: the 48-bit hash sums as three 16-bit LIMBS — the sf0.1
    # full-registry gate proved a single sum overflows int64 at
    # ~130k rows; the limb triple is 100 TB-safe and carries the
    # same reconciliation power
    hi = mid = lo = 0
    rows = table(spark, SF, "customer").collect()
    for r in rows:
        key = f"{r['c_custkey']}|{r['c_name']}|{r['c_nationkey']}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
        hi += (h >> 32) & 0xFFFF
        mid += (h >> 16) & 0xFFFF
        lo += h & 0xFFFF
    assert a["customer"] == (len(rows), hi, mid, lo)


def test_benford_shares_sum_to_one(spark):
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        lineitem_benford_audit,
    )

    rows = lineitem_benford_audit(spark, SF).collect()
    assert {r["first_digit"] for r in rows} == set(range(1, 10))
    total_ppm = sum(r["observed_ppm"] for r in rows)
    # floor-division rounding loses < 9 ppm across the 9 digits
    assert 1_000_000 - 9 <= total_ppm <= 1_000_000
    benford_total = sum(r["benford_ppm"] for r in rows)
    assert abs(benford_total - 1_000_000) <= 5
    for r in rows:
        assert r["deviation_ppm"] == r["observed_ppm"] - r["benford_ppm"]


def test_km_survival_curve_monotone_nonincreasing(spark):
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        customer_km_survival,
    )

    rows = sorted(customer_km_survival(spark, SF).collect(), key=lambda r: r["t_days"])
    assert rows
    prev = 0
    for r in rows:
        assert r["survival_ln_e4"] <= prev, r
        prev = r["survival_ln_e4"]
        assert r["n_risk"] >= r["d_events"] + r["c_censored"] >= 1


def test_drawdown_and_lateness_nonnegative(spark):
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_max_drawdown,
        events_out_of_order_audit,
    )

    for r in events_max_drawdown(spark, SF).collect():
        assert r["max_drawdown_micro"] >= 0
        assert r["peak_micro"] >= 0 or r["n_events"] >= 1

    for r in events_out_of_order_audit(spark, SF).collect():
        assert 0 <= r["n_late_30m"] <= r["n_late_5m"] <= r["n_events"]
        assert r["max_lateness_s"] >= 0


def test_anova_f_positive_with_sane_dof(spark):
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        part_price_anova_f,
    )

    r = part_price_anova_f(spark, SF).collect()[0]
    assert r["f_micro"] >= 0
    assert r["df_between"] == r["k"] - 1 >= 1
    assert r["df_within"] == r["n"] - r["k"] >= 1


def test_calendar_rollup_covers_full_span(spark):
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.analytics_q import (
        orders_calendar_rollup,
    )
    from pyspark.sql import functions as F

    rows = orders_calendar_rollup(spark, SF).collect()
    o = table(spark, SF, "orders")
    span = o.agg(
        F.expr("CAST(max(unix_timestamp(o_orderdate)) AS BIGINT) div 86400"
               " - CAST(min(unix_timestamp(o_orderdate)) AS BIGINT) div 86400")
    ).collect()[0][0]
    assert sum(r["n_days"] for r in rows) == span + 1
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert {r["dow"] for r in rows} <= set(range(7))


def test_session_pmi_support_bounds(spark):
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_session_pair_pmi,
    )

    rows = events_session_pair_pmi(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["type_a"] < r["type_b"]
