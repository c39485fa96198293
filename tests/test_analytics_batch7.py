"""Property tests for the late-round-6 extension batches: zone-map
consistency, compaction packing bounds, PSI sign, recall monotonicity,
trigram-search losslessness, sequence-entropy edge cases, and the
A/B-test statistic's internal consistency."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_zonemap_pruned_blocks_contain_no_matches(spark):
    """The data-skipping CLAIM: a block flagged `pruned` for the probe
    range must contain zero rows matching the predicate — zone maps
    are only useful if skipping is never wrong."""
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.pipeline_q import (
        lineitem_zonemap_pruning,
    )

    rows = lineitem_zonemap_pruning(spark, SF).collect()
    mxp = max(
        r["l_partkey"] for r in table(spark, SF, "lineitem").select("l_partkey").collect()
    )
    lo, hi = mxp // 4, mxp // 4 + mxp // 64
    for r in rows:
        if r["pruned"]:
            # Zone disjoint from [lo, hi] by definition of the flag.
            assert r["max_pk"] < lo or r["min_pk"] > hi, r
        else:
            assert r["min_pk"] <= hi and r["max_pk"] >= lo, r
    # The z-order layout must prune a strict majority of its blocks.
    z = [r for r in rows if r["layout"] == "zorder"]
    assert sum(1 for r in z if r["pruned"]) > len(z) / 2


def test_compaction_bins_pack_within_bound(spark):
    """Streaming bin packing bound: every bin except possibly the last
    per partition holds >= target rows once closed, and no bin exceeds
    target + max_file_size - 1 (a file never splits)."""
    from pangenomesasgraphdatabases_spark.queries.pipeline_q import (
        lineitem_compaction_bins,
    )

    rows = lineitem_compaction_bins(spark, SF).collect()
    per_month = defaultdict(list)
    for r in rows:
        per_month[r["midx"]].append(r)
    for midx, files in per_month.items():
        total = sum(f["n_rows"] for f in files)
        target = max(total // 8, 1)
        max_file = max(f["n_rows"] for f in files)
        bins = defaultdict(int)
        for f in files:
            bins[f["bin_id"]] += f["n_rows"]
        for bin_id, size in bins.items():
            assert size <= target + max_file - 1, (midx, bin_id, size, target)
        # Bin ids start at 0 and ascend; a gap is legal exactly when an
        # oversized file (> target) advances the cumulative sum past a
        # whole bin on its own.
        ordered = sorted(bins)
        assert ordered[0] == 0, (midx, ordered)
        if max_file <= target:
            assert ordered == list(range(len(ordered))), (midx, ordered)


def test_psi_contributions_nonnegative_total(spark):
    """PSI is a divergence: each exact-math term (p-q)ln(p/q) >= 0;
    quantization can only flip a term whose magnitude is below one
    fixed-point ulp, so the TOTAL must stay >= 0 on real data."""
    from pangenomesasgraphdatabases_spark.queries.events_q import events_psi_drift

    rows = events_psi_drift(spark, SF).collect()
    assert rows
    total = sum(r["psi_contrib_e10"] for r in rows)
    assert total >= 0, total


def test_ivf_recall_monotone_in_nprobe(spark):
    """More probed lists can only ADD candidates, so recall@10 is
    non-decreasing in nprobe for every query, and nprobe=8 dominates."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        _RECALL_PROBES,
        ann_ivf_recall_curve,
    )

    hits = defaultdict(dict)
    for r in ann_ivf_recall_curve(spark, SF).collect():
        hits[r["query_id"]][r["nprobe"]] = r["n_hits"]
    assert hits
    for qid, by_probe in hits.items():
        assert set(by_probe) == set(_RECALL_PROBES)
        seq = [by_probe[n] for n in sorted(by_probe)]
        assert seq == sorted(seq), (qid, seq)
        assert all(0 <= h <= 10 for h in seq)


def test_trigram_search_matches_plain_scan(spark):
    """Losslessness: the posting-intersection + verify path returns
    exactly the rows a plain contains() scan returns."""
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.queries.relational import (
        _TRGM_PATTERN,
        part_trigram_like_search,
    )

    got = {
        (r["p_partkey"], r["p_name"])
        for r in part_trigram_like_search(spark, SF).collect()
    }
    want = {
        (r["p_partkey"], r["p_name"])
        for r in table(spark, SF, "part")
        .filter(F.col("p_name").contains(_TRGM_PATTERN))
        .collect()
    }
    assert got == want and want


def test_sequence_entropy_nonnegative_and_deterministic_user_zero(spark):
    """NLL totals are >= 0 (each -n_ab*ln(p) term is), and a user whose
    every transition is deterministic (n_ab == n_a throughout) scores
    exactly 0."""
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_user_sequence_entropy,
    )

    rows = events_user_sequence_entropy(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["nll_e4"] >= 0, r
        assert r["n_transitions"] >= 1


def test_ab_ztest_sign_and_p_range(spark):
    """z's sign must match the raw proportion difference and the
    two-sided p lies in [0, 1]; arm sizes are the user-parity split."""
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_ab_test_ztest,
    )

    rows = events_ab_test_ztest(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n0"] > 0 and r["n1"] > 0
        if r["z"] is not None:
            diff = r["x0"] / r["n0"] - r["x1"] / r["n1"]
            if diff != 0:
                assert (r["z"] > 0) == (diff > 0), r
            assert 0.0 <= r["p_two_sided"] <= 1.0
