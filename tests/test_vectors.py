"""ANN / embedding near-dup: LSH recall vs brute force, and plan
guards asserting the bucketed paths never degenerate to a cross
product (the 100 TB story for the vector suite)."""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ann_lsh_recall_vs_bruteforce(spark):
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_bruteforce_topk,
        ann_lsh_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id) for r in ann_bruteforce_topk(spark, SF).collect()
    }
    lsh = {(r.query_id, r.neighbor_id) for r in ann_lsh_topk(spark, SF).collect()}
    recall = len(exact & lsh) / len(exact)
    # Random vectors are LSH's worst case; measured 0.96 on this corpus.
    assert recall >= 0.8, f"ANN LSH recall {recall:.2f} < 0.8"


def test_near_dup_bucketed_subset_of_exact(spark):
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        emb_cosine_near_dup,
        emb_cosine_near_dup_exact,
    )

    exact = {(r.vec1, r.vec2) for r in emb_cosine_near_dup_exact(spark, SF).collect()}
    lsh = {(r.vec1, r.vec2) for r in emb_cosine_near_dup(spark, SF).collect()}
    assert lsh <= exact  # candidates are scored exactly: no false pairs
    assert len(lsh) / len(exact) >= 0.8  # measured 0.90 at threshold

    import pytest

    with pytest.raises(ValueError, match="gated"):
        emb_cosine_near_dup_exact(spark, SF, max_vectors=10)


def test_vector_lsh_paths_have_no_cartesian(spark):
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_lsh_topk,
        emb_cosine_near_dup,
    )

    for q in (ann_lsh_topk, emb_cosine_near_dup):
        plan = _plan(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
