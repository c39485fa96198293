"""ANN / embedding near-dup: LSH recall vs brute force, and plan
guards asserting the bucketed paths never degenerate to a cross
product (the 100 TB story for the vector suite)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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


def test_ivf_partitions_corpus_and_recall(spark):
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_bruteforce_topk,
        ann_ivf_topk,
        emb_kmeans_ivf,
    )

    clusters = emb_kmeans_ivf(spark, SF).collect()
    assert sum(r.n_members for r in clusters) == 500  # every vector listed once
    assert all(r.n_members > 0 for r in clusters)

    exact = {
        (r.query_id, r.neighbor_id) for r in ann_bruteforce_topk(spark, SF).collect()
    }
    ivf = {(r.query_id, r.neighbor_id) for r in ann_ivf_topk(spark, SF).collect()}
    recall = len(exact & ivf) / len(exact)
    # Random corpus is the IVF worst case (no cluster structure) and
    # nprobe=2/8 scans ~a quarter of it; real embedding corpora cluster.
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_kmeans_iterations_reduce_inertia(spark):
    """Lloyd's must not increase total within-cluster distance."""
    from pangenomesasgraphdatabases_spark.queries import vectors_q as V

    e = V.table(spark, SF, "embeddings").select("vec_id", "embedding")
    ev = V._km_ev(e)

    def inertia(cent):
        scored = ev.crossJoin(F.broadcast(cent)).select(
            "vec_id", V._km_sq_dist(F.col("v"), F.col("cvec")).alias("d")
        )
        return (
            scored.groupBy("vec_id").agg(F.min("d").alias("d")).agg(F.sum("d")).first()[0]
        )

    init = (
        ev.orderBy("vec_id")
        .limit(V._KM_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("v").alias("cvec"),
        )
    )
    assert inertia(V._km_centroids(e)) <= inertia(init)


def test_kmeans_handles_tiny_corpus(spark, tmp_path):
    """Fewer vectors than K: every vector is its own centroid seed;
    assignment still partitions the corpus."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import emb_kmeans_ivf

    rows = [(i, [float(i * 64 + d) for d in range(64)], 0) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")

    out = emb_kmeans_ivf(spark, sf_dir).collect()
    assert sum(r.n_members for r in out) == 3


def test_connected_components_empty_edges(spark):
    from pangenomesasgraphdatabases_spark.operators.components import (
        connected_components,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0


def test_rp_projection_preserves_neighborhood_order(spark):
    """Johnson-Lindenstrauss sanity: distances in the 16-d sign
    projection correlate with the 64-d originals (deterministic corpus
    + fixed seeded matrix -> deterministic correlation)."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.queries.vectors_q import emb_rp_project

    sf = "/root/testdata/sf0.01"
    proj = {
        r.vec_id: np.array([int(x) for x in r.proj_q.split(";")], dtype=float)
        for r in emb_rp_project(spark, sf).collect()
    }
    assert all(len(v) == 16 for v in proj.values())
    orig = {
        r.vec_id: np.array(r.embedding, dtype=float)
        for r in spark.read.parquet(sf + "/embeddings.parquet").limit(60).collect()
    }
    ids = sorted(orig)[:40]
    d_orig, d_proj = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d_orig.append(np.linalg.norm(orig[ids[i]] - orig[ids[j]]))
            d_proj.append(np.linalg.norm(proj[ids[i]] - proj[ids[j]]))
    r = np.corrcoef(d_orig, d_proj)[0, 1]
    # 16 output dims keep distances only coarsely (JL epsilon ~
    # sqrt(ln n / k) is large at k=16); the pinned deterministic value
    # on this corpus is ~0.30 — positive correlation over 780 pairs is
    # the sanity property, not tight isometry.
    assert r > 0.2, f"projected distances decorrelated: r={r:.3f}"


def test_pq_codes_shape_and_range(spark):
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        _PQ_K,
        _PQ_M,
        emb_pq_codes,
    )

    rows = emb_pq_codes(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n
    for r in rows[:50]:
        parts = r.pq_code.split(";")
        assert len(parts) == _PQ_M
        assert all(0 <= int(p) < _PQ_K for p in parts)


def test_pq_adc_recall_vs_bruteforce(spark):
    """ADC is lossy, but on the planted near-dup corpus the PQ top-10
    must overlap the exact top-10 well above chance (10/499)."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_bruteforce_topk,
        ann_pq_adc_topk,
    )

    exact = {}
    for r in ann_bruteforce_topk(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ann_pq_adc_topk(spark, SF).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx) == set(exact)
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.3, recalls


def test_ivfpq_composition_recall(spark):
    """IVF-PQ candidates come only from probed inverted lists, so its
    top-10 is a subset-ranked view of the ADC scores restricted to the
    IVF candidate set; recall vs the exact baseline stays well above
    chance."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_bruteforce_topk,
        ann_ivfpq_topk,
    )

    exact = {}
    for r in ann_bruteforce_topk(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in ann_ivfpq_topk(spark, SF).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact)
    recalls = [len(exact[q] & got[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_rrf_fusion_blends_rankers(spark):
    """RRF must (a) reproduce each contribution exactly as
    1e9 div (60 + rank) over the top-20, (b) actually blend: the two
    source rankers disagree somewhere in the corpus (unnormalized
    vectors), and fused rank 1 tops both contributions."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import ann_rrf_fusion

    rows = ann_rrf_fusion(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 50  # 5 queries x top-10
    for r in rows:
        want = 0
        if r.rank_full <= 20:
            want += 1_000_000_000 // (60 + r.rank_full)
        if r.rank_trunc <= 20:
            want += 1_000_000_000 // (60 + r.rank_trunc)
        assert r.rrf_fx == want
    assert any(r.rank_full != r.rank_trunc for r in rows), "rankers must disagree"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        top = min(rs, key=lambda r: r.fused_rank)
        assert top.rrf_fx == max(r.rrf_fx for r in rs)


def test_truncation_recall_bounds(spark):
    """Metric sanity: overlap@10 <= 10, recall@50 >= overlap@10, the
    true top-1's truncated rank is >= 1, and the cheap ranker is
    imperfect somewhere (some query has overlap < 10) while far from
    random (every query keeps at least half the true top-10 within
    its top-50)."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        ann_truncation_recall,
    )

    rows = ann_truncation_recall(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_overlap_at_10 <= 10
        assert r.n_overlap_at_10 <= r.n_recall_at_50 <= 10
        assert r.trunc_rank_of_top1 >= 1
        assert r.n_recall_at_50 >= 5
    assert any(r.n_overlap_at_10 < 10 for r in rows)


def test_ood_scores_find_planted_outlier(spark):
    """A vector far from the corpus mean must rank first, and
    score_n2 must equal the exact integer n^2 * squared distance to
    the quantized centroid computed in Python."""
    import tempfile

    from pangenomesasgraphdatabases_spark.queries.emb_stats_q import emb_ood_scores

    dims = 64
    rows = []
    for i in range(40):
        v = [0.1] * dims
        v[i % dims] = 0.2
        rows.append((i, v, 0))
    rows.append((99, [-1.0] * dims, 1))  # planted outlier
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(tmp + "/embeddings.parquet")
        out = emb_ood_scores(spark, tmp).collect()

    top = min(out, key=lambda r: r.rank)
    assert top.vec_id == 99

    qs = {r[0]: [round(float(x) * 127) for x in r[1]] for r in rows}
    n = len(rows)
    s = [sum(q[d] for q in qs.values()) for d in range(dims)]
    want99 = sum((qs[99][d] * n - s[d]) ** 2 for d in range(dims))
    assert top.score_n2 == want99


def test_kcenter_coreset_properties(spark):
    """Gonzalez farthest-point invariants: the seed is the lowest
    vec_id at distance 0, the radius curve (dist_prev) is monotone
    NONINCREASING from step 1 on, and picks are distinct."""
    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        _KC_K,
        emb_kcenter_coreset,
    )

    rows = sorted(
        emb_kcenter_coreset(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.step,
    )
    assert len(rows) == _KC_K
    assert rows[0].step == 0 and rows[0].dist_prev == 0.0
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == _KC_K
    assert ids[0] == min(ids)  # seeded at the lowest vec_id
    dists = [r.dist_prev for r in rows[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists


def test_kcenter_select_parameterized_and_unpersist(spark):
    """The parameterized helper (VERDICT r11 #7): k != 8 works, its
    k-round result is a PREFIX of the k'-round result (greedy
    selection is deterministic and incremental), k outside the bound
    raises, and the returned handles release every cached frame."""
    import pytest

    from pangenomesasgraphdatabases_spark.queries.vectors_q import (
        _KC_K_MAX,
        _km_ev,
        kcenter_select,
    )
    from pangenomesasgraphdatabases_spark.data import table

    ev = _km_ev(table(spark, "/root/testdata/sf0.001", "embeddings")).cache()
    out3, h3 = kcenter_select(ev, 3)
    out5, h5 = kcenter_select(ev, 5)
    rows3 = sorted(out3.collect(), key=lambda r: r.step)
    rows5 = sorted(out5.collect(), key=lambda r: r.step)
    assert len(rows3) == 3 and len(rows5) == 5
    assert [(r.step, r.vec_id, r.dist_prev) for r in rows3] == [
        (r.step, r.vec_id, r.dist_prev) for r in rows5[:3]
    ]
    with pytest.raises(ValueError):
        kcenter_select(ev, 0)
    with pytest.raises(ValueError):
        kcenter_select(ev, _KC_K_MAX + 1)
    for h in h3 + h5:
        h.unpersist()
    assert not any(h.is_cached for h in h3 + h5)
    ev.unpersist()
