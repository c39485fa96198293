"""Corpus-curation operators: planted-scenario behavior checks
(the oracle gate covers engine parity; these pin semantics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.queries.curation_q import (
    _CAP_N,
    _CHUNK_C,
    _CHUNK_S,
    _DECON_EVAL_MAX_ID,
    _DECON_N,
    _SAMPLE_DEFAULT,
    _SAMPLE_RATES,
    doc_chunk_windows,
    doc_decontaminate,
    doc_source_cap,
    doc_stratified_sample,
    doc_vocab_coverage,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _docs_dir(spark, tmp_path, rows):
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    d = d.withColumn("n_chars", F.length("text"))
    path = str(tmp_path / "docs")
    d.write.parquet(path + "/documents.parquet")
    return path


def test_decontaminate_flags_planted_benchmark_copy(spark, tmp_path):
    eval_text = " ".join(f"bench{i}" for i in range(12))
    rows = [
        (1, eval_text, "en", "eval"),                  # benchmark doc
        # train doc quoting 8 benchmark tokens -> 8-(n-1)=4 hit 5-grams
        (100, "intro words " + " ".join(f"bench{i}" for i in range(8)), "en", "tr"),
        (101, "totally unrelated words only here", "en", "tr"),
    ]
    assert rows[0][0] < _DECON_EVAL_MAX_ID <= rows[1][0]
    out = {r.doc_id: r.n_hit_grams for r in
           doc_decontaminate(spark, _docs_dir(spark, tmp_path, rows)).collect()}
    assert out == {100: 8 - (_DECON_N - 1)}, "only the quoting doc is flagged"


def test_chunk_windows_span_and_overlap(spark, tmp_path):
    n_tok = 35
    rows = [(1, " ".join(f"t{i}" for i in range(n_tok)), "en", "s")]
    out = sorted(
        doc_chunk_windows(spark, _docs_dir(spark, tmp_path, rows)).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts at 1, 11, 21, 31 for C=20, S=10 over 35 tokens
    assert [r.start_tok for r in out] == [1, 11, 21, 31]
    assert [r.end_tok for r in out] == [20, 30, 35, 35]
    assert all(r.end_tok - r.start_tok + 1 <= _CHUNK_C for r in out)
    assert out[1].start_tok - out[0].start_tok == _CHUNK_S
    assert len({r.chunk_hash for r in out}) == len(out)


def test_source_cap_keeps_exactly_cap_per_source(spark):
    out = doc_source_cap(spark, SF)
    kept = out.filter("kept = 1").groupBy("source").count().collect()
    per_source = out.groupBy("source").count().collect()
    n_min = {r.source: min(r["count"], _CAP_N) for r in per_source}
    assert {r.source: r["count"] for r in kept} == n_min
    # deterministic: same order on a re-run
    a = sorted(map(tuple, out.filter("kept = 1").select("doc_id").collect()))
    b = sorted(map(tuple, doc_source_cap(spark, SF).filter("kept = 1")
                   .select("doc_id").collect()))
    assert a == b


def test_stratified_sample_rates_and_determinism(spark):
    out = doc_stratified_sample(spark, SF)
    got = out.groupBy("source").count().collect()
    totals = {
        r.source: r["count"]
        for r in doc_source_cap(spark, SF).groupBy("source").count().collect()
    }
    for r in got:
        rate = _SAMPLE_RATES.get(r.source, _SAMPLE_DEFAULT)
        # md5 buckets are uniform-ish; with 25 docs/source allow wide
        # tolerance but assert the ORDERING of rates shows through in
        # aggregate below rather than per-source.
        assert r["count"] <= totals[r.source]
    n_src0 = next((r["count"] for r in got if r.source == "src0"), 0)
    n_default = sum(r["count"] for r in got
                    if r.source not in _SAMPLE_RATES)
    n_default_srcs = len(totals) - len(_SAMPLE_RATES)
    assert n_src0 > n_default / n_default_srcs, (
        "the 50%-rate source keeps more than an average 10% source"
    )
    assert out.exceptAll(doc_stratified_sample(spark, SF)).isEmpty()


def test_vocab_coverage_monotonic_and_bounded(spark):
    out = sorted(doc_vocab_coverage(spark, SF).collect(), key=lambda r: r.rank)
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True), "ranked by descending count"
    ppm = [r.cum_ppm for r in out]
    assert ppm == sorted(ppm), "cumulative coverage is monotonic"
    assert 0 < ppm[-1] <= 1_000_000


def test_kfold_balanced_within_every_source(spark):
    """Round-robin dealing: within each source every fold's share
    differs by at most one; folds partition the corpus; reruns are
    identical."""
    from collections import Counter

    from pangenomesasgraphdatabases_spark.queries.curation_q import doc_kfold_split

    sf = "/root/testdata/sf0.01"
    a = doc_kfold_split(spark, sf).collect()
    b = {r.doc_id: r.fold for r in doc_kfold_split(spark, sf).collect()}
    assert all(b[r.doc_id] == r.fold for r in a)
    by_source = {}
    for r in a:
        by_source.setdefault(r.source, Counter())[r.fold] += 1
    for src, folds in by_source.items():
        assert set(folds) <= set(range(5))
        assert max(folds.values()) - min(folds.values()) <= 1, src
    assert len(a) == 500


def test_token_budget_mixture_properties(spark):
    """Temperature-0.5 smoothing: weights sum to ~1e6 micros (floor
    slack < n_sources), the allocation is monotone in token count,
    and smoothing compresses the spread vs raw shares (the point of
    the temperature)."""
    from pangenomesasgraphdatabases_spark.queries.curation_q import (
        doc_token_budget_mixture,
    )

    rows = doc_token_budget_mixture(spark, SF).collect()
    total_micro = sum(r.mix_micro for r in rows)
    assert 1_000_000 - len(rows) <= total_micro <= 1_000_000
    by_tokens = sorted(rows, key=lambda r: (r.n_tokens, r.source))
    mixes = [r.mix_micro for r in by_tokens]
    assert mixes == sorted(mixes)
    # smoothing: smoothed share of the largest source is BELOW its raw
    # share; of the smallest source, above (strictly, when unequal).
    tot_tokens = sum(r.n_tokens for r in rows)
    big, small = by_tokens[-1], by_tokens[0]
    if big.n_tokens != small.n_tokens:
        assert big.mix_micro * tot_tokens < big.n_tokens * 1_000_000
        assert small.mix_micro * tot_tokens > small.n_tokens * 1_000_000


def test_prefix_canonical_pick_is_longest_member(spark):
    """Every reported canonical doc belongs to its prefix cluster,
    has the cluster's max length, and chars_saved equals the bytes of
    the dropped members."""
    from pangenomesasgraphdatabases_spark.queries.text_q import (
        doc_prefix_canonical_pick,
    )

    got = doc_prefix_canonical_pick(spark, SF).collect()
    assert got, "sf0.01 corpus has prefix clusters"
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            "n_chars",
            F.array_join(
                F.slice(F.split(F.trim("text"), " "), 1, 5), " "
            ).alias("k"),
        )
        .collect()
    )
    clusters: dict[str, list] = {}
    for d in docs:
        clusters.setdefault(d.k, []).append(d)
    for r in got:
        members = clusters[r.prefix_key]
        assert r.n_members == len(members) and len(members) > 1
        best = max(members, key=lambda m: (m.n_chars, -m.doc_id))
        assert r.max_chars == best.n_chars
        assert r.canonical_doc_id == min(
            m.doc_id for m in members if m.n_chars == r.max_chars
        )
        assert r.chars_saved == sum(m.n_chars for m in members) - r.max_chars
