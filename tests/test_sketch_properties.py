"""Property tests for the mergeable-sketch family: the guarantees the
queries hash (one-sidedness, mergeability, bucket containment) must
hold on ADVERSARIAL inputs, not just the driver testdata."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# derandomize: fixed example sequence run-to-run — the suite is a
# regression gate, so reproducibility beats fresh randomness, and it
# skips the example-database bookkeeping (r16 suite-budget work,
# VERDICT r15 #2; example COUNT is unchanged).
SLOW = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60)
)
@SLOW
def test_cms_one_sided_on_random_multisets(spark, keys):
    """est >= exact for every key of any multiset, even at width 2
    (maximal collisions)."""
    from pangenomesasgraphdatabases_spark.queries.events_q import cms_counts

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    out = cms_counts(df, "user_id", depth=2, width=2).collect()
    assert {r.user_id for r in out} == set(keys)
    for r in out:
        assert r.est_n >= r.exact_n == keys.count(r.user_id)


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=80
    ),
    split=st.integers(min_value=0, max_value=7),
)
@SLOW
def test_hll_registers_merge_invariant(spark, keys, split):
    """Any partition of the input into shards max-merges to the same
    registers as the one-shot build — the property that makes the
    sketch safe to build incrementally / distributed."""
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.queries.events_q import hll_registers

    df = spark.createDataFrame([(k, "g") for k in keys], "k long, grp string")
    whole_df = hll_registers(df, "k", ["grp"], p=4)
    sh1 = hll_registers(
        df.filter(F.col("k") % 8 <= split), "k", ["grp"], p=4
    )
    sh2 = hll_registers(
        df.filter(F.col("k") % 8 > split), "k", ["grp"], p=4
    )
    merged_df = (
        sh1.unionByName(sh2)
        .groupBy("grp", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    # ONE collect for both sides (r16 suite budget): per-example wall
    # here is Spark job latency on 60 rows, not data — the tagged
    # union halves it without touching what is asserted.
    rows = (
        whole_df.select(F.lit("w").alias("side"), "grp", "reg", "max_rho")
        .unionByName(
            merged_df.select(
                F.lit("m").alias("side"), "grp", "reg", "max_rho"
            )
        )
        .collect()
    )
    whole = sorted((r.grp, r.reg, r.max_rho) for r in rows if r.side == "w")
    merged = sorted((r.grp, r.reg, r.max_rho) for r in rows if r.side == "m")
    assert whole == merged


@given(
    vals=st.lists(
        st.integers(min_value=-(10**7), max_value=10**7),
        min_size=1,
        max_size=60,
    )
)
@SLOW
def test_bloom_has_no_false_negatives(spark, vals):
    """Every corpus member probed against the filter must hit — the
    one-sided Bloom guarantee on arbitrary integer corpora."""
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.queries.text_q import (
        _BLOOM_K,
        _bloom_bit,
    )

    df = spark.createDataFrame([(v,) for v in set(vals)], "x long").select(
        F.md5(F.col("x").cast("string")).alias("fp")
    )
    bits = None
    for j in range(_BLOOM_K):
        part = df.select(F.lit(j).alias("j"), _bloom_bit(j, F.col("fp")).alias("bit"))
        bits = part if bits is None else bits.unionByName(part)
    present = {(r.j, r.bit) for r in bits.distinct().collect()}
    probes = bits.collect()
    for r in probes:
        assert (r.j, r.bit) in present


@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=60),
        min_size=2,
        max_size=12,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_passjoin_exact_recall_on_random_text(spark, texts, tmp_path_factory):
    """PassJoin + short-prefix fallback must find EXACTLY the pairs
    the declared predicate admits, on adversarial random strings —
    including prefixes shorter than 40 chars (the fallback path the
    driver corpus never exercises) and repeated characters (hot
    segment values)."""
    import re

    from pangenomesasgraphdatabases_spark.queries.text_q import (
        _FUZZ_LEN,
        _FUZZ_MAXD,
        _FUZZ_PFX,
        doc_fuzzy_match_pairs,
    )

    def norm_prefix(t):
        return re.sub(r"\s+", " ", t.strip()).lower()[:_FUZZ_PFX]

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    tmp = tmp_path_factory.mktemp("fz")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        (r.doc_a, r.doc_b)
        for r in doc_fuzzy_match_pairs(spark, str(tmp)).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if abs(a[4] - b[4]) > _FUZZ_LEN:
                continue
            if lev(norm_prefix(a[1]), norm_prefix(b[1])) <= _FUZZ_MAXD:
                want.add((a[0], b[0]))
    assert got == want
