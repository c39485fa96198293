"""Skew-mitigation helpers (SURVEY.md section 4 scale rules).

AQE's skew-join handling covers most cases at runtime; these helpers
are for the two shapes AQE doesn't fix:

- `salted_agg`: two-phase aggregation for a heavily skewed group key —
  phase 1 aggregates (key, salt) partials, phase 2 merges per key.
  Works for any algebraic aggregate expressed as (partial, merge).
- `salted_broadcast_join`: explode the small side over the salt domain
  so a skewed big-side key spreads across `salt_n` tasks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_n: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable hash of the whole
    row (deterministic across retries, unlike rand())."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partial: dict[str, Column],
    merge: Callable[[DataFrame], DataFrame],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `partial` maps output-column name -> aggregate Column for phase 1
    (per (key, salt)); `merge` takes the phase-1 frame grouped state
    and reduces per key.  Example:

        salted_agg(li, "l_suppkey",
                   {"cnt": F.count(F.lit(1)), "s": F.sum("l_quantity")},
                   lambda d: d.groupBy("l_suppkey")
                              .agg(F.sum("cnt").alias("cnt"),
                                   F.sum("s").alias("s")))
    """
    salted = with_salt(df, salt_n)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[c.alias(n) for n, c in partial.items()]
    )
    return merge(phase1.drop("_salt"))


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, salt_n: int = 16
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across the salt domain, join on (key, salt).  The small side must
    actually be broadcastable x salt_n."""
    big_s = with_salt(big, salt_n)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = big_s.join(F.broadcast(small_s), [key, "_salt"])
    return out.drop("_salt")


# In-row pair expansion builds its pair batch as ONE flatten() value
# before the explode streams it out, so the chunk width caps that
# value's memory: 1024 -> at most ~1M structs (~32 MB) per batch, the
# largest single allocation the expansion may make, regardless of how
# hot the list is.
PAIR_EXPANSION_CAP = 1024


def capped_pair_rows(
    posts: DataFrame,
    list_col: str,
    cap: int = PAIR_EXPANSION_CAP,
) -> DataFrame:
    """(lo, hi) rows — one per i<j position pair of each row's SORTED
    DISTINCT id array — with the quadratic hot-list memory hazard
    capped (VERDICT r15 #3, guide §2.5).

    The uncapped r15 array surgery built the whole |L|(|L|-1)/2 struct
    array as one flatten() value, so a hot posting list risked executor
    OOM (the pre-r15 self-join streamed the same pairs through a join
    iterator: slow task, never OOM).  Here the sorted array is cut into
    ceil(L/cap) chunks and the chunk-pair index space is exploded FIRST:

      gen1  posexplode(chunks)                 -> (ci, a) carrying chunks
      gen2  posexplode(slice(chunks, ci+1, ..))-> (k, b); k=0 means b==a
      gen3  explode(pair batch)                -> (lo, hi)

    where the pair batch is the i<j intra-chunk surgery when k=0 and
    the full a x b cross product otherwise (sorted disjoint ranges:
    every a value < every b value).  Each flatten is <= cap^2 structs
    and the carried columns stay linear in L, so per-row memory is
    bounded; a hot key still streams its pairs in one task — the
    pre-r15 hazard class — but can no longer OOM.  Lists that fit one
    chunk (every list on skew-free data) take gen1/gen2 as single-row
    pass-throughs and the pair batch is EXACTLY the r15 expression: one
    lineage, no joins, no cache, no second execution of ``posts``.
    Output multiset is identical to the uncapped expansion by
    construction (each unordered pair lands in exactly one chunk cell;
    ids are distinct and the array sorted, so i<j == lo < hi)."""
    size = F.size(list_col)
    # greatest(…, 1): an all-null group collects an EMPTY array, and
    # sequence(0, -1) would raise rather than return [].
    n_chunks = F.greatest(F.ceil(size / F.lit(cap)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.slice(list_col, k * cap + 1, cap),
    )
    g1 = posts.select(
        F.col(list_col).alias("_l"),  # only for the chunks expr below
        F.posexplode(chunks).alias("_ci", "_a"),
    )
    # Re-derive the remaining chunks from _l (carrying the full chunk
    # array through gen1 would be a second linear copy per chunk row).
    n1 = F.greatest(F.ceil(F.size("_l") / F.lit(cap)).cast("int"), F.lit(1))
    rest = F.transform(
        F.sequence(F.col("_ci"), n1 - 1),
        lambda k: F.slice("_l", k * cap + 1, cap),
    )
    g2 = g1.select("_a", F.posexplode(rest).alias("_k", "_b"))
    intra = F.flatten(
        F.transform(
            "_a",
            lambda x, i: F.transform(
                F.slice("_a", i + 2, F.size("_a") - i - 1),
                lambda y: F.struct(x.alias("lo"), y.alias("hi")),
            ),
        )
    )
    cross = F.flatten(
        F.transform(
            "_a",
            lambda x: F.transform(
                "_b", lambda y: F.struct(x.alias("lo"), y.alias("hi"))
            ),
        )
    )
    batch = F.when(F.col("_k") == 0, intra).otherwise(cross)
    return g2.select(F.explode(batch).alias("p")).select(
        F.col("p.lo").alias("lo"), F.col("p.hi").alias("hi")
    )


def hot_key_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    spread_col: str,
    hot_min: int = 16_384,
    salt_n: int = 16,
) -> DataFrame:
    """Inner equi-join ``left ⋈ right`` on ``key``, differential-salted
    against hot keys on the LEFT side (VERDICT r9 #6).

    The shape this protects: a pair/verification frame joined to a
    per-key item frame — e.g. LSH candidate pairs (doc1, doc2) joined
    to (doc1, shingle) — where one template-like key can hold the bulk
    of the pairs.  A plain hash/SMJ join lands every row of a hot key
    in one task; salting EVERYTHING multiplies the right side's
    shuffle volume by ``salt_n`` even when no skew exists.  So: keys
    with more than ``hot_min`` left rows (detected with one cheap agg
    of the left frame) are joined through a deterministic salt derived
    from ``spread_col`` (row-stable, no rand()), with ONLY the hot
    keys' right rows replicated ``salt_n`` ways; all other keys join
    untouched.  On a skew-free input the hot frame is empty and both
    branches degenerate to the plain join plus one empty-broadcast
    probe.  Output rows are exactly the plain join's.

    ``left`` is cached (the plan reads it three times: hot detection,
    hot branch, cold branch); caller-side clearCache reclaims it, the
    same lifecycle policy as queries/text_q."""
    left = left.cache()
    hot = (
        left.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_min)
        .select(key)
    )
    cold = left.join(F.broadcast(hot), key, "left_anti").join(right, key)
    left_hot = left.join(F.broadcast(hot), key).withColumn(
        "_salt", F.pmod(F.xxhash64(spread_col), F.lit(salt_n)).cast("int")
    )
    right_hot = right.join(F.broadcast(hot), key).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    hot_joined = left_hot.join(right_hot, [key, "_salt"]).drop("_salt")
    return cold.unionByName(hot_joined)
