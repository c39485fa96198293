"""Similarity search over the `embeddings` table (engine extension).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (random-hyperplane signs via md5 bit votes — engine-portable)
is the 100 TB path: candidates shuffle on bucket id instead of the
full cross product.  Dot products stay JVM-side via zip_with +
aggregate in DOUBLE (no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.queries.registry import register


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


@register(
    "emb_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings
    """,
    tags=("ext-vector",),
)
def emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality (extension)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(_norm(F.col("embedding")), 4).alias("l2_norm"),
    )


@register(
    "emb_label_stats",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
           round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_dim0
    FROM embeddings
    GROUP BY label
    """,
    tags=("ext-vector", "A1"),
)
def emb_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label aggregates over vector-derived scalars (extension)."""
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(_norm(F.col("embedding"))), 4).alias("avg_norm"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias(
            "avg_dim0"
        ),
    )


@register(
    "ann_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, embedding FROM embeddings),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))
                   AS dot,
               sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
                   AS qn,
               sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                   AS cn
        FROM q, c, generate_series(1, 64) t(i)
        WHERE q.vec_id <> c.vec_id
        GROUP BY q.vec_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               round(dot / (qn * cn), 6) AS cosine,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(dot / (qn * cn), 6) DESC, neighbor_id ASC)
                   AS rank
        FROM dots
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    tags=("ext-vector", "ann"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for query vectors (vec_id < 5):
    the ANN correctness baseline (extension).  Deterministic tie-break
    on (rounded cosine desc, neighbor_id)."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    # Query side is tiny -> broadcast; candidates stream through.
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("c_emb"))
    )
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


@register(
    "ann_lsh_buckets",
    oracle="""
    WITH sig AS (
        SELECT vec_id, label,
               (CASE WHEN CAST(embedding[1] AS DOUBLE)
                          - CAST(embedding[33] AS DOUBLE) > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN CAST(embedding[2] AS DOUBLE)
                          - CAST(embedding[34] AS DOUBLE) > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN CAST(embedding[3] AS DOUBLE)
                          - CAST(embedding[35] AS DOUBLE) > 0 THEN 1 ELSE 0 END)
               AS bucket
        FROM embeddings
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels
    FROM sig GROUP BY bucket
    """,
    tags=("ext-vector", "ann", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketing (3-bit signature from fixed coordinate
    -difference hyperplanes): the scale path for ANN — neighbor search
    shuffles per bucket, not across the full corpus (extension)."""
    e = table(spark, sf_dir, "embeddings")

    def side(i: int, j: int, weight: int):
        diff = F.element_at("embedding", i).cast("double") - F.element_at(
            "embedding", j
        ).cast("double")
        return F.when(diff > 0, F.lit(weight)).otherwise(F.lit(0))

    bucket = side(1, 33, 4) + side(2, 34, 2) + side(3, 35, 1)
    return (
        e.select(bucket.alias("bucket"), "label")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


@register(
    "emb_cosine_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    d AS (
        SELECT a.vec_id AS vec1, b.vec_id AS vec2,
               sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
                 / (sqrt(sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
                  * sqrt(sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))
                 AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id, generate_series(1, 64) t(i)
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec1, vec2, round(cosine, 4) AS cosine
    FROM d WHERE cosine >= 0.35
    """,
    tags=("ext-vector", "dedup", "near-dup"),
)
def emb_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (extension): exact
    all-pairs baseline with cosine >= 0.35; the hyperplane-LSH bucket
    variant (ann_lsh_buckets) is the candidate-generation scale path
    that avoids the O(n^2) pair space."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("vec1"), F.col("embedding").alias("e1"))
    b = e.select(F.col("vec_id").alias("vec2"), F.col("embedding").alias("e2"))
    pairs = a.join(b, F.col("vec1") < F.col("vec2"))
    cos = _dot(F.col("e1"), F.col("e2")) / (_norm(F.col("e1")) * _norm(F.col("e2")))
    return (
        pairs.select("vec1", "vec2", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .select("vec1", "vec2", F.round("cosine", 4).alias("cosine"))
    )


@register(
    "approx_distinct_extension",
    oracle=None,  # HLL sketches differ across engines -> rows-only check
    tags=("ext-olap", "approx"),
)
def approx_distinct_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group — approximate
    aggregate extension (SURVEY.md section 2.4 note); sketch values are
    engine-specific so the driver records the weaker rows-only check."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
