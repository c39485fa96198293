"""StructTypes for the pangenome vertex/edge tables (SURVEY.md section 1.2-1.3).

One DataFrame per node label / relationship type of the reference's
labeled property graph (01_creatingDatabase.cypher:15-26, 42-54,
100-106, 139-153); Cypher list properties map to ArrayType.
"""

from __future__ import annotations

from pyspark.sql import types as T

FEATURES = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("feature_start", T.IntegerType(), True),
        T.StructField("feature_end", T.IntegerType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("strain", T.StringType(), True),
        T.StructField("variation", T.StringType(), True),
        T.StructField("full_sequence", T.StringType(), True),
        T.StructField("feature_type", T.StringType(), True),
        T.StructField("GC", T.DoubleType(), True),
        T.StructField("CAI", T.DoubleType(), True),
    ]
)

CLUSTERS = T.StructType(
    [
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("threshold", T.IntegerType(), True),
        T.StructField("number_genomes", T.IntegerType(), True),
        T.StructField("min_length", T.IntegerType(), True),
        T.StructField("max_length", T.IntegerType(), True),
        T.StructField("average_length", T.DoubleType(), True),
        T.StructField("feature_ids", T.ArrayType(T.StringType()), True),
        T.StructField("lonely_cluster", T.BooleanType(), True),
        T.StructField("reference_locus", T.StringType(), True),
        T.StructField("reference_sequence", T.StringType(), True),
        T.StructField("feature_type", T.StringType(), True),
    ]
)

STRAINS = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("avg_GC", T.DoubleType(), True),
        T.StructField("stDev_GC", T.DoubleType(), True),
        T.StructField("avg_CAI", T.DoubleType(), True),
        T.StructField("stDev_CAI", T.DoubleType(), True),
    ]
)

ORTHOLOG = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

FEATURE_NEIGHBOUR = T.StructType(
    [
        T.StructField("src_feature_id", T.StringType(), False),
        T.StructField("dst_feature_id", T.StringType(), False),
        T.StructField("strain", T.StringType(), True),
    ]
)

CLUSTER_NEIGHBOUR = T.StructType(
    [
        T.StructField("src_cluster_id", T.StringType(), False),
        T.StructField("dst_cluster_id", T.StringType(), False),
        T.StructField("number_of_members", T.IntegerType(), True),
        T.StructField("members", T.ArrayType(T.StringType()), True),
    ]
)
