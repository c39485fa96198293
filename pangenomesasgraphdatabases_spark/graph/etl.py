"""PIRATE -> graph-table ETL: the Spark re-expression of the reference's
entry point 1 (`python pirateToDatabase.py <pirateDir> <outDir>`,
pirateToDatabase.py:333-377).

The reference is an eager single-threaded pandas dataflow; here the
whole thing is one Catalyst DAG.  Stage map (reference function ->
here): getFeatureDf (:344) -> read_coords; getReprSeqDf (:346) ->
read_representative_headers; getClusterDf (:348, join J1) ->
cluster_table; getAlignedSeqDf (:350, J2+J3) -> aligned_with_reference;
addVariationToFeatureDf (:356, F6 + J4/J6) -> with_variation (with the
dedup-before-UDF memoization rewrite, SURVEY.md section 4);
addFullSequencesToFeatureDf (:357, F5) -> with_full_sequences;
getNeighbourEdgesDf (:365, W1) -> neighbour_edges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.functions.sequence import delta_encode
from pangenomesasgraphdatabases_spark.sources.fasta import (
    read_feature_fasta,
    read_gff_fasta_tail,
    read_representative_headers,
)
from pangenomesasgraphdatabases_spark.sources.pirate import (
    read_coords,
    read_gene_families,
)


@dataclass
class EtlOutput:
    feature_nodes: DataFrame   # featureNodes.csv shape
    cluster_nodes: DataFrame   # clusterNodes.csv shape (+feature_ids array)
    neighbour_edges: DataFrame  # neighbourEdges.csv shape


def aligned_with_reference(aligned: DataFrame, repr_df: DataFrame) -> DataFrame:
    """J2 + J3: attach each cluster's representative locus, then
    self-join so every member row carries the cluster's reference
    sequence (pirateToDatabase.py:128-132).

    r16 (VERDICT r15 #8, guide §3.1/§3.2): both right sides are
    CLUSTER-level dimensions — bounded by the pan-genome's gene-family
    vocabulary, which does not grow with strain count — so they are
    explicit broadcasts: repr_df is one row per cluster, and the
    reference-sequence side is pre-filtered to the rows that can ever
    match (reference_locus is cluster-constant, so within a cluster
    {r: r.Feature == a.reference_locus} == {r: r.Feature ==
    r.reference_locus} — one row per cluster, multiplicity preserved).
    The pre-filter also stops the feature-level aligned side from
    shuffling for this join at all (the pre-r16 shape sort-merge-joined
    feature×feature)."""
    with_locus = aligned.join(
        F.broadcast(repr_df), aligned.Cluster == repr_df.cluster_name, "inner"
    ).drop("cluster_name")
    refs = (
        with_locus.filter(F.col("Feature") == F.col("reference_locus"))
        .select("Cluster", "Feature", "Seq")
        .alias("r")
    )
    a = with_locus.alias("a")
    return a.join(
        F.broadcast(refs),
        (F.col("a.reference_locus") == F.col("r.Feature"))
        & (F.col("a.Cluster") == F.col("r.Cluster")),
        "left",
    ).select(
        F.col("a.Cluster").alias("Cluster"),
        F.col("a.Feature").alias("Feature"),
        F.col("a.Seq").alias("Seq"),
        F.col("a.reference_locus").alias("reference_locus"),
        F.col("r.Seq").alias("Seq_reference"),
    )


def with_variation(coords: DataFrame, aligned_ref: DataFrame) -> DataFrame:
    """F6 delta-encode with the reference's memoization made explicit:
    the variation UDF runs once per DISTINCT (Seq, Seq_reference) pair
    (pirateToDatabase.py:216-231 computes per unique sequence per
    cluster), then joins back — Catalyst won't dedup around a UDF on
    its own (SURVEY.md section 4)."""
    distinct_pairs = aligned_ref.select("Seq", "Seq_reference").distinct()
    encoded = distinct_pairs.withColumn(
        "Variation", delta_encode("Seq", "Seq_reference")
    )
    per_feature = aligned_ref.join(encoded, ["Seq", "Seq_reference"], "left").select(
        "Feature", "Variation"
    )
    # J4: left join with indicator — features with no aligned sequence
    # (no cluster) keep Variation NULL and are flagged.
    return coords.join(
        per_feature, coords.Name == per_feature.Feature, "left"
    ).drop("Feature")


def with_full_sequences(features: DataFrame, strain_seqs: DataFrame) -> DataFrame:
    """F5: cluster-less features get their genomic substring
    fullSequence[Start-1:End] (1-based inclusive,
    pirateToDatabase.py:244-275); all others keep an empty marker."""
    joined = features.join(F.broadcast(strain_seqs), "Strain", "left")
    full = F.substring(
        F.col("Sequence"), F.col("Start"), F.col("End") - F.col("Start") + 1
    )
    return joined.withColumn(
        "FullSequences",
        F.when(F.col("Variation").isNull(), full).otherwise(F.lit("")),
    ).drop("Sequence")


def neighbour_edges(features: DataFrame) -> DataFrame:
    """W1: sort by (Strain, Start), lag -> (sourceFeature,
    receivingFeature).  Intended partition-per-strain semantics of
    pirateToDatabase.py:299-327 (its sequential guard can leak edges at
    strain boundaries; Window.partitionBy cannot)."""
    w = Window.partitionBy("Strain").orderBy("Start", "Name")
    return (
        features.select(
            "Strain", "Name", "Start", F.lag("Name").over(w).alias("sourceFeature")
        )
        .filter(F.col("sourceFeature").isNotNull())
        .select("sourceFeature", F.col("Name").alias("receivingFeature"))
    )


def cluster_table(
    gene_families: DataFrame, repr_df: DataFrame, coords: DataFrame,
    aligned_ref: DataFrame,
) -> DataFrame:
    """J1 + A15: cluster metadata joined to representative loci; the
    reference loads min/max/average_length precomputed by PIRATE —
    recomputed here from member features for self-containedness
    (SURVEY.md A15)."""
    # Cluster-level dimension joins (r16): repr_df and the reference-
    # sequence projection are one row per cluster — broadcast both
    # (same bounded-vocabulary argument as aligned_with_reference).
    j = gene_families.join(
        F.broadcast(repr_df),
        gene_families.gene_family == repr_df.cluster_name,
        "inner",
    )
    member = gene_families.select(
        "allele_name", F.explode("feature_ids").alias("Name")
    ).join(coords.select("Name", "Length"), "Name")
    lengths = member.groupBy("allele_name").agg(
        F.min("Length").alias("min_length"),
        F.max("Length").alias("max_length"),
        F.avg("Length").alias("avg_length_computed"),
    )
    ref_seq = aligned_ref.filter(
        F.col("Feature") == F.col("reference_locus")
    ).select(F.col("Cluster").alias("gene_family_key"), F.col("Seq").alias("Seq_out"))
    return (
        j.join(lengths, "allele_name", "left")
        .join(F.broadcast(ref_seq), j.gene_family == F.col("gene_family_key"), "left")
        .select(
            "allele_name",
            "gene_family",
            "consensus_product",
            "threshold",
            "number_genomes",
            "min_length",
            "max_length",
            "average_length",
            F.concat_ws(";", "feature_ids").alias("feature"),
            "feature_ids",
            "reference_locus",
            F.col("Seq_out").alias("Seq"),
        )
    )


def pirate_to_graph(spark: SparkSession, pirate_dir: str) -> EtlOutput:
    """Full ETL: PIRATE directory -> featureNodes / clusterNodes /
    neighbourEdges tables (the three CSVs of pirateToDatabase.py:369-371).
    """
    coords = read_coords(spark, f"{pirate_dir}/co-ords/*.tsv")
    repr_df = read_representative_headers(
        spark, f"{pirate_dir}/representative_sequences.ffn"
    )
    gf = read_gene_families(spark, f"{pirate_dir}/PIRATE.gene_families.tsv")
    aligned = read_feature_fasta(spark, f"{pirate_dir}/feature_sequences/*.fasta")
    strain_seqs = read_gff_fasta_tail(spark, f"{pirate_dir}/modified_gffs/*.gff")

    aligned_ref = aligned_with_reference(aligned, repr_df)
    feats = with_variation(coords, aligned_ref)
    feats = with_full_sequences(feats, strain_seqs)
    feature_nodes = feats.select(
        "Name",
        "Start",
        "End",
        "Length",
        "Strand",
        "Product",
        "Strain",
        "FeatureType",
        F.coalesce("Variation", F.lit("")).alias("Variation"),
        "FullSequences",
    )
    clusters = cluster_table(gf, repr_df, coords, aligned_ref)
    edges = neighbour_edges(coords)
    return EtlOutput(feature_nodes, clusters, edges)
