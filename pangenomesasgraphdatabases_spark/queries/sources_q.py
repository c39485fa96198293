"""Oracle coverage for the file-format parsers (S1/S3/W1-over-raw) over
the committed raw PIRATE-shaped fixture tree at fixtures_data/pirate_raw
(written by graph/fixtures.write_raw_pirate_dir; both engines read the
same files at an absolute path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.queries.registry import register
from pangenomesasgraphdatabases_spark.sources.fasta import (
    read_representative_headers,
)
from pangenomesasgraphdatabases_spark.sources.pirate import read_coords

RAW = "/root/repo/fixtures_data/pirate_raw"


@register(
    "etl_coords_scan",
    oracle=f"""
    SELECT Name, Start, "End", Length,
           Type AS FeatureType, CAST(Strand AS VARCHAR) AS Strand,
           regexp_extract(filename, '([^/]+?)\\.[^/]*$', 1) AS Strain
    FROM read_csv('{RAW}/co-ords/*.tsv', delim='\t', header=true,
                  filename=true)
    """,
    tags=("S1", "parser"),
)
def etl_coords_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: directory-glob TSV scan with filename-derived Strain column
    (pirateToDatabase.py:20-29) — one distributed csv read replaces the
    reference's per-file pandas concat loop."""
    return read_coords(spark, f"{RAW}/co-ords/*.tsv").select(
        "Name", "Start", "End", "Length", "FeatureType", "Strand", "Strain"
    )


@register(
    "etl_repr_headers",
    oracle=f"""
    WITH lines AS (
        SELECT unnest(string_split(content, chr(10))) AS line
        FROM read_text('{RAW}/representative_sequences.ffn')
    )
    SELECT regexp_extract(line, '^>([^;]+)', 1) AS cluster_name,
           regexp_extract(line, 'locus_tag=([^;]+)', 1) AS reference_locus
    FROM lines WHERE line LIKE '>%'
    """,
    tags=("S3", "parser"),
)
def etl_repr_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: FASTA header scan -> (cluster_name, reference_locus)
    (pirateToDatabase.py:41-54)."""
    return read_representative_headers(
        spark, f"{RAW}/representative_sequences.ffn"
    )


@register(
    "etl_neighbour_edges",
    oracle=f"""
    WITH coords AS (
        SELECT Name, Start,
               regexp_extract(filename, '([^/]+?)\\.[^/]*$', 1) AS Strain
        FROM read_csv('{RAW}/co-ords/*.tsv', delim='\t', header=true,
                      filename=true)
    )
    SELECT src AS sourceFeature, Name AS receivingFeature
    FROM (
        SELECT Name,
               lag(Name) OVER (PARTITION BY Strain ORDER BY Start, Name) AS src
        FROM coords
    ) WHERE src IS NOT NULL
    """,
    tags=("W1", "S6", "parser"),
)
def etl_neighbour_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 over the raw files: the neighbourEdges.csv content of the ETL
    (pirateToDatabase.py:299-327) with intended per-strain semantics."""
    from pangenomesasgraphdatabases_spark.graph.etl import neighbour_edges

    return neighbour_edges(read_coords(spark, f"{RAW}/co-ords/*.tsv"))
