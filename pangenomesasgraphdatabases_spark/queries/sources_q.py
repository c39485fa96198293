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
from pangenomesasgraphdatabases_spark.sources.genbank import (
    read_genbank_features,
)
from pangenomesasgraphdatabases_spark.sources.pirate import read_coords

RAW = "/root/repo/fixtures_data/pirate_raw"
GBK = "/root/repo/fixtures_data/genbank"


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


@register(
    "etl_genbank_scan",
    oracle=rf"""
    WITH raw AS (
        SELECT regexp_extract(filename, '([^/]+?)\.[^/]*$', 1) AS file,
               string_split(content, chr(10)) AS ls
        FROM read_text('{GBK}/*.gbk')
    ),
    lines AS (
        SELECT file, unnest(ls) AS line, generate_subscripts(ls, 1) AS rn
        FROM raw
    ),
    marked AS (
        SELECT file, line, rn,
               count(*) FILTER (WHERE line LIKE 'LOCUS%')
                   OVER (PARTITION BY file ORDER BY rn) AS rec,
               count(*) FILTER (WHERE line LIKE 'FEATURES%')
                   OVER (PARTITION BY file ORDER BY rn) AS n_feat_hdr,
               count(*) FILTER (WHERE line LIKE 'ORIGIN%'
                                   OR line LIKE 'CONTIG%')
                   OVER (PARTITION BY file ORDER BY rn) AS n_origin
        FROM lines
    ),
    recs AS (
        SELECT file, rec,
               max(regexp_extract(line, '^LOCUS\s+(\S+)', 1))
                   FILTER (WHERE line LIKE 'LOCUS%') AS seqid
        FROM marked GROUP BY file, rec
    ),
    feat_lines AS (
        SELECT file, rec, line, rn,
               count(*) FILTER (WHERE regexp_matches(line, '^ {{5}}\S'))
                   OVER (PARTITION BY file, rec ORDER BY rn) AS blk
        FROM marked
        WHERE n_feat_hdr > n_origin AND line NOT LIKE 'FEATURES%'
    ),
    blocks AS (
        SELECT file, rec, blk,
               max(regexp_extract(line, '^ {{5}}(\S+)', 1))
                   FILTER (WHERE regexp_matches(line, '^ {{5}}\S')) AS key,
               max(trim(regexp_extract(line, '^ {{5}}\S+\s+(.*)$', 1)))
                   FILTER (WHERE regexp_matches(line, '^ {{5}}\S')) AS loc,
               coalesce(max(regexp_extract(line, '/locus_tag="([^"]+)"', 1)),
                        '') AS locus_tag,
               coalesce(max(regexp_extract(line, '/product="([^"]+)"', 1)),
                        '') AS product,
               bool_or(regexp_matches(line, '^\s+/pseudo\s*$')) AS pseudo
        FROM feat_lines
        WHERE blk > 0
        GROUP BY file, rec, blk
    )
    SELECT b.file, r.seqid,
           CASE WHEN b.key = 'gene' AND b.pseudo THEN 'pseudogene'
                ELSE b.key END AS feature_type,
           CAST(list_min(list_transform(regexp_extract_all(b.loc, '[0-9]+'),
                                        x -> CAST(x AS INT))) AS INT)
               AS "start",
           CAST(list_max(list_transform(regexp_extract_all(b.loc, '[0-9]+'),
                                        x -> CAST(x AS INT))) AS INT)
               AS "end",
           CASE WHEN contains(b.loc, 'complement(') THEN '-' ELSE '+' END
               AS strand,
           b.locus_tag AS feature_id, b.product
    FROM blocks b JOIN recs r USING (file, rec)
    """,
    tags=("S8", "parser"),
)
def etl_genbank_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: GenBank flat-file feature scan over the committed fixture
    tree (reference entry point: bp_genbank2gff3.pl per readme.md:29-35
    — minimal field subset, see sources/genbank.py).  The oracle
    re-parses the same files independently in SQL (single-line
    locations/qualifiers in the committed fixtures; the Python parser
    additionally handles continuation lines, covered by pytest)."""
    return read_genbank_features(spark, f"{GBK}/*.gbk").select(
        "file",
        "seqid",
        "feature_type",
        "start",
        "end",
        "strand",
        "feature_id",
        "product",
    )
