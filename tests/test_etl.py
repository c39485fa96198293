"""Source parsers (S1-S5) + end-to-end PIRATE ETL against raw fixture
files written to disk (FIXTURES.md section 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.graph import fixtures as fx
from pangenomesasgraphdatabases_spark.graph.etl import pirate_to_graph
from pangenomesasgraphdatabases_spark.graph.fixtures import _seq, write_raw_pirate_dir


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pirate_raw")
    write_raw_pirate_dir(str(d))
    return str(d)


@pytest.fixture(scope="module")
def etl(spark, raw_dir):
    out = pirate_to_graph(spark, raw_dir)
    out.feature_nodes.cache()
    out.cluster_nodes.cache()
    return out


N_FEATURES = (
    fx.N_STRAINS * fx.N_BACKBONE + len(fx.INSERTION_STRAINS) * fx.N_ACCESSORY
)


def test_sources_parse(spark, raw_dir):
    from pangenomesasgraphdatabases_spark.sources.fasta import (
        read_feature_fasta,
        read_gff_fasta_tail,
        read_representative_headers,
    )
    from pangenomesasgraphdatabases_spark.sources.pirate import read_coords

    coords = read_coords(spark, f"{raw_dir}/co-ords/*.tsv")
    assert coords.count() == N_FEATURES
    assert coords.select("Strain").distinct().count() == fx.N_STRAINS

    repr_df = read_representative_headers(
        spark, f"{raw_dir}/representative_sequences.ffn"
    )
    reps = {r.cluster_name: r.reference_locus for r in repr_df.collect()}
    assert len(reps) == 46  # 40 backbone + 6 accessory clusters
    assert reps[fx.ANCHOR_A] == "S01_00010"

    fasta = read_feature_fasta(spark, f"{raw_dir}/feature_sequences/*.fasta")
    rows = {(r.Cluster, r.Feature): r.Seq for r in fasta.collect()}
    assert rows[(fx.ANCHOR_A, "S01_00010")] == _seq("S01_00010")
    # CORE_30 lost its S05 member (lonely) -> 7 members
    assert sum(1 for (c, _) in rows if c == "CORE_30") == fx.N_STRAINS - 1

    gffs = read_gff_fasta_tail(spark, f"{raw_dir}/modified_gffs/*.gff")
    g = {r.Strain: r.Sequence for r in gffs.collect()}
    assert set(g) == set(fx.STRAINS)
    # Genome length = max End + 10; no newlines / headers left.
    assert all(">" not in s and "\n" not in s for s in g.values())


def test_etl_feature_nodes(etl):
    feats = etl.feature_nodes
    assert feats.count() == N_FEATURES
    rows = {r.Name: r for r in feats.collect()}
    # Clustered member: variation vs the representative member's seq.
    # CORE_12's first member is S01's feature at per-strain ordinal
    # 12+6=18 (the insertion shifts S01/S02 backbone positions).
    ref_of_core12 = "S01_00018"
    member = rows["S03_00012"]
    from pangenomesasgraphdatabases_spark.functions.sequence import delta_encode_py

    assert member.Variation == delta_encode_py(
        _seq("S03_00012"), _seq(ref_of_core12)
    )
    # The representative itself: identical -> empty variation.
    assert rows[ref_of_core12].Variation == ""
    assert rows[ref_of_core12].FullSequences == ""


def test_etl_lonely_full_sequences(etl):
    rows = {r.Name: r for r in etl.feature_nodes.collect()}
    for fid in ("S05_00030", "S06_00031"):
        r = rows[fid]
        assert r.Variation is None or r.Variation == ""
        # Genomic substring: starts with the planted 12-char sequence,
        # spans the full 900 bp window (F5 semantics).
        assert r.FullSequences.startswith(_seq(fid)[:12])
        assert len(r.FullSequences) == 900


def test_etl_cluster_nodes(etl):
    cl = {r.allele_name: r for r in etl.cluster_nodes.collect()}
    assert len(cl) == 46
    a = cl[fx.ANCHOR_A]
    assert a.number_genomes == fx.N_STRAINS
    assert a.reference_locus == "S01_00010"
    assert a.Seq == _seq("S01_00010")
    assert a.min_length == 900 and a.max_length == 900
    assert len(a.feature_ids) == fx.N_STRAINS
    # CORE_30: S05 member is lonely -> 7 feature ids.
    assert len(cl["CORE_30"].feature_ids) == fx.N_STRAINS - 1


def test_etl_neighbour_edges(etl, spark):
    edges = etl.neighbour_edges
    assert edges.count() == N_FEATURES - fx.N_STRAINS
    # No cross-strain edge (intended W1 semantics).
    bad = edges.filter(
        F.split("sourceFeature", "_")[0] != F.split("receivingFeature", "_")[0]
    )
    assert bad.count() == 0


def test_etl_feeds_graph_build(etl, spark):
    """ETL output loads straight into the graph builder (entry point 1
    -> entry point 2 composition)."""
    from pangenomesasgraphdatabases_spark.graph.build import build_graph

    g = build_graph(spark, etl.feature_nodes, etl.cluster_nodes.drop("feature_ids", "gene_family"))
    assert g.ortholog.count() == N_FEATURES
    assert g.clusters.filter("lonely_cluster").count() == 2


def test_events_ts_ns_is_session_timezone_proof(spark):
    """ts_ns must be the same epoch regardless of the session timezone
    (r9, caught by tools/probe_env.py: the driver runs our queries
    under ITS session — a bare NTZ cast shifted every epoch by the UTC
    offset and moved day-bucket boundaries)."""
    from pangenomesasgraphdatabases_spark.data import table

    sf = "/root/testdata/sf0.001"
    utc = {
        r.event_id: r.ts_ns
        for r in table(spark, sf, "events").select("event_id", "ts_ns").collect()
    }
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny = {
            r.event_id: r.ts_ns
            for r in table(spark, sf, "events")
            .select("event_id", "ts_ns")
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert ny == utc
