"""S8 GenBank source: minimal flat-file parser feeding the GFF-parity
pipeline (reference entry point bp_genbank2gff3.pl, readme.md:29-35)."""

from __future__ import annotations

import textwrap

GBK = "/root/repo/fixtures_data/genbank"


def test_genbank_features_fixture(spark):
    from pangenomesasgraphdatabases_spark.sources.genbank import (
        read_genbank_features,
    )

    rows = {
        (r.file, r.seqid, r.feature_type, r.start, r.end, r.strand, r.feature_id)
        for r in read_genbank_features(spark, f"{GBK}/*.gbk").collect()
    }
    assert ("strainA", "seqA1", "CDS", 1, 30, "+", "A_0001") in rows
    # complement() -> '-' strand
    assert ("strainA", "seqA1", "tRNA", 40, 75, "-", "A_0002") in rows
    # gene + /pseudo -> pseudogene (the reference GFF3 carries these
    # as pseudogene rows, readme.md:40)
    assert ("strainA", "seqA1", "pseudogene", 80, 110, "+", "A_0003") in rows
    # join(a..b,c..d) -> envelope
    assert ("strainA", "seqA2", "CDS", 5, 82, "+", "A_0004") in rows
    # complement(join(..)) on the second file
    assert ("strainB", "seqB1", "CDS", 10, 90, "-", "B_0001") in rows
    # partial marker stripped from coords, flagged
    partial = {
        r.feature_id: r.partial
        for r in read_genbank_features(spark, f"{GBK}/*.gbk").collect()
    }
    assert partial["A_0005"] is True and partial["A_0001"] is False


def test_genbank_sequences_fixture(spark):
    from pangenomesasgraphdatabases_spark.sources.genbank import (
        read_genbank_sequences,
    )

    seqs = {
        (r.file, r.seqid): r.seq
        for r in read_genbank_sequences(spark, f"{GBK}/*.gbk").collect()
    }
    # Lengths match the LOCUS bp declarations; digits/spaces stripped.
    assert len(seqs[("strainA", "seqA1")]) == 120
    assert len(seqs[("strainA", "seqA2")]) == 90
    assert len(seqs[("strainB", "seqB1")]) == 140
    assert all(set(s) <= set("ACGT") for s in seqs.values())


def test_genbank_to_gff_parity_columns(spark):
    from pangenomesasgraphdatabases_spark.sources.genbank import genbank_to_gff
    from pangenomesasgraphdatabases_spark.sources.gff import GFF_COLS

    df = genbank_to_gff(spark, f"{GBK}/*.gbk")
    assert df.columns == GFF_COLS
    rows = {r.feature_id: r for r in df.collect()}
    assert "source" not in {r.feature_type for r in rows.values()}
    assert rows["A_0001"].attributes == "ID=A_0001;product=thr operon leader peptide"
    # pseudogene rows carry no product -> bare ID attribute
    assert rows["A_0003"].attributes == "ID=A_0003"
    assert rows["A_0001"].score == "." and rows["A_0001"].phase == "."


def test_genbank_continuation_lines(spark, tmp_path):
    """Multi-line locations and multi-line qualifier values (routine in
    real GenBank: translation strings wrap at col 80) — beyond what the
    committed oracle fixture exercises."""
    from pangenomesasgraphdatabases_spark.sources.genbank import (
        read_genbank_features,
    )

    gbk = textwrap.dedent(
        """\
        LOCUS       seqX             200 bp    DNA     linear   BCT 01-JAN-2024
        FEATURES             Location/Qualifiers
             CDS             join(10..60,
                             80..160)
                             /locus_tag="X_0001"
                             /product="multidomain protein with a very
                             long wrapped name"
                             /translation="MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ
                             APILSRVGDGTQDNLSGAEKAVQ"
        ORIGIN
                1 acgtacgtac
        //
        """
    )
    (tmp_path / "x.gbk").write_text(gbk)
    rows = read_genbank_features(spark, str(tmp_path / "x.gbk")).collect()
    by_id = {r.feature_id: r for r in rows}
    r = by_id["X_0001"]
    assert (r.start, r.end, r.strand) == (10, 160, "+")
    # Wrapped qualifier joined with a space (non-translation).
    assert r.product == "multidomain protein with a very long wrapped name"


def test_genbank_scan_oracle_local(spark):
    """The registered etl_genbank_scan matches its own DuckDB oracle
    on the committed fixtures (row multiset)."""
    import duckdb

    from pangenomesasgraphdatabases_spark.queries.registry import all_queries

    q = all_queries()["etl_genbank_scan"]
    got = sorted(tuple(r) for r in q.fn(spark, "/root/testdata/sf0.001").collect())
    want = sorted(tuple(r) for r in duckdb.sql(q.oracle).fetchall())
    assert got == want


def test_clean_genbank_matches_clean_gff(spark, tmp_path):
    """End-to-end .gbk cleanup equals the S9 GFF cleanup on equivalent
    hand-built GFF files (same features, same scaffolds) — the two
    entry formats converge to identical cleaned feature tables."""
    from collections import defaultdict

    from pangenomesasgraphdatabases_spark.sources.genbank import (
        clean_genbank,
        read_genbank_features,
        read_genbank_sequences,
    )
    from pangenomesasgraphdatabases_spark.sources.gff import clean_gff

    feats = [
        r
        for r in read_genbank_features(spark, f"{GBK}/*.gbk").collect()
        if r.feature_type != "source"
    ]
    seqs = read_genbank_sequences(spark, f"{GBK}/*.gbk").collect()
    by_file = defaultdict(list)
    for r in feats:
        by_file[r.file].append(
            f"{r.seqid}\tgenbank\t{r.feature_type}\t{r.start}\t{r.end}"
            f"\t.\t{r.strand}\t.\tID={r.feature_id}"
        )
    fasta = defaultdict(list)
    for s in seqs:
        fasta[s.file].append(f">{s.seqid}\n{s.seq}")
    for file, lines in by_file.items():
        (tmp_path / f"{file}.gff").write_text(
            "\n".join(lines) + "\n##FASTA\n" + "\n".join(fasta[file]) + "\n"
        )

    got = sorted(tuple(r) for r in clean_genbank(spark, f"{GBK}/*.gbk").collect())
    want = sorted(tuple(r) for r in clean_gff(spark, str(tmp_path / "*.gff")).collect())
    assert got == want and len(got) > 0


def test_genbank_parser_property_roundtrip(spark, tmp_path):
    """Property: render random feature tables as GenBank text, parse,
    recover every field exactly (coords, strand, envelope of join
    locations, locus_tag, product, pseudo mapping)."""
    import random

    rng = random.Random(42)
    base = "acgt"
    records, want = [], set()
    for rec_i in range(6):
        seqid = f"ctg{rec_i}"
        length = rng.randint(60, 300)
        feats = []
        for f_i in range(rng.randint(1, 8)):
            tag = f"L{rec_i}_{f_i:04d}"
            a = rng.randint(1, length - 10)
            b = rng.randint(a + 1, length)
            kind = rng.choice(["CDS", "tRNA", "gene_pseudo", "rRNA"])
            if rng.random() < 0.4:
                mid1 = rng.randint(a, b - 1)
                mid2 = rng.randint(mid1 + 1, b)
                loc = f"join({a}..{mid1},{mid2}..{b})"
            else:
                loc = f"{a}..{b}"
            strand = "+"
            if rng.random() < 0.5:
                loc = f"complement({loc})"
                strand = "-"
            product = rng.choice(
                ["hypothetical protein", "ABC transporter", "tRNA-Gly", ""]
            )
            key = "gene" if kind == "gene_pseudo" else kind
            lines = [f"     {key:<16}{loc}", f'                     /locus_tag="{tag}"']
            if product:
                lines.append(f'                     /product="{product}"')
            if kind == "gene_pseudo":
                lines.append("                     /pseudo")
            feats.append("\n".join(lines))
            ftype = "pseudogene" if kind == "gene_pseudo" else kind
            want.add((seqid, ftype, a, b, strand, tag, product))
        seq = "".join(rng.choice(base) for _ in range(length))
        origin = ["ORIGIN"]
        for i in range(0, length, 60):
            chunk = seq[i : i + 60]
            groups = " ".join(chunk[j : j + 10] for j in range(0, len(chunk), 10))
            origin.append(f"{i + 1:>9} {groups}")
        records.append(
            f"LOCUS       {seqid}             {length} bp    DNA     linear\n"
            "FEATURES             Location/Qualifiers\n"
            + "\n".join(feats)
            + "\n"
            + "\n".join(origin)
            + "\n//"
        )

    (tmp_path / "rand.gbk").write_text("\n".join(records) + "\n")
    from pangenomesasgraphdatabases_spark.sources.genbank import (
        read_genbank_features,
        read_genbank_sequences,
    )

    got = {
        (r.seqid, r.feature_type, r.start, r.end, r.strand, r.feature_id, r.product)
        for r in read_genbank_features(spark, str(tmp_path / "rand.gbk")).collect()
    }
    assert got == want
    lens = {
        (r.seqid, len(r.seq))
        for r in read_genbank_sequences(spark, str(tmp_path / "rand.gbk")).collect()
    }
    assert lens == {(f"ctg{i}", l) for i, l in
                    [(r, len([c for c in records[r].split("ORIGIN")[1] if c in "acgt"]))
                     for r in range(6)]}
