"""S9 GFF cleanup converter on a synthetic genome with planted
violations (overlap, short CDS, frame break, internal stop, dup IDs,
non-whitelisted type)."""

from __future__ import annotations

import pytest

from pangenomesasgraphdatabases_spark.functions.sequence import (
    has_premature_stop_py,
    reverse_complement_py,
    translate_py,
)
from pangenomesasgraphdatabases_spark.sources.gff import clean_gff


def _gff_line(seqid, ftype, start, end, strand, fid):
    return f"{seqid}\ttool\t{ftype}\t{start}\t{end}\t.\t{strand}\t0\tID={fid}\n"


@pytest.fixture(scope="module")
def gff_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gffs")
    # Scaffold: clean CDSs are ATG + 30 coding bases + stop (len 36).
    good = "ATG" + "GCT" * 10 + "TAA"          # 36 nt, no internal stop
    stopin = "ATG" + "TAA" + "GCT" * 9 + "TAA"  # internal stop at codon 2
    # genome layout (1-based):
    #   1..36    ok1 (CDS +)
    #   20..55   overlap with ok1 -> skipped
    #   61..96   ok2 (CDS -) reverse-complement of `good`
    #   101..136 stop-in CDS -> skipped
    #   141..150 short CDS (10 nt) -> skipped
    #   161..196 tRNA (no sequence checks)
    #   201..236 gene type -> not whitelisted
    #   241..276 dup-id CDS (same ID as ok1) -> renamed ok1.1
    genome = ["A"] * 300
    genome[0:36] = list(good)
    genome[19:55] = list(good)[0:36]
    genome[60:96] = list(reverse_complement_py(good))
    genome[100:136] = list(stopin)
    genome[240:276] = list(good)
    seq = "".join(genome)
    body = (
        "##gff-version 3\n"
        "##sequence-region chr1 1 300\n"
        + _gff_line("chr1", "CDS", 1, 36, "+", "ok1")
        + _gff_line("chr1", "CDS", 20, 55, "+", "overlapper")
        + _gff_line("chr1", "CDS", 61, 96, "-", "ok2")
        + _gff_line("chr1", "CDS", 101, 136, "+", "stopin")
        + _gff_line("chr1", "CDS", 141, 150, "+", "short")
        + _gff_line("chr1", "tRNA", 161, 196, "+", "trna1")
        + _gff_line("chr1", "gene", 201, 236, "+", "gene1")
        + _gff_line("chr1", "CDS", 241, 276, "+", "ok1")
        # CDS on a seqid with no FASTA scaffold: sequence checks are
        # skipped and the row is KEPT (convert_refseq_to_prokka_gff.py
        # :73-89 — premature_stop stays False without a scaffold).
        + _gff_line("chrX", "CDS", 1, 10, "+", "noscaffold")
        + "##FASTA\n>chr1 description\n"
    )
    fasta = "\n".join(seq[i : i + 60] for i in range(0, len(seq), 60))
    (d / "G1.gff").write_text(body + fasta + "\n")
    return str(d)


def test_translate_helpers():
    assert translate_py("ATGGCTTAA") == "MA*"
    assert reverse_complement_py("ATGC") == "GCAT"
    assert has_premature_stop_py("ATG" + "TAA" + "GCTTAA", "+") is True
    assert has_premature_stop_py("ATGGCTTAA", "+") is False
    # minus strand: revcomp first
    assert has_premature_stop_py(reverse_complement_py("ATGGCTTAA"), "-") is False


def test_clean_gff(spark, gff_dir):
    out = clean_gff(spark, f"{gff_dir}/*.gff")
    rows = {r.feature_id: r for r in out.collect()}
    assert set(rows) == {"ok1", "ok2", "trna1", "ok1.1", "noscaffold"}
    assert rows["ok2"].strand == "-"
    assert rows["ok1.1"].start == 241
    # emitted in (seqid, start) order with overlap cascade applied
    assert rows["ok1"].end == 36


def test_clean_gff_keep_overlaps(spark, gff_dir):
    out = clean_gff(spark, f"{gff_dir}/*.gff", ignore_overlapping=False)
    ids = {r.feature_id for r in out.collect()}
    assert "overlapper" in ids
