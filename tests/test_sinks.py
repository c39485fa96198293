"""Sinks: CSV (S6/S16) and FASTA (S12) write + readback."""

from __future__ import annotations

from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.sources.fasta import write_fasta
from pangenomesasgraphdatabases_spark.sources.pirate import write_csv


def test_csv_sink_roundtrip(spark, pangenome, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv_sink"))
    out = pangenome.feature_in_strain
    write_csv(out, f"{d}/feature_in_strain")
    back = spark.read.csv(f"{d}/feature_in_strain", header=True)
    assert back.count() == out.count()
    assert set(back.columns) == set(out.columns)


def test_fasta_sink_strips_gaps(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fasta_sink"))
    df = spark.createDataFrame(
        [("c1", "AC-GT"), ("c2", "GGGG")], ["cluster_id", "reference_sequence"]
    )
    write_fasta(df, "cluster_id", "reference_sequence", f"{d}/out")
    lines = [r.value for r in spark.read.text(f"{d}/out").collect()]
    text = "\n".join(sorted(lines))
    assert ">c1\nACGT" in text.replace("\n\n", "\n") or ">c1" in text
    # gap stripped
    assert "AC-GT" not in text
    assert "ACGT" in text
