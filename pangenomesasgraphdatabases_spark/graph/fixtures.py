"""Deterministic tiny pangenome fixture (FIXTURES.md sections 1-4).

Shape: N_STRAINS=8 strains, a 40-cluster core backbone, one planted
RGP insertion (6 accessory features between two adjacent core anchor
clusters, present in strains S01+S02 only, containing one 'integrase'
product and one tRNA), two lonely (cluster-less) features, and one
cluster with a NULL reference_sequence to exercise the backfill step
(01_creatingDatabase.cypher:129-133).

Everything is a plain pandas DataFrame so pytest can assert
hand-computed expectations; to_spark() converts with explicit schemas.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pangenomesasgraphdatabases_spark.functions.sequence import delta_encode_py

N_STRAINS = 8
STRAINS = [f"S{i:02d}" for i in range(1, N_STRAINS + 1)]
N_BACKBONE = 40
ANCHOR_A = "CORE_10"
ANCHOR_B = "CORE_11"
INSERTION_STRAINS = ("S01", "S02")
N_ACCESSORY = 6
LONELY = {("S05", 30), ("S06", 31)}  # (strain, backbone ordinal) without cluster
NULL_REFSEQ_CLUSTER = "CORE_35"

_BASES = "ACGT"


def _seq(key: str, length: int = 12) -> str:
    """Deterministic pseudo-sequence from a string key (no RNG)."""
    h = 0
    out = []
    for i in range(length):
        h = (h * 131 + ord(key[i % len(key)]) + i) % 1_000_003
        out.append(_BASES[h % 4])
    return "".join(out)


@dataclass
class Fixture:
    feature_nodes: pd.DataFrame  # featureNodes.csv shape (FIXTURES.md 2.1)
    cluster_nodes: pd.DataFrame  # clusterNodes.csv shape (FIXTURES.md 2.2)
    composition: pd.DataFrame    # featuresCompositionDataframe.csv shape (2.4)


def _strain_layout(strain: str) -> list[tuple[str, str, str, str]]:
    """Ordered (feature_key, cluster_id|None, feature_type, product)
    for one strain; feature_key is the backbone/accessory slot name."""
    rows = []
    for ordinal in range(N_BACKBONE):
        cluster = f"CORE_{ordinal}"
        if (strain, ordinal) in LONELY:
            cluster = None
        ftype = "CDS"
        product = "hypothetical protein" if ordinal % 3 else f"enzyme {ordinal}"
        if ordinal == 5:
            ftype = "tRNA"
            product = "tRNA-Ala"
        rows.append((f"B{ordinal:02d}", cluster, ftype, product))
        if ordinal == 10 and strain in INSERTION_STRAINS:
            for k in range(1, N_ACCESSORY + 1):
                ftype = "tRNA" if k == 4 else "CDS"
                product = {
                    2: "putative phage integrase",
                    4: "tRNA-Met",
                }.get(k, "hypothetical protein")
                rows.append((f"A{k:02d}", f"ACC_{k}", ftype, product))
    return rows


def build_fixture() -> Fixture:
    feat_rows = []
    comp_rows = []
    members: dict[str, list[str]] = {}

    for strain in STRAINS:
        layout = _strain_layout(strain)
        for pos, (slot, cluster, ftype, product) in enumerate(layout):
            fid = f"{strain}_{pos:05d}"
            start = 1000 * pos + 1
            end = start + 899
            accessory = slot.startswith("A")
            # Accessory features deviate in GC/CAI so the GI scan and
            # RGP t-tests have a detectable signal.
            gc = 70.0 + pos * 0.01 if accessory else 50.0 + pos * 0.01
            cai = 0.8 if accessory else 0.5
            seq = _seq(cluster or fid)
            ref = _seq(cluster) if cluster else None
            variation = delta_encode_py(_seq(fid), ref) if cluster else ""
            feat_rows.append(
                {
                    "Name": fid,
                    "Start": start,
                    "End": end,
                    "Length": end - start + 1,
                    "Strand": "1" if pos % 2 == 0 else "-1",
                    "Product": product,
                    "Strain": strain,
                    "FeatureType": ftype,
                    "Variation": variation,
                    "FullSequences": seq if cluster is None or (
                        cluster == NULL_REFSEQ_CLUSTER and strain == "S01"
                    ) else "",
                }
            )
            comp_rows.append({"featureID": fid, "GC": gc, "CAI": cai})
            if cluster is not None:
                members.setdefault(cluster, []).append(fid)

    clus_rows = []
    for cluster, fids in sorted(members.items()):
        strains_in = sorted({f.split("_")[0] for f in fids})
        # ';'-joined with stray '0' placeholders to exercise the
        # split+filter load path (01_creatingDatabase.cypher:39).
        joined = ";".join(fids + ["0"])
        ref_seq = None if cluster == NULL_REFSEQ_CLUSTER else _seq(cluster)
        clus_rows.append(
            {
                "allele_name": cluster,
                "consensus_product": f"consensus {cluster}",
                "threshold": 50,
                "number_genomes": len(strains_in),
                "min_length": 900,
                "max_length": 900,
                "average_length": 900.0,
                "feature": joined,
                "reference_locus": fids[0],
                "Seq": ref_seq,
            }
        )

    return Fixture(
        feature_nodes=pd.DataFrame(feat_rows),
        cluster_nodes=pd.DataFrame(clus_rows),
        composition=pd.DataFrame(comp_rows),
    )


def to_spark(spark, fixture: Fixture):
    """Convert fixture pandas frames to Spark DataFrames."""
    return (
        spark.createDataFrame(fixture.feature_nodes),
        spark.createDataFrame(fixture.cluster_nodes),
        spark.createDataFrame(fixture.composition),
    )


def write_raw_pirate_dir(out_dir: str) -> None:
    """Materialize the fixture as a raw PIRATE-shaped directory tree
    (FIXTURES.md section 1) for exercising the source parsers + ETL:
    co-ords/<Strain>.tsv, PIRATE.gene_families.tsv,
    representative_sequences.ffn, feature_sequences/<cluster>.fasta,
    modified_gffs/<Strain>.gff."""
    import pathlib

    out = pathlib.Path(out_dir)
    fx = build_fixture()
    feats = fx.feature_nodes

    (out / "co-ords").mkdir(parents=True, exist_ok=True)
    for strain, grp in feats.groupby("Strain"):
        with open(out / "co-ords" / f"{strain}.tsv", "w") as fh:
            fh.write("Name\tGene\tStart\tEnd\tLength\tType\tStrand\tProduct\n")
            for _, r in grp.iterrows():
                fh.write(
                    f"{r.Name}\tgene\t{r.Start}\t{r.End}\t{r.Length}"
                    f"\t{r.FeatureType}\t{r.Strand}\t{r.Product}\n"
                )

    members: dict[str, list[str]] = {}
    for _, r in feats.iterrows():
        cl = None
        for _, c in fx.cluster_nodes.iterrows():
            if r.Name in c.feature.split(";"):
                cl = c.allele_name
                break
        if cl:
            members.setdefault(cl, []).append(r.Name)

    strains = sorted(feats.Strain.unique())
    with open(out / "PIRATE.gene_families.tsv", "w") as fh:
        cols = [
            "allele_name", "gene_family", "consensus_product", "threshold",
            "number_genomes", "average_length",
        ] + strains
        fh.write("\t".join(cols) + "\n")
        for _, c in fx.cluster_nodes.iterrows():
            per_strain = {f.split("_")[0]: f for f in members.get(c.allele_name, [])}
            row = [
                c.allele_name, c.allele_name, c.consensus_product,
                str(c.threshold), str(c.number_genomes), str(c.average_length),
            ] + [per_strain.get(s, "") for s in strains]
            fh.write("\t".join(row) + "\n")

    with open(out / "representative_sequences.ffn", "w") as fh:
        for _, c in fx.cluster_nodes.iterrows():
            ref = members[c.allele_name][0]
            fh.write(f">{c.allele_name};len=900;locus_tag={ref}\n")
            fh.write(_seq(c.allele_name) + "\n")

    (out / "feature_sequences").mkdir(exist_ok=True)
    for cl, fids in members.items():
        with open(out / "feature_sequences" / f"{cl}.nucleotide.fasta", "w") as fh:
            for fid in fids:
                fh.write(f">{fid}\n{_seq(fid)}\n")

    (out / "modified_gffs").mkdir(exist_ok=True)
    for strain, grp in feats.groupby("Strain"):
        genome_len = int(grp.End.max()) + 10
        genome = list(_seq(strain + "_genome", genome_len))
        for _, r in grp.iterrows():
            if r.FullSequences:
                genome[r.Start - 1 : r.End] = list(r.FullSequences[: r.End - r.Start + 1])
        with open(out / "modified_gffs" / f"{strain}.gff", "w") as fh:
            fh.write("##gff-version 3\n")
            fh.write(f"{strain}\ttool\tregion\t1\t{genome_len}\t.\t+\t.\tID=chr\n")
            fh.write("##FASTA\n")
            fh.write(">chr1\n")
            seq = "".join(genome)
            for i in range(0, len(seq), 80):
                fh.write(seq[i : i + 80] + "\n")


def synthetic_feature_tables(spark, n_strains: int, features_per_strain: int):
    """Spark-native scaled synthetic inputs for graph-build benchmarks:
    generated distributively with spark.range (no driver loop), same
    shape as the fixture tables.  Clusters: one per backbone ordinal
    (present in every strain), every 97th feature lonely."""
    from pyspark.sql import functions as F

    n = n_strains * features_per_strain
    base = spark.range(n).select(
        (F.col("id") / features_per_strain).cast("int").alias("si"),
        F.pmod(F.col("id"), features_per_strain).cast("int").alias("pos"),
    )
    feats = base.select(
        F.format_string("T%04d_%05d", "si", "pos").alias("Name"),
        (F.col("pos") * 1000 + 1).alias("Start"),
        (F.col("pos") * 1000 + 900).alias("End"),
        F.lit(900).alias("Length"),
        F.when(F.pmod("pos", 2) == 0, "1").otherwise("-1").alias("Strand"),
        F.when(F.pmod("pos", 3) == 0, "hypothetical protein")
        .when(F.pmod("pos", 571) == 17, "putative phage integrase")
        .otherwise(F.format_string("enzyme %d", "pos"))
        .alias("Product"),
        F.format_string("T%04d", "si").alias("Strain"),
        F.when(F.pmod("pos", 29) == 5, "tRNA").otherwise("CDS").alias("FeatureType"),
        F.lit("").alias("Variation"),
        F.when(F.pmod(F.col("pos"), 97) == 3, F.lit("ACGTACGTACGT"))
        .otherwise(F.lit(""))
        .alias("FullSequences"),
        F.pmod("pos", 97).alias("_lonely_mark"),
        F.col("pos").alias("_pos"),
    )
    clustered = feats.filter(F.col("_lonely_mark") != 3)
    clusters = clustered.groupBy(F.col("_pos").alias("ordinal")).agg(
        F.sort_array(F.collect_list("Name")).alias("_fids"),
        F.count(F.lit(1)).alias("number_genomes"),
    )
    cluster_nodes = clusters.select(
        F.format_string("CL_%05d", "ordinal").alias("allele_name"),
        F.format_string("consensus %d", "ordinal").alias("consensus_product"),
        F.lit(50).alias("threshold"),
        F.col("number_genomes").cast("int"),
        F.lit(900).alias("min_length"),
        F.lit(900).alias("max_length"),
        F.lit(900.0).alias("average_length"),
        F.concat_ws(";", "_fids").alias("feature"),
        F.element_at("_fids", 1).alias("reference_locus"),
        F.lit("ACGTACGTACGT").alias("Seq"),
    )
    composition = feats.select(
        F.col("Name").alias("featureID"),
        (50.0 + F.pmod("_pos", 100) / 10.0).alias("GC"),
        (0.5 + F.pmod("_pos", 10) / 100.0).alias("CAI"),
    )
    return feats.drop("_lonely_mark", "_pos"), cluster_nodes, composition
