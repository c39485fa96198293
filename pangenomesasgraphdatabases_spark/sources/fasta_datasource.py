"""Custom Python DataSource (Spark 4 API) for multi-line FASTA.

SURVEY.md 7.4 calls for "a small custom Python DataSource" as the
robust S4 reader: `spark.read.format("fasta").load(glob)` yields one
row per record with full multi-line sequence support.  Partitioning is
per file (the natural FASTA unit), so thousands of files fan out
across executors; each task streams its file line-by-line with bounded
memory.

Usage:
    from pangenomesasgraphdatabases_spark.sources.fasta_datasource import (
        FastaDataSource)
    spark.dataSource.register(FastaDataSource)
    df = spark.read.format("fasta").load("/path/*.fasta")
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("description", StringType()),
        StructField("sequence", StringType()),
        StructField("file", StringType()),
    ]
)


class _FastaPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta datasource requires a path")

    def partitions(self):
        files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"no FASTA files match {self.path!r}")
        return [_FastaPartition(f) for f in files]

    def read(self, partition: _FastaPartition):
        rid, desc, chunks = None, None, []
        with open(partition.path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if rid is not None:
                        yield (rid, desc, "".join(chunks), partition.path)
                    header = line[1:].strip()
                    first, _, rest = header.partition(" ")
                    rid, desc, chunks = first, rest or None, []
                elif line and rid is not None:
                    chunks.append(line.strip())
        if rid is not None:
            yield (rid, desc, "".join(chunks), partition.path)


class FastaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> FastaReader:
        return FastaReader(self.options)
