"""Multimodal binary-column plumbing (stubbed decode, real Spark flow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.data import table
from pangenomesasgraphdatabases_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)

SF = "/root/testdata/sf0.001"


def test_media_schema_and_features(spark):
    media = documents_as_media(table(spark, SF, "documents"))
    feats = extract_features(media)
    rows = feats.limit(20).collect()
    assert len(rows) == 20
    docs = {r.doc_id: r for r in table(spark, SF, "documents").limit(0).collect()}
    for r in rows:
        assert r.media_type == "text/plain"
        assert r.n_bytes > 0
        assert r.feat_mean > 0


def test_n_bytes_matches_text_length(spark):
    docs = table(spark, SF, "documents")
    media = documents_as_media(docs)
    feats = extract_features(media).select(
        F.col("media_id").alias("doc_id"), "n_bytes"
    )
    j = docs.select("doc_id", F.length("text").alias("n")).join(feats, "doc_id")
    assert j.filter(F.col("n") != F.col("n_bytes")).count() == 0


def test_unstubbed_decode_raises(spark):
    media = documents_as_media(table(spark, SF, "documents"))
    feats = extract_features(media, decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        feats.limit(1).collect()
