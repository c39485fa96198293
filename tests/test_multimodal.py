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


def test_resize_media_stub_shapes(spark):
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )

    media = documents_as_media(table(spark, SF, "documents")).limit(20)
    out = resize_media(media, 16, 8).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 16 * 8 for r in out)
    assert all((r.meta_width, r.meta_height) == (16, 8) for r in out)


def test_sample_frames_every_nth_block(spark):
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        sample_frames,
    )

    # one "video": 100 frames of 4 bytes, frame k = [k,k,k,k]
    payload = b"".join(bytes([k % 256] * 4) for k in range(100))
    media = spark.createDataFrame(
        [(1, "video/raw", payload, 2, 2)],
        "media_id long, media_type string, payload binary,"
        " meta_width int, meta_height int",
    )
    rows = sorted(
        (r.frame_idx, bytes(r.frame_bytes))
        for r in sample_frames(media, frame_size=4, every_n=10).collect()
    )
    assert [i for i, _ in rows] == list(range(0, 100, 10))
    assert all(fb == bytes([i % 256] * 4) for i, fb in rows)
