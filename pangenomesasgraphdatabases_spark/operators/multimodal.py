"""Multimodal column plumbing (engine extension).

Images/audio/video are opaque `binary` columns with typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
mapInPandas partition flow — is real and tested; the actual media
decode is STUBBED (this container ships no image/audio libraries):
`decode_stub=True` produces deterministic fake features, and
`decode_stub=False` raises NotImplementedError where a real decoder
(PIL/librosa/ffmpeg) would plug in.

At 100 TB: binary payloads stay columnar in parquet, metadata columns
support predicate pushdown (filter by media_type/width without
touching bytes), and feature extraction streams partition-wise through
Arrow with bounded memory (maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("feat_mean", T.DoubleType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: text payload bytes as
    the opaque binary column + synthetic dimensions metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("meta_width"),
        (F.col("n_chars") % 480).cast("int").alias("meta_height"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches; one pandas frame per partition slice)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "container ships none (stub boundary)"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(
                lambda b: sum(b[:64]) if b is not None else 0
            )
            feat = payloads.map(
                lambda b: (sum(b[:256]) / max(len(b[:256]), 1)) if b else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "feat_mean": feat.astype("float64"),
                }
            )

    return media.mapInPandas(proc, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    target_width: int,
    target_height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize pass over binary payloads (mapInPandas).  With the stub
    decoder the output payload is a deterministic resample of the input
    bytes to target_width*target_height length (stride-sampled, zero-
    padded) — the Arrow batch flow, schema, and metadata update are the
    real machinery; a production deployment swaps the body for
    PIL/ffmpeg (decode_stub=False raises at the same boundary as
    extract_features)."""
    n_out = target_width * target_height

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg; "
                    "container ships none (stub boundary)"
                )

            def stub_resize(b):
                if b is None or len(b) == 0:
                    return bytes(n_out)
                stride = max(len(b) // n_out, 1)
                out = bytes(b[::stride][:n_out])
                return out + bytes(n_out - len(out))

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": pdf["payload"].map(stub_resize),
                    "meta_width": target_width,
                    "meta_height": target_height,
                }
            )

    return media.mapInPandas(proc, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, frame_size: int, every_n: int = 10
) -> DataFrame:
    """Frame sampling for video-like payloads: the payload is a
    concatenation of fixed-size frame blocks; keep every Nth block.
    Pure byte slicing — NO decode involved, so this path is fully real
    (not stubbed).  One output row per sampled frame; at scale the
    explode happens inside the Arrow batch, and the payload bytes of
    dropped frames are never shipped downstream."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_size
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(
                        bytes(payload[k * frame_size : (k + 1) * frame_size])
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(proc, FRAME_SCHEMA)
