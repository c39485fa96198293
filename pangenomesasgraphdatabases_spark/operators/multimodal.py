"""Multimodal column plumbing (engine extension).

Images/audio/video are opaque `binary` columns with typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
mapInPandas partition flow — is real and tested.  Decode has two
tiers (r5):

* ``decode_stub=False`` runs REAL decoders for the library-free
  formats (operators/media_codecs: uncompressed 24-bit BMP, binary
  PPM, PCM WAV — pure struct/numpy), computing true image luminance /
  audio RMS features and true nearest-neighbor resizes.  Compressed
  formats (JPEG/PNG/MP4) still raise NotImplementedError at the
  documented boundary where PIL/librosa/ffmpeg would plug in (this
  container ships none).
* ``decode_stub=True`` keeps the deterministic byte-level fake
  features (the oracle-hashed `media_feature_extract` path, which
  wraps text payloads — not decodable media).

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


def _real_feat(media_type: str, payload: bytes) -> float:
    """True decoded feature: mean Rec.601 luminance for images, RMS
    amplitude (int16 units) for audio.  Raises NotImplementedError for
    formats that need an external library."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        IMAGE_DECODERS,
        decode_wav,
        luminance_mean,
    )

    if media_type in IMAGE_DECODERS:
        return luminance_mean(IMAGE_DECODERS[media_type](payload))
    if media_type == "audio/wav":
        samples, _rate = decode_wav(payload)
        return float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
    raise NotImplementedError(
        f"no library-free decoder for {media_type!r}; JPEG/PNG/MP4 need "
        "PIL/librosa/ffmpeg (stub boundary)"
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches; one pandas frame per partition slice).  decode_stub=False
    REALLY decodes BMP/PPM/WAV (media_codecs) — feat_mean is then the
    true luminance/RMS; n_bytes/checksum stay byte-level either way."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(
                lambda b: sum(b[:64]) if b is not None else 0
            )
            if decode_stub:
                feat = payloads.map(
                    lambda b: (sum(b[:256]) / max(len(b[:256]), 1))
                    if b
                    else 0.0
                )
            else:
                feat = pd.Series(
                    [
                        _real_feat(mt, b) if b else 0.0
                        for mt, b in zip(pdf["media_type"], payloads)
                    ]
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
    """Resize pass over binary payloads (mapInPandas).
    decode_stub=False REALLY resizes BMP/PPM images: decode ->
    nearest-neighbor resample -> re-encode in the same format
    (media_codecs); unsupported formats raise at the documented
    boundary.  With the stub the output payload is a deterministic
    byte resample to target_width*target_height length
    (stride-sampled, zero-padded) — Arrow batch flow, schema, and
    metadata update are the same real machinery either way."""
    n_out = target_width * target_height

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pangenomesasgraphdatabases_spark.operators.media_codecs import (
            IMAGE_DECODERS,
            IMAGE_ENCODERS,
            resize_nearest,
        )

        def real_resize(media_type, b):
            if b is None or len(b) == 0:
                return b
            if media_type not in IMAGE_DECODERS:
                raise NotImplementedError(
                    f"no library-free resize for {media_type!r} "
                    "(PIL/ffmpeg boundary)"
                )
            arr = IMAGE_DECODERS[media_type](b)
            return IMAGE_ENCODERS[media_type](
                resize_nearest(arr, target_width, target_height)
            )

        def stub_resize(b):
            if b is None or len(b) == 0:
                return bytes(n_out)
            stride = max(len(b) // n_out, 1)
            out = bytes(b[::stride][:n_out])
            return out + bytes(n_out - len(out))

        for pdf in batches:
            if decode_stub:
                payload = pdf["payload"].map(stub_resize)
            else:
                payload = pd.Series(
                    [
                        real_resize(mt, b)
                        for mt, b in zip(pdf["media_type"], pdf["payload"])
                    ],
                    dtype="object",
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payload,
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
