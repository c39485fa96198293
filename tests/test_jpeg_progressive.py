"""Progressive (SOF2) JPEG codec tests.

The load-bearing pin: ``encode_jpeg_progressive`` transmits the SAME
quantized coefficients as ``encode_jpeg`` at the same quality and
subsampling, so progressive decode must equal baseline decode
BIT-FOR-BIT on every image — any error in spectral selection,
successive approximation (DC floor-shift vs AC magnitude-shift),
EOB-run bookkeeping, refinement correction-bit ordering, or the
per-scan optimal Huffman tables shifts a pixel and fails equality.
The per-scan DHT segments also make between-scan table redefinition
load-bearing: every progressive file redefines AC tables 0/1 six
times.

Reference: ITU-T T.81 Annex G (progressive) and Annex K.2 (optimal
table generation); the reference repo has no media path at all — this
is part of the multimodal extension surface (SURVEY.md §6).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pangenomesasgraphdatabases_spark.operators.jpeg_codec import (
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _BitWriter,
    _encode_block,
    _encode_scan_ac_first,
    _M,
    _pad_to,
    _rgb_to_ycbcr,
    _SymCounter,
    _SymWriter,
    build_huffman_codes,
    build_huffman_decoder,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    gen_optimal_table,
    quality_scale,
    QT_LUMA,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


# --- Exact equality with the baseline decode --------------------------------


@pytest.mark.parametrize(
    "h,w,sub",
    [
        (8, 8, "444"),
        (16, 16, "444"),
        (24, 17, "444"),
        (33, 29, "420"),
        (16, 24, "420"),
        (40, 40, "420"),
    ],
)
def test_progressive_equals_baseline_random(h, w, sub):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    want = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
    got = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsampling=sub))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [50, 75, 100])
def test_progressive_equals_baseline_gradient(sub, quality):
    yy, xx = np.mgrid[0:37, 0:41]
    img = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=-1
    ).astype(np.uint8)
    want = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    got = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsampling=sub)
    )
    assert np.array_equal(want, got)


def test_progressive_flat_image_is_eob_dominated_and_exact():
    """A flat image's AC scans are one EOB run each — the smallest
    possible scan bodies — and must still decode exactly."""
    img = np.full((32, 48, 3), 137, np.uint8)
    base = encode_jpeg(img, quality=90)
    prog = encode_jpeg_progressive(img, quality=90)
    assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(6, 40),
        st.integers(6, 40),
        st.sampled_from(["444", "420"]),
        st.sampled_from([60, 85, 100]),
        st.integers(0, 2**31 - 1),
    )
    def check(h, w, sub, q, seed):
        rng = np.random.default_rng(seed)
        # mix of smooth ramp + noise: exercises both long zero runs
        # and dense high-frequency bands
        ramp = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2) % 256
        noise = rng.integers(0, 64, (h, w, 3))
        img = ((ramp[..., None] + noise) % 256).astype(np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        got = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsampling=sub))
        assert np.array_equal(want, got)

    check()


# --- Non-interleaved baseline multi-scan (one scan per component) -----------


def test_baseline_noninterleaved_three_scans_decode():
    """T.81 allows a baseline image to ship one scan per component;
    hand-mux a 3-scan stream carrying the same coefficients as the
    interleaved encode and require identical decode output (this used
    to be a NotImplementedError boundary — ADVICE r7)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    interleaved = encode_jpeg(img, quality=80, subsampling="444")
    want = decode_jpeg(interleaved)

    # Re-encode the same planes as three sequential scans.
    qy = quality_scale(QT_LUMA, 80)
    from pangenomesasgraphdatabases_spark.operators.jpeg_codec import (
        AC_CHROMA_BITS,
        AC_CHROMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_CHROMA_BITS,
        DC_CHROMA_VALS,
        QT_CHROMA,
    )

    qc = quality_scale(QT_CHROMA, 80)
    ycc = _rgb_to_ycbcr(img)
    planes = [_pad_to(ycc[..., i], 8) for i in range(3)]
    dc_l = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def dqt(tid, tab):
        return _seg(0xDB, bytes([tid]) + bytes(int(x) for x in tab.flatten()[ZIGZAG]))

    def dht(cls, tid, bits, vals):
        return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += dqt(0, qy) + dqt(1, qc)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", 16, 24)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        qtab = qy if ci == 0 else qc
        dc_codes = dc_l if ci == 0 else dc_c
        ac_codes = ac_l if ci == 0 else ac_c
        tt = 0x00 if ci == 0 else 0x11
        out += _seg(0xDA, bytes([1, cid, tt, 0, 63, 0]))
        bw = _BitWriter()
        pred = 0
        plane = planes[ci]
        for by in range(plane.shape[0] // 8):
            for bx in range(plane.shape[1] // 8):
                pred = _encode_block(
                    bw,
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    qtab,
                    pred,
                    dc_codes,
                    ac_codes,
                )
        out += bw.flush()
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    assert np.array_equal(want, got)


# --- Optimal Huffman table generation (Annex K.2) ---------------------------


def test_gen_optimal_table_canonical_and_complete():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 255), st.integers(1, 10_000), min_size=1, max_size=200
        )
    )
    def check(freq):
        bits, vals = gen_optimal_table(freq)
        # every symbol coded exactly once, lengths within 16
        assert sorted(vals) == sorted(freq)
        assert sum(bits) == len(vals)
        assert len(bits) == 16
        codes = build_huffman_codes(bits, vals)
        # Kraft sum strictly < 1: the all-ones code stays reserved
        kraft = sum(2.0 ** -length for _, length in codes.values())
        assert kraft < 1.0 or len(freq) == 1
        # prefix-free by construction: decoder table is total
        assert len(build_huffman_decoder(bits, vals)) == len(vals)
        # the all-ones code of each used length is never assigned
        for code, length in codes.values():
            assert code != (1 << length) - 1

    check()


def test_gen_optimal_table_orders_by_frequency():
    freq = {0x01: 1000, 0x02: 100, 0x03: 10, 0x04: 1}
    bits, vals = gen_optimal_table(freq)
    codes = build_huffman_codes(bits, vals)
    lengths = {s: length for s, (_, length) in codes.items()}
    assert lengths[0x01] <= lengths[0x02] <= lengths[0x03] <= lengths[0x04]


def test_gen_optimal_table_empty_raises():
    with pytest.raises(ValueError, match="empty scan"):
        gen_optimal_table({})


# --- EOB runs past the EOB14 ceiling, hand-muxed scans ----------------------


def _single_component_progressive(h, w, scan_payloads, dri=0):
    """Minimal single-component SOF2 stream with all-ones quant table
    and the given (dht_bytes, sos_bytes, entropy_bytes) scans."""
    out = bytearray(b"\xff\xd8")
    flat = np.ones((8, 8), dtype=np.int64)
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in flat.flatten()[ZIGZAG]))
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    for chunk in scan_payloads:
        out += chunk
    out += b"\xff\xd9"
    return bytes(out)


def test_eobrun_exceeding_eob14_ceiling():
    """39 999 consecutive all-zero AC blocks force the encoder to
    split the run at the 32 767 (EOB14) ceiling; the decoder must
    track both runs across a 200x200-block scan."""
    nb = 200  # 200x200 blocks = 1600x1600 px
    coefs = np.zeros((nb, nb, 64), dtype=np.int32)
    coefs[0, 0, 1] = 5
    coefs[nb - 1, nb - 1, 1] = -3
    order = [(by, bx) for by in range(nb) for bx in range(nb)]

    counter = _SymCounter()
    _encode_scan_ac_first(counter, coefs, 1, 63, 0, order)
    bits, vals = gen_optimal_table(counter.freq)
    # the run between the two nonzero blocks is 39 998 > 32 767, so
    # BOTH EOB14 (0xE0) and a shorter EOBn must appear
    assert 0xE0 in counter.freq

    bw = _BitWriter()
    _encode_scan_ac_first(_SymWriter(bw, build_huffman_codes(bits, vals)), coefs, 1, 63, 0, order)
    dht = _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    sos = _seg(0xDA, bytes([1, 1, 0x10, 1, 63, 0]))
    blob = _single_component_progressive(nb * 8, nb * 8, [dht + sos + bw.flush()])

    got = decode_jpeg(blob)
    # expected: IDCT of a lone zigzag-1 coefficient in two corner
    # blocks, 128-gray everywhere else
    for val, (by, bx) in ((5, (0, 0)), (-3, (nb - 1, nb - 1))):
        nat = np.zeros(64)
        nat[ZIGZAG[1]] = val
        want = np.clip(
            np.round(_M.T @ nat.reshape(8, 8) @ _M + 128.0), 0, 255
        ).astype(np.uint8)
        block = got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert np.array_equal(block, want)
    assert (got[8:16, 8:16] == 128).all()


def test_progressive_restart_interval_resets_eobrun():
    """An RSTn inside a progressive AC scan resets the EOB run: two
    half-scans each ending in their own EOB run, joined by RST0, must
    decode identically to the unrestarted coefficients."""
    nb_y, nb_x = 4, 10  # 40 blocks, restart after 20
    coefs = np.zeros((nb_y, nb_x, 64), dtype=np.int32)
    coefs[0, 1, 2] = 7
    coefs[3, 8, 3] = -4
    order = [(by, bx) for by in range(nb_y) for bx in range(nb_x)]
    half = len(order) // 2

    counter = _SymCounter()
    _encode_scan_ac_first(counter, coefs, 1, 63, 0, order[:half])
    _encode_scan_ac_first(counter, coefs, 1, 63, 0, order[half:])
    bits, vals = gen_optimal_table(counter.freq)
    codes = build_huffman_codes(bits, vals)
    bw = _BitWriter()
    _encode_scan_ac_first(_SymWriter(bw, codes), coefs, 1, 63, 0, order[:half])
    bw.marker(0xD0)
    _encode_scan_ac_first(_SymWriter(bw, codes), coefs, 1, 63, 0, order[half:])
    dht = _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    sos = _seg(0xDA, bytes([1, 1, 0x10, 1, 63, 0]))
    blob = _single_component_progressive(
        nb_y * 8, nb_x * 8, [dht + sos + bw.flush()], dri=half
    )

    got = decode_jpeg(blob)
    for val, zz, (by, bx) in ((7, 2, (0, 1)), (-4, 3, (3, 8))):
        nat = np.zeros(64)
        nat[ZIGZAG[zz]] = val
        want = np.clip(
            np.round(_M.T @ nat.reshape(8, 8) @ _M + 128.0), 0, 255
        ).astype(np.uint8)
        block = got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert np.array_equal(block, want)


# --- Scan-script structure --------------------------------------------------


def test_progressive_stream_structure():
    """The emitted file is SOF2 with 8 scans (DC first, 3x AC first,
    DC refine, 3x AC refine) and 6 per-scan DHTs redefining the AC
    tables."""
    img = np.arange(32 * 32 * 3, dtype=np.uint64).reshape(32, 32, 3)
    img = (img % 251).astype(np.uint8)
    blob = encode_jpeg_progressive(img)
    assert blob.count(b"\xff\xc2") == 1 and b"\xff\xc0" not in blob
    n_sos = blob.count(b"\xff\xda")
    assert n_sos == 8
    # 1 header DHT segment pair + 6 per-AC-scan DHTs
    assert blob.count(b"\xff\xc4") == 8
