"""Baseline JFIF JPEG codec in pure python/numpy.

Baseline JPEG (ITU-T T.81 SOF0: 8-bit samples, sequential DCT,
Huffman entropy coding) needs no external library — the whole stack
is integer/float math and bit twiddling: Annex K quantization +
Huffman tables, canonical Huffman code construction, zigzag
reordering, an orthonormal 8x8 DCT-II matrix, byte stuffing, and
restart-marker handling.  This module implements both directions:

* ``encode_jpeg``: RGB -> YCbCr (JFIF full-range BT.601), optional
  4:2:0 chroma subsampling (2x2 box average), FDCT, quality-scaled
  Annex K quantization, zigzag run-length + Huffman coding with the
  spec's standard tables.
* ``decode_jpeg``: full marker parse (DQT/SOF0/SOF1/DHT/DRI/SOS,
  APPn/COM skipped), interleaved MCU scan decode with byte
  unstuffing and RSTn predictor resets, dequantize, IDCT, chroma
  upsampling by sampling factor, YCbCr -> RGB.

Because JPEG is lossy, encode->decode is NOT identity; correctness
is established by component tests that pin each piece to the spec
independently (zigzag table values, DCT orthonormality, Huffman
canonical-code construction, quant-table quality scaling) plus
end-to-end bounds (constant blocks round-trip within DC quantization
error; smooth gradients within a PSNR floor) — so a self-consistent
but non-conformant encoder/decoder pair cannot slip through.

The decoder raises NotImplementedError with an actionable message
for the JPEG variants outside baseline huffman (progressive SOF2,
arithmetic coding, hierarchical, 12-bit precision, 16-bit quant
tables) — those remain the PIL boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Spec tables (ITU-T T.81 Annex K) ----------------------------------------

# Zigzag position -> natural (row-major) position, spec Figure A.6.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.1 / K.2 base quantization tables (natural order).
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# K.3 standard Huffman tables: (bits[1..16] counts, values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# --- DCT ---------------------------------------------------------------------


def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M (M @ M.T == I): forward
    transform F = M f M^T, inverse f = M^T F M — exactly the T.81
    FDCT/IDCT pair up to float rounding."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m


_M = dct_matrix()


# --- Huffman -----------------------------------------------------------------


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbol ->
    (code, length), codes increasing within a length, doubling at
    each length step."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in build_huffman_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def marker(self, m: int) -> None:
        """Byte-align and emit a bare marker (RSTn) into the stream."""
        self.pad_align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at any other
    marker, and exposes restart-marker alignment."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits < 25:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past the end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt  # RSTn / EOI / next segment
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def restart(self) -> None:
        """Discard pad bits and consume the RSTn marker.  The reader
        buffers up to 25 bits ahead, so it may sit anywhere between
        'marker already latched' and 'pad bytes still unread' — scan
        forward to the marker before stepping over it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


# --- Quantization ------------------------------------------------------------


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> base table, 100 -> all ones,
    clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --- Encoder -----------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_to(arr: np.ndarray, mult: int) -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(arr, ((0, ph), (0, pw)), mode="edge")


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coefs = _M @ (block - 128.0) @ _M.T
    q = np.round(coefs / qtab).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        size = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG.  ``subsampling``:
    '444' (no chroma subsampling; MCU = 8x8) or '420' (2x2 box-average
    chroma; MCU = 16x16).  ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker every N MCUs (predictor reset +
    byte alignment) — the error-resilience feature real encoders use,
    and the decoder path it exercises."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, _ = arr.shape
    qy = quality_scale(QT_LUMA, quality)
    qc = quality_scale(QT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(arr)

    if subsampling == "444":
        hv_y, mcu = (1, 1), 8
        planes = [_pad_to(ycc[..., i], 8) for i in range(3)]
    else:
        hv_y, mcu = (2, 2), 16
        ypad = _pad_to(ycc[..., 0], 16)
        cpads = []
        for i in (1, 2):
            c = _pad_to(ycc[..., i], 16)
            c = (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2]) / 4.0
            cpads.append(c)
        planes = [ypad] + cpads

    dc_l = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    nmcu = 0
    mcuy, mcux = planes[0].shape[0] // mcu, planes[0].shape[1] // mcu
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.marker(0xD0 + ((nmcu // restart_interval - 1) % 8))
                preds = [0, 0, 0]
            nmcu += 1
            for vy in range(hv_y[1]):
                for vx in range(hv_y[0]):
                    y0 = my * mcu + vy * 8
                    x0 = mx * mcu + vx * 8
                    preds[0] = _encode_block(
                        bw, planes[0][y0 : y0 + 8, x0 : x0 + 8], qy,
                        preds[0], dc_l, ac_l,
                    )
            for ci in (1, 2):
                y0, x0 = my * 8, mx * 8
                preds[ci] = _encode_block(
                    bw, planes[ci][y0 : y0 + 8, x0 : x0 + 8], qc,
                    preds[ci], dc_c, ac_c,
                )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tab.flatten()[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    hvy = (hv_y[0] << 4) | hv_y[1]
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, hvy, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, qy) + dqt(1, qc)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + dri + sof + sos + scan + b"\xff\xd9"
    )


# --- Decoder -----------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC2: "progressive JPEG (SOF2)",
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic progressive JPEG (SOF10)",
    0xCB: "arithmetic lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF JPEG -> (h, w, 3) uint8 RGB (grayscale streams
    broadcast to RGB).  Supports interleaved baseline scans (SOF0 and
    extended-sequential-huffman SOF1), arbitrary sampling factors,
    restart intervals, multi-table DQT/DHT segments.  Non-baseline
    variants raise NotImplementedError naming the PIL boundary."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    dri = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + seglen]
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[marker]} not supported — only baseline "
                "huffman JPEG decodes library-free; PIL would plug in here"
            )
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tid = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables (Pq=1) not supported "
                        "(12-bit-precision JPEG is the PIL boundary)"
                    )
                zztab = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zztab
                qt[tid] = nat.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (baseline is 8-bit)"
                )
            fh, fw = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                huff[(cls, tid)] = build_huffman_decoder(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # Legal per T.81 (a baseline image MAY ship one scan
                # per component), but _decode_scan walks the MCU grid
                # interleaved — decoding a partial scan would KeyError
                # mid-stream instead of failing at the boundary.
                raise NotImplementedError(
                    f"non-interleaved baseline scan (SOS has {ns} of "
                    f"{len(frame['comps'])} frame components) not "
                    "supported — multi-scan JPEG is the PIL boundary"
                )
            tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                tables[cid] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, i + 2 + seglen, frame, tables, qt, huff, dri
            )
        i += 2 + seglen
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, frame, tables, qt, huff, dri):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and nmcu and nmcu % dri == 0:
                br.restart()
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_tab = huff[(0, tables[comp["id"]][0])]
                ac_tab = huff[(1, tables[comp["id"]][1])]
                qtab = qt[comp["tq"]]
                for vy in range(comp["v"]):
                    for vx in range(comp["h"]):
                        t = br.huff(dc_tab)
                        preds[ci] += br.receive_extend(t)
                        zz = np.zeros(64, dtype=np.float64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = br.receive_extend(s)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = zz
                        block = nat.reshape(8, 8) * qtab
                        spatial = _M.T @ block @ _M + 128.0
                        y0 = (my * comp["v"] + vy) * 8
                        x0 = (mx * comp["h"] + vx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            nmcu += 1

    full = []
    for ci, comp in enumerate(comps):
        p = np.repeat(
            np.repeat(planes[ci], vmax // comp["v"], axis=0),
            hmax // comp["h"],
            axis=1,
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
