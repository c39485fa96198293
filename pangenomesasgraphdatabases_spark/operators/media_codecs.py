"""Pure-python/numpy media codecs for library-free formats.

Real decoders for the formats that need no external media library:
uncompressed 24-bit BMP, binary PPM (P6), and PCM WAV.  These back the
``decode_stub=False`` path of operators/multimodal — the decode is
genuinely real for these formats; compressed formats (JPEG/PNG/MP4)
remain the documented NotImplementedError boundary where PIL/ffmpeg
would plug in.

Encoders are provided too (fixture generation, resize re-encode);
every codec round-trips bit-exactly (pytest property).
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP (Windows BITMAPINFOHEADER, 24 bpp, uncompressed) -------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the format spec)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        pix += row + bytes(row_size - len(row))
    pixels = bytes(pix)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    return header + dib + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB.  Handles
    bottom-up and top-down row order and 4-byte row padding."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, offset) = struct.unpack("<IHHI", data[2:14])
    (hdr_size, w, h) = struct.unpack("<Iii", data[14:26])
    (planes, bpp, compression) = struct.unpack("<HHI", data[26:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_size
        row = np.frombuffer(data, np.uint8, w * 3, start).reshape(w, 3)
        y = i if top_down else h - 1 - i
        out[y] = row[:, ::-1]  # BGR -> RGB
    return out


# --- PPM (P6, binary, maxval 255) -------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # Header: magic, width, height, maxval — whitespace/comment
    # separated tokens, then a single whitespace byte before pixels.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    return np.frombuffer(data, np.uint8, h * w * 3, pos).reshape(h, w, 3)


# --- WAV (RIFF, PCM 8/16-bit) -----------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 PCM -> RIFF WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV -> ((n, channels) int16 array, sample_rate).
    8-bit unsigned PCM is widened to int16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            raw = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    if bits == 16:
        arr = np.frombuffer(raw, "<i2")
    else:
        arr = (np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


# --- Dispatch ----------------------------------------------------------------

IMAGE_DECODERS = {
    "image/bmp": decode_bmp,
    "image/x-portable-pixmap": decode_ppm,
}
IMAGE_ENCODERS = {
    "image/bmp": encode_bmp,
    "image/x-portable-pixmap": encode_ppm,
}


def luminance_mean(arr: np.ndarray) -> float:
    """Rec.601 luma mean of an (h, w, 3) uint8 image."""
    a = arr.astype(np.float64)
    return float(
        (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]).mean()
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) image (floor index
    mapping, the classic NN kernel)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]
