"""Minimal deterministic image codecs (no PIL in the environment).

Two formats, mirroring the lossless/lossy split of the input_hint
(png 70% / jpeg 30%):

- ``png``: REAL spec-compliant PNG, 8-bit grayscale, filter 0, zlib IDAT.
  Decodable by any PNG reader; our decoder handles exactly what our
  encoder emits (single IDAT chain, filter 0/1/2 rows). Lossless —
  bit-exact roundtrip is asserted in tests.
- ``qnt``: stand-in LOSSY codec (uniform quantization, step q) used where
  the reference data would be JPEG. The container has no JPEG library, so
  per the driver instructions the *lossy transform* is a deterministic
  fake while all Spark-side plumbing (binary column, batch decode in
  mapInPandas, PSNR gate >= 40 dB) is real. Header: b"QNT1" + w,h (u16 BE)
  + q (u8); payload: zlib of quantized bytes. PSNR for q=4 is ~44 dB.

PSNR gate mirrors BASELINE.json: lossless bit-exact, lossy PSNR >= 40 dB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit grayscale numpy (h, w) -> PNG bytes (filter 0 rows)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("expected uint8 (h, w) grayscale")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, grayscale
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per row
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("decoder supports 8-bit grayscale only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.empty((h, w), dtype=np.uint8)
    for i in range(h):
        f = filters[i]
        if f == 0:
            out[i] = rows[i].astype(np.uint8)
        elif f == 1:  # Sub
            out[i] = (np.add.accumulate(rows[i].astype(np.int64)) % 256).astype(np.uint8)
        elif f == 2:  # Up
            out[i] = ((rows[i] + out[i - 1]) % 256).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out


def encode_qnt(img: np.ndarray, q: int = 4) -> bytes:
    """Deterministic lossy stand-in: quantize to step q, zlib-compress."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("expected uint8 (h, w) grayscale")
    h, w = img.shape
    # allow the ceiling bucket so saturated pixels stay within q/2 error
    # (decode clips back to 255); without it, 255 -> 63*4 = 252 and bright
    # images fall under the 40 dB PSNR gate
    quant = ((img.astype(np.int32) + q // 2) // q).clip(0, (255 + q - 1) // q).astype(np.uint8)
    return b"QNT1" + struct.pack(">HHB", w, h, q) + zlib.compress(quant.tobytes(), 6)


def decode_qnt(data: bytes) -> np.ndarray:
    if data[:4] != b"QNT1":
        raise ValueError("not QNT")
    w, h, q = struct.unpack(">HHB", data[4:9])
    quant = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w)
    return (quant.astype(np.int32) * q).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qnt":
        return decode_qnt(data)
    raise NotImplementedError(
        f"format {fmt!r}: real JPEG/video decode needs external libs not in this "
        "container — plumbing is format-agnostic, add a decoder here"
    )


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(img: np.ndarray) -> int:
    """64-bit average-hash style perceptual hash (deterministic, no DCT libs):
    downsample to 8x8 by block means, threshold at the mean, pack row-major."""
    h, w = img.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    # interpret as signed int64 for BIGINT storage
    if v >= 1 << 63:
        v -= 1 << 64
    return v
