"""Deterministic image codecs for the image+caption payload table.

``BASELINE.json:input_hint`` fixes the payload schema
``(image_id, bytes, w, h, fmt, caption, phash)`` and the per-row invariant
"decoded-pixel allclose (PSNR>=40dB for lossy) + caption equality".

The container has no image libraries (no PIL), so:

* ``fmt='png'``   -> a REAL minimal PNG (8-bit RGB, filter 0, zlib), written
  and parsed in pure Python.  Lossless: decode(encode(x)) == x.
* ``fmt='jpeg'``  -> a clearly-marked DETERMINISTIC FAKE lossy codec: pixels
  are quantized to step 8 (uniform error in [-4,4] -> MSE~5.3 -> PSNR~40.9dB,
  satisfying the >=40dB invariant) and stored in the PNG container behind a
  4-byte ``FJPG`` magic.  Real JPEG decode is stubbed: feeding actual JPEG
  bytes raises NotImplementedError unless PIL is importable.

All functions are numpy-vectorized per image and are called from
``mapInPandas`` batches (Arrow transfer), never per-row Python UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"  # deterministic fake-lossy container marker

try:  # real-codec path when available (not in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) -> minimal valid PNG (color type 2, filter 0)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter-type byte (0) per scanline
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Parse a PNG produced by :func:`encode_png` (filter 0, RGB8 only)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("only 8-bit RGB PNGs are supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter-0 scanlines are supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


_Q = 8  # quantization step for the fake lossy codec


def quantize_lossy(pixels: np.ndarray) -> np.ndarray:
    """Round each channel to the nearest multiple of 8 (clipped to 248).
    Max abs error 4 -> PSNR ~40.9dB against the original."""
    q = ((pixels.astype(np.int32) + _Q // 2) // _Q) * _Q
    return np.clip(q, 0, 248).astype(np.uint8)


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE lossy encode (see module docstring)."""
    return FJPG_MAGIC + encode_png(quantize_lossy(pixels))


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode payload bytes according to ``fmt`` ('png' | 'jpeg')."""
    if data.startswith(PNG_SIG):
        return decode_png(data)
    if data.startswith(FJPG_MAGIC):
        return decode_png(data[len(FJPG_MAGIC):])
    if _HAS_PIL:
        import io

        from PIL import Image as _Image

        return np.asarray(_Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        f"real {fmt!r} decode requires PIL, which is unavailable in this "
        "container; only the deterministic PNG/FJPG codecs are supported"
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def average_hash(pixels: np.ndarray) -> int:
    """Perceptual-hash-like signed int64: 8x8 block-mean gray, bit = above
    mean.  Deterministic, rotation-variant — a stand-in for pHash."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-mean resize to 8x8 via integer bucket edges
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                               xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
