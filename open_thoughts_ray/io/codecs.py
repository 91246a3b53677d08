"""Deterministic pure-numpy image codecs + perceptual hash.

The sandbox has no PIL / libjpeg, so the benchmark table's ``bytes``
column uses three from-scratch codecs (FIXTURES.md F1):

* ``raw``  — uncompressed interleaved RGB uint8, ``h*w*3`` bytes.
* ``pngz`` — zlib-compressed raw RGB (lossless, DEFLATE like PNG IDAT).
* ``qjpg`` — lossy: uniform quantization (step Q=4) + zlib.  Max per-pixel
  error is 2, giving reconstruction PSNR ≈ 46 dB ≥ the 40 dB invariant.

Round 5 adds two REAL container formats behind the same registry:
``jpg`` (baseline JFIF, io/jpeg.py) and ``png`` (ISO 15948 truecolor,
io/png.py) — both from-scratch spec implementations, swap seams for
libjpeg-turbo/libpng at 100-TB scale.

All functions are deterministic (no wall-clock, no global RNG) and
vectorized.  ``average_phash`` is the 64-bit DCT-free perceptual hash the
near-dup collapse keys on (grayscale → 32×32 block-mean → 8×8 block-mean →
bit = cell > mean), the graft analogue of the reference's FAISS embedding
near-dup filter (open_thoughts_3/engine/operators/similarity_filtering_operator.py).
"""

from __future__ import annotations

import zlib

import numpy as np

FORMATS = ("raw", "pngz", "qjpg", "jpg", "png")
QJPG_STEP = 4  # quantization step; max abs error = QJPG_STEP // 2 = 2
JPG_QUALITY = 98  # default quality: min PSNR 43.5 dB on the noisy
# synthetic corpus (±8 per-pixel noise is near-worst-case for DCT
# coding) at ~2:1 compression — clears the 40 dB lossy invariant


def encode(px: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array to bytes in ``fmt``."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {px.shape} {px.dtype}")
    if fmt == "raw":
        return px.tobytes()
    if fmt == "pngz":
        return zlib.compress(px.tobytes(), 6)
    if fmt == "qjpg":
        q = (px // QJPG_STEP).astype(np.uint8)
        return zlib.compress(q.tobytes(), 6)
    if fmt == "jpg":
        from .jpeg import encode_jpeg

        return encode_jpeg(px, quality=JPG_QUALITY)
    if fmt == "png":
        from .png import encode_png

        return encode_png(px)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode bytes back to an (h, w, 3) uint8 RGB array."""
    n = h * w * 3
    if fmt == "raw":
        arr = np.frombuffer(buf, dtype=np.uint8, count=n)
    elif fmt == "pngz":
        arr = np.frombuffer(zlib.decompress(buf), dtype=np.uint8, count=n)
    elif fmt == "qjpg":
        q = np.frombuffer(zlib.decompress(buf), dtype=np.uint8, count=n)
        arr = np.minimum(
            q.astype(np.uint16) * QJPG_STEP + QJPG_STEP // 2, 255
        ).astype(np.uint8)
    elif fmt == "jpg":
        from .jpeg import decode_jpeg

        px = decode_jpeg(bytes(buf))
        if px.shape[:2] != (h, w):
            raise ValueError(f"JPEG header {px.shape[:2]} != metadata {(h, w)}")
        return px
    elif fmt == "png":
        from .png import decode_png

        px = decode_png(bytes(buf))
        if px.shape[:2] != (h, w):
            raise ValueError(f"PNG header {px.shape[:2]} != metadata {(h, w)}")
        return px
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    if arr.size != n:
        raise ValueError(f"payload size {arr.size} != {h}x{w}x3")
    return arr.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _bin_edges(n: int, out: int) -> tuple[np.ndarray, np.ndarray]:
    """Start/end pixel indices for ``out`` bins over ``n`` pixels; every
    bin covers ≥1 pixel (pixels are re-used when upsampling n < out)."""
    starts = (np.arange(out) * n // out).astype(np.int64)
    ends = np.maximum(starts + 1, (np.arange(1, out + 1) * n // out).astype(np.int64))
    return starts, np.minimum(ends, n)


def _block_mean_resize(gray: np.ndarray, out: int) -> np.ndarray:
    """Area-style deterministic resize via integer bin edges + cumsum."""
    h, w = gray.shape
    cs = np.zeros((h + 1, w + 1), dtype=np.float64)
    cs[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    ys, ye = _bin_edges(h, out)
    xs, xe = _bin_edges(w, out)
    sums = (
        cs[np.ix_(ye, xe)]
        - cs[np.ix_(ys, xe)]
        - cs[np.ix_(ye, xs)]
        + cs[np.ix_(ys, xs)]
    )
    areas = np.outer(ye - ys, xe - xs).astype(np.float64)
    return sums / areas


def average_phash(px: np.ndarray) -> int:
    """64-bit average-hash of an (h, w, 3) uint8 image (unsigned int).

    Grayscale (mean of channels) → 32×32 block-mean resize → 8×8
    block-mean → bit_i = cell_i > mean(cells).  Bit 0 is the MSB
    (row-major cell order), packed big-endian into a uint64.
    """
    gray = px.astype(np.float64).mean(axis=2)
    g32 = _block_mean_resize(gray, 32)
    g8 = g32.reshape(8, 4, 8, 4).mean(axis=(1, 3))
    bits = (g8 > g8.mean()).astype(np.uint64).ravel()
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h)


def hamming64(a, b):
    """Hamming distance between two uint64 hashes; vectorized."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # popcount via unpackbits on the byte view
    bytes_view = x.reshape(-1).view(np.uint8)
    cnt = np.unpackbits(bytes_view).reshape(-1, 8 * x.itemsize).sum(axis=1)
    if np.isscalar(a) or (np.asarray(a).ndim == 0 and np.asarray(b).ndim == 0):
        return int(cnt[0])
    return cnt
