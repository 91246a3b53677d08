"""Real PNG codec (encoder + decoder) in pure numpy + stdlib zlib.

Closes the "real compressed codecs" gap alongside io/jpeg.py: the
reference corpus's lossless images are PNGs
(open_thoughts_3/engine/operators/*_source pipelines ship image bytes
opaquely; the graft's ``fmt`` column names the container).  The sandbox
has no PIL/libpng wheel, so this implements ISO/IEC 15948 (RFC 2083)
from the public spec:

* 8-byte signature + length/type/data/CRC32 chunk framing (CRCs are
  real and verified on decode),
* IHDR (8-bit RGB truecolor, no interlace), one-or-more IDAT carrying
  a single zlib stream, IEND; ancillary chunks are skipped,
* all five scanline filters (None/Sub/Up/Average/Paeth) — the encoder
  picks per row with the spec's recommended minimum-sum-of-absolute-
  differences heuristic, fully vectorized; the decoder unfilters
  Sub vectorized via wrapping ``np.add.accumulate`` and Average/Paeth
  with the unavoidable left-dependency column walk.

Scope: the *correctness* seam.  Encode and the None/Sub/Up decode paths
are vectorized end-to-end; Average/Paeth unfilter walks columns in
Python — fine for test/benchmark sizes, and a 100-TB run swaps this
file for libpng/Pillow-SIMD behind the same encode/decode signature
(the documented performance seam, same contract as io/jpeg.py).
Lossless: round-trip is bit-exact, satisfying the north-star's
decoded-pixel-allclose invariant with zero error.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: 8-bit RGB truecolor (color type 2)


# ------------------------------------------------------------- chunks


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _iter_chunks(buf: bytes):
    """Yield (type, data) pairs, verifying each chunk's CRC32."""
    if buf[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 12 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG: no IEND")


# ------------------------------------------------------------ filters


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec §9.4), uint8 output."""
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = upleft.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )
    return out.astype(np.uint8)


def _filter_all(arr: np.ndarray) -> np.ndarray:
    """All 5 filtered candidates for every row: (5, h, w*3) uint8.

    ``arr`` is the (h, n) raw scanline byte matrix; uint8 subtraction
    wraps mod 256 exactly as the spec requires.
    """
    h, n = arr.shape
    left = np.zeros_like(arr)
    left[:, _BPP:] = arr[:, :-_BPP]
    up = np.zeros_like(arr)
    up[1:] = arr[:-1]
    upleft = np.zeros_like(arr)
    upleft[1:, _BPP:] = arr[:-1, :-_BPP]
    avg = ((left.astype(np.uint16) + up.astype(np.uint16)) // 2).astype(
        np.uint8
    )
    return np.stack(
        [arr, arr - left, arr - up, arr - avg, arr - _paeth(left, up, upleft)]
    )


def encode_png(px: np.ndarray, level: int = 6,
               filter_mode: str = "adaptive") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real PNG.

    ``filter_mode``: "adaptive" (per-row MSAD heuristic, the spec's
    recommendation for truecolor), "none", or an int 0-4 forcing one
    filter everywhere (used by tests to exercise every decode path).
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(
            f"expected (h, w, 3) uint8, got {px.shape} {px.dtype}"
        )
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    arr = px.reshape(h, w * _BPP)
    cand = _filter_all(arr)  # (5, h, n)
    if filter_mode == "adaptive":
        # minimum sum of absolute differences, bytes read as signed
        signed = cand.astype(np.int16)
        cost = np.minimum(signed, 256 - signed).sum(axis=2)  # (5, h)
        choice = np.argmin(cost, axis=0)  # (h,)
    elif filter_mode == "none":
        choice = np.zeros(h, dtype=np.int64)
    else:
        choice = np.full(h, int(filter_mode), dtype=np.int64)
        if not (0 <= choice[0] <= 4):
            raise ValueError(f"bad filter_mode {filter_mode!r}")
    out = np.empty((h, 1 + w * _BPP), dtype=np.uint8)
    out[:, 0] = choice
    out[:, 1:] = cand[choice, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(out.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, 3) uint8 RGB array.

    Supports the encoder's subset (8-bit truecolor, non-interlaced) and
    rejects anything else with a clear error; CRCs are verified.
    """
    w = h = None
    idat = []
    for ctype, data in _iter_chunks(bytes(buf)):
        if ctype == b"IHDR":
            w, h, depth, ctype_, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_) != (8, 2):
                raise ValueError(
                    f"unsupported PNG: bit depth {depth}, color type "
                    f"{ctype_} (only 8-bit RGB truecolor)"
                )
            if comp or filt:
                raise ValueError("unsupported compression/filter method")
            if interlace:
                raise ValueError("unsupported: Adam7 interlace")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    if not idat:
        raise ValueError("missing IDAT")
    raw = zlib.decompress(b"".join(idat))
    n = w * _BPP
    if len(raw) != h * (1 + n):
        raise ValueError(
            f"IDAT size {len(raw)} != {h}x(1+{n}) scanlines"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + n)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"bad filter type {int(ftypes.max())}")
    out = np.empty((h, n), dtype=np.uint8)
    prev = np.zeros(n, dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        f = rows[y, 1:]
        if ft == 0:
            cur = f.copy()
        elif ft == 1:  # Sub: wrapping cumsum over the 3 byte lanes
            cur = np.add.accumulate(
                f.reshape(w, _BPP), axis=0, dtype=np.uint8
            ).reshape(n)
        elif ft == 2:  # Up
            cur = f + prev
        else:  # Average / Paeth: left-dependency column walk
            cur = np.empty(n, dtype=np.uint8)
            fl = f.reshape(w, _BPP)
            cl = cur.reshape(w, _BPP)
            pl = prev.reshape(w, _BPP).astype(np.int16)
            left = np.zeros(_BPP, dtype=np.int16)
            if ft == 3:
                for x in range(w):
                    cl[x] = fl[x] + ((left + pl[x]) // 2).astype(np.uint8)
                    left = cl[x].astype(np.int16)
            else:
                upleft = np.zeros(_BPP, dtype=np.int16)
                for x in range(w):
                    p = left + pl[x] - upleft
                    pa = np.abs(p - left)
                    pb = np.abs(p - pl[x])
                    pc = np.abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, pl[x], upleft),
                    )
                    cl[x] = fl[x] + pred.astype(np.uint8)
                    left = cl[x].astype(np.int16)
                    upleft = pl[x]
        out[y] = cur
        prev = cur
    return out.reshape(h, w, _BPP)


def png_dimensions(buf: bytes) -> tuple[int, int]:
    """(w, h) from the IHDR without decompressing pixel data — the
    pre-decode geometry-gate probe (same contract as jpeg_dimensions)."""
    buf = bytes(buf)
    if buf[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    if buf[12:16] != b"IHDR":
        raise ValueError("first chunk is not IHDR")
    w, h = struct.unpack(">II", buf[16:24])
    return w, h
