"""Baseline JFIF JPEG codec (encoder + decoder) in pure numpy.

Closes the "real compressed codecs" gap for the image payload column:
the reference pipeline's images arrive as real JPEGs; the sandbox has no
PIL/libjpeg wheel, so this implements ITU-T T.81 baseline sequential DCT
from the public spec — Annex K.1/K.2 quantization tables with libjpeg's
quality scaling, Annex K.3 Huffman tables, zigzag + DC-differential +
AC run-length entropy coding, JFIF markers (SOI/APP0/DQT/SOF0/DHT/SOS/
EOI) with byte stuffing, 4:4:4 and 4:2:0 chroma, restart markers on
decode.

Scope: the *correctness* seam.  The 8×8 DCT/quant math is vectorized
(one matmul over all blocks), but entropy coding walks blocks in Python
— fine for the test/benchmark image sizes (≤256px); a 100-TB run swaps
this file for libjpeg-turbo behind the same encode/decode signature
(the documented performance seam).  Round-trip PSNR at quality 90+ on
the synthetic corpus clears the north-star's ≥40 dB lossy invariant
with a genuine DCT quantization error profile, not a uniform-step toy.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------- constant tables

# Annex K.1 / K.2 base quantization tables (row-major 8x8)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
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
    0xF9, 0xFA]
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
    0xF9, 0xFA]

# 8-point DCT-II basis (T.81 A.3.3): D[u,x] = c(u)/2 * cos((2x+1)uπ/16)
_D = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


_ENC_DC = (_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
           _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
           _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))


def quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling (jcparam.c, public)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate) and return (n, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), H // 8, W // 8


def _fdct_quant(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize all blocks at once -> (n, 64) int32 zigzag."""
    coef = np.einsum("ux,nxy,vy->nuv", _D, blocks - 128.0, _D)
    q = np.round(coef / qtbl.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(bw: _BitWriter, zz: np.ndarray, dc_pred: int,
                  dc_tbl: dict, ac_tbl: dict) -> int:
    diff = int(zz[0]) - dc_pred
    s, bits = _magnitude(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        prev = int(idx) + 1
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[1 + idx])
        s, bits = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
    if prev < 63:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB into a baseline JFIF JPEG.

    ``subsample=True`` emits 4:2:0 chroma (2×2 MCUs); default 4:4:4.
    """
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {px.shape} {px.dtype}")
    h, w = px.shape[:2]
    qy = quality_scale(QTBL_LUMA, quality)
    qc = quality_scale(QTBL_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(px)
    if subsample:
        # box-filter 2x2 downsample (pad odd dims by edge replication)
        ph, pw = -h % 2, -w % 2
        if ph or pw:
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))

    yb, ybh, ybw = _plane_blocks(y)
    cbb, cbh, cbw = _plane_blocks(cb)
    crb, _, _ = _plane_blocks(cr)
    zzy = _fdct_quant(yb, qy)
    zzcb = _fdct_quant(cbb, qc)
    zzcr = _fdct_quant(crb, qc)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, bytes([0]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    out += _marker(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    hv_y = 0x22 if subsample else 0x11
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _marker(0xFFC0, sof)
    for cls, tid, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out += _marker(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += _marker(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()
    preds = [0, 0, 0]
    if not subsample:
        # interleaved 4:4:4 MCU = 1 block per component
        for bi in range(zzy.shape[0]):
            preds[0] = _encode_block(bw, zzy[bi], preds[0], _ENC_DC[0], _ENC_AC[0])
            preds[1] = _encode_block(bw, zzcb[bi], preds[1], _ENC_DC[1], _ENC_AC[1])
            preds[2] = _encode_block(bw, zzcr[bi], preds[2], _ENC_DC[1], _ENC_AC[1])
    else:
        # 4:2:0 MCU = 4 Y (2x2) + 1 Cb + 1 Cr; Y block grid is (ybh, ybw)
        mh, mw = (ybh + 1) // 2, (ybw + 1) // 2
        for my in range(mh):
            for mx in range(mw):
                for dy in range(2):
                    for dx in range(2):
                        by = min(2 * my + dy, ybh - 1)
                        bx = min(2 * mx + dx, ybw - 1)
                        preds[0] = _encode_block(
                            bw, zzy[by * ybw + bx], preds[0],
                            _ENC_DC[0], _ENC_AC[0])
                ci = min(my, cbh - 1) * cbw + min(mx, cbw - 1)
                preds[1] = _encode_block(bw, zzcb[ci], preds[1],
                                         _ENC_DC[1], _ENC_AC[1])
                preds[2] = _encode_block(bw, zzcr[ci], preds[2],
                                         _ENC_DC[1], _ENC_AC[1])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # byte position
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker — rewind and signal EOF to the caller
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:  # pad (trailing bits at segment end)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial bits, consume an RSTn marker, return its index."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                m = self.data[self.pos + 1] - 0xD0
                self.pos += 2
                return m
            self.pos += 1
        return None


def _read_huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_block(br: _BitReader, dc_tbl: dict, ac_tbl: dict,
                  dc_pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    s = _read_huff_symbol(br, dc_tbl)
    diff = _extend(br.read(s), s)
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_huff_symbol(br, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read(s), s)
        k += 1
    return zz, dc


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (h, w, 3) uint8 RGB (or (h, w) gray)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg[off + 1: off + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl.astype(np.int32)
                qtables[tq] = q
                off += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit baseline")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1: off + 17])
                n = sum(bits)
                vals = list(seg[off + 17: off + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            data_start = pos + seglen
            return _decode_scan(buf, data_start, h, w, scan, qtables,
                                htables, restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(buf: bytes, pos: int, h: int, w: int, scan: list,
                 qtables: dict, htables: dict, restart_interval: int) -> np.ndarray:
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c, _, _ in scan:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(buf[pos:])
    preds = [0] * len(scan)
    idct = _D.T  # inverse: block = D.T @ coef @ D
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_to_marker()
                preds = [0] * len(scan)
            for ci, (c, td, ta) in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(
                            br, htables[(0, td)], htables[(1, ta)], preds[ci])
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qtables[c["tq"]][ZIGZAG]
                        blk = idct @ coef.reshape(8, 8) @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            n_mcu += 1
    # upsample each component to full resolution and crop
    full = []
    for ci, (c, _, _) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def jpeg_dimensions(buf: bytes) -> tuple[int, int]:
    """(h, w) from the SOF0 header without entropy decoding — the
    metadata-only geometry gate's pre-decode probe for real JPEGs."""
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xC0:
            _, hh, ww = struct.unpack_from(">BHH", buf, pos + 4)
            return hh, ww
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + seglen
    raise ValueError("no SOF0 header found")
