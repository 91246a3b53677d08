"""Baseline JPEG codec: round-trip quality, format structure, integration.

The from-scratch T.81 baseline implementation (io/jpeg.py) replaces the
uniform-quantizer ``qjpg`` stand-in with a real DCT/Huffman path — the
north-star's "PSNR ≥ 40 dB for lossy formats" invariant now exercises
genuine JPEG quantization error.
"""

from __future__ import annotations

import numpy as np
import pytest

from open_thoughts_ray.io import codecs, jpeg


def _test_image(h=96, w=128, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([xx * 255 / w, yy * 255 / h, (xx + yy) % 256], axis=-1)
    px = np.clip(base + rng.integers(-8, 9, (h, w, 3)), 0, 255).astype(np.uint8)
    px[h // 4: h // 2, w // 4: w // 2] = [200, 30, 60]
    return px


def test_roundtrip_psnr_above_40():
    px = _test_image()
    buf = jpeg.encode_jpeg(px, quality=codecs.JPG_QUALITY)
    out = jpeg.decode_jpeg(buf)
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0


def test_fixture_corpus_psnr():
    # the actual synthetic corpus images (±8 noise ≈ DCT worst case)
    # must clear the lossy invariant at the registry's default quality
    from open_thoughts_ray.fixtures import images as fx

    tbl, _ = fx.generate_partition(seed=11, part_id=0, start=0, n_rows=8)
    for i in range(tbl.num_rows):
        w = tbl.column("w")[i].as_py()
        h = tbl.column("h")[i].as_py()
        px = codecs.decode(tbl.column("bytes")[i].as_py(), w, h,
                           tbl.column("fmt")[i].as_py())
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=codecs.JPG_QUALITY))
        assert codecs.psnr(px, out) >= 40.0


def test_quality_monotonic():
    px = _test_image()
    sizes, psnrs = [], []
    for q in (25, 60, 90):
        buf = jpeg.encode_jpeg(px, quality=q)
        out = jpeg.decode_jpeg(buf)
        sizes.append(len(buf))
        psnrs.append(codecs.psnr(px, out))
    assert sizes[0] < sizes[1] < sizes[2]
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_subsample_420_roundtrip_odd_dims():
    # non-multiple-of-8 AND odd dims exercise edge padding + MCU clamping
    for h, w in ((17, 23), (24, 24), (8, 40), (9, 9)):
        px = _test_image(h, w, seed=h * 100 + w)
        for sub in (False, True):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=98,
                                                    subsample=sub))
            assert out.shape == px.shape
            # 4:2:0 genuinely blurs sharp chroma edges (the red box) on
            # tiny images — real libjpeg behaves the same; the registry
            # default (4:4:4, JPG_QUALITY) is what the 40 dB gate covers
            floor = 26.0 if sub else 40.0
            assert codecs.psnr(px, out) >= floor


def test_markers_and_dimension_probe():
    px = _test_image(32, 48)
    buf = jpeg.encode_jpeg(px, quality=85)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert buf[2:4] == b"\xff\xe0" and buf[6:11] == b"JFIF\x00"
    assert jpeg.jpeg_dimensions(buf) == (32, 48)


def test_decode_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_decode_rejects_progressive_sof():
    px = _test_image(16, 16)
    buf = bytearray(jpeg.encode_jpeg(px))
    i = buf.index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg.decode_jpeg(bytes(buf))


def test_huffman_tables_are_canonical_prefix_codes():
    for bits, vals in ((jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
                       (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
                       (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
                       (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS)):
        assert sum(bits) == len(vals)
        codes = jpeg._canonical_codes(bits, vals)
        # prefix-free: no code is a prefix of another
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:
            for b in as_bits:
                if a != b:
                    assert not b.startswith(a)


def test_dc_prediction_across_blocks():
    # constant image: every DC diff after the first is 0 -> tiny file
    px = np.full((64, 64, 3), 130, dtype=np.uint8)
    buf = jpeg.encode_jpeg(px, quality=90)
    out = jpeg.decode_jpeg(buf)
    assert codecs.psnr(px, out) == float("inf") or codecs.psnr(px, out) > 50
    assert len(buf) < 1200  # entropy data nearly empty


def test_codecs_registry_jpg():
    px = _test_image(40, 56)
    buf = codecs.encode(px, "jpg")
    out = codecs.decode(buf, 56, 40, "jpg")
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0
    # metadata mismatch is an error, not silent garbage
    with pytest.raises(ValueError, match="metadata"):
        codecs.decode(buf, 13, 40, "jpg")
    assert "jpg" in codecs.FORMATS


def test_multimodal_stage_accepts_jpg():
    import pyarrow as pa

    from open_thoughts_ray.ops import multimodal as mm

    px = _test_image(48, 48)
    batch = pa.table({
        "image_id": ["a"],
        "bytes": pa.array([codecs.encode(px, "jpg")], pa.binary()),
        "w": pa.array([48], pa.int32()),
        "h": pa.array([48], pa.int32()),
        "fmt": ["jpg"],
    })
    out = mm.ImageResizer(target=32)(batch)
    assert out.num_rows == 1
    assert out.column("w").to_pylist() == [32]
    small = codecs.decode(out.column("bytes")[0].as_py(), 32, 32, "raw")
    # resized-from-jpg tracks resized-from-raw within JPEG error
    raw_batch = batch.set_column(1, "bytes",
                                 pa.array([codecs.encode(px, "raw")],
                                          pa.binary()))
    raw_batch = raw_batch.set_column(4, "fmt", pa.array(["raw"]))
    small_raw = codecs.decode(
        mm.ImageResizer(target=32)(raw_batch).column("bytes")[0].as_py(),
        32, 32, "raw")
    assert codecs.psnr(small, small_raw) >= 40.0
