import numpy as np
import pytest

from open_thoughts_ray.io import codecs


@pytest.fixture
def px():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(41, 67, 3)).astype(np.uint8)


def test_lossless_roundtrip(px):
    for fmt in ("raw", "pngz"):
        buf = codecs.encode(px, fmt)
        out = codecs.decode(buf, 67, 41, fmt)
        assert np.array_equal(out, px)


def test_qjpg_psnr(px):
    out = codecs.decode(codecs.encode(px, "qjpg"), 67, 41, "qjpg")
    assert codecs.psnr(px, out) >= 40.0


def test_qjpg_psnr_on_fixture_images():
    """Per-row decoded-pixel invariant (BASELINE.md: PSNR ≥ 40 dB lossy)."""
    from open_thoughts_ray.fixtures.images import _gen_pixels

    for i in range(25):
        rng = np.random.default_rng(1000 + i)
        px = _gen_pixels(rng)
        h, w = px.shape[:2]
        for fmt in ("raw", "pngz", "qjpg"):
            out = codecs.decode(codecs.encode(px, fmt), w, h, fmt)
            if fmt == "qjpg":
                assert codecs.psnr(px, out) >= 40.0
            else:
                assert np.array_equal(out, px)


def test_decode_rejects_wrong_dims(px):
    buf = codecs.encode(px, "raw")
    with pytest.raises(ValueError):
        codecs.decode(buf, 68, 41, "raw")


def test_phash_stability_under_noise():
    rng = np.random.default_rng(11)
    from open_thoughts_ray.fixtures.images import _gen_pixels

    for i in range(10):
        px = _gen_pixels(np.random.default_rng(i))
        noise = rng.integers(-2, 3, size=px.shape).astype(np.int16)
        px2 = np.clip(px.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        d = codecs.hamming64(codecs.average_phash(px), codecs.average_phash(px2))
        assert d <= 2


def test_phash_distinct_across_images():
    hashes = [
        codecs.average_phash(__import__(
            "open_thoughts_ray.fixtures.images", fromlist=["_gen_pixels"]
        )._gen_pixels(np.random.default_rng(i)))
        for i in range(50)
    ]
    # different procedural images should rarely collide
    assert len(set(hashes)) >= 45


def test_hamming_vectorized():
    a = np.array([0, 0xFF, 1 << 63], dtype=np.uint64)
    b = np.array([0, 0x00, 0], dtype=np.uint64)
    assert list(codecs.hamming64(a, b)) == [0, 8, 1]
