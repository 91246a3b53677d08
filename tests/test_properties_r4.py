"""Hypothesis property tests for the late-round-4 kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from open_thoughts_ray.ops.align import ImageTextAligner, _visual_tokens
from open_thoughts_ray.ops.minhash_index import _pad, _unpad


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_visual_tokens_shape_and_determinism(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    t1 = _visual_tokens(px)
    assert t1 == _visual_tokens(px)
    toks = t1.split()
    # 16 mean-level + 16 contrast-level + brightness + contrast tokens
    assert len(toks) == 34
    assert all(len(t) == 8 for t in toks)  # 8-hex-char opaque words


@given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_self_alignment_is_always_top(w, h, seed):
    """An image's own visual-token caption scores ≈ 1 regardless of
    image content — the shared-token-space invariant."""
    import pyarrow as pa

    from open_thoughts_ray.io import codecs

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    tbl = pa.table({
        "image_id": pa.array(["x"], pa.string()),
        "bytes": pa.array([codecs.encode(px, "raw")], pa.binary()),
        "w": pa.array([w], pa.int32()),
        "h": pa.array([h], pa.int32()),
        "fmt": pa.array(["raw"], pa.string()),
        "caption": pa.array([_visual_tokens(px)], pa.string()),
    })
    out = ImageTextAligner()(tbl)
    assert out.column("align_score")[0].as_py() > 0.999


@given(st.lists(st.integers(0, 10**15), min_size=2, max_size=30,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_pad_preserves_integer_order(ids):
    """Zero-padded keys sort lexicographically in numeric order, and
    unpad is the exact inverse."""
    padded = [_pad(str(v), True) for v in ids]
    assert [int(_unpad(p, True)) for p in padded] == ids
    assert sorted(padded) == [_pad(str(v), True) for v in sorted(ids)]


@given(st.lists(st.text(alphabet="abc0", min_size=1, max_size=6),
                min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_pad_noop_for_string_ids(ids):
    assert [_pad(v, False) for v in ids] == ids
    assert [_unpad(v, False) for v in ids] == ids
