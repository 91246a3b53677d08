"""Multimodal column operators: decode / resize / feature-extract /
frame-sample over opaque ``binary`` payload columns.

The Ray-side plumbing (schemas, byte-aware batching, actor signatures,
output layout) is REAL and tested; the codec bodies use the repo's
deterministic pure-numpy codecs for images, and clearly-marked stubs for
formats this container cannot decode (no PIL/libjpeg/ffmpeg — swap the
stub body for the real library call in production).  SURVEY.md §7.0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io import codecs

REAL_FORMATS = set(codecs.FORMATS)


class ImageResizer:
    """Actor-pool stage: decode → area-mean resize → re-encode.

    Output schema mirrors the input with ``bytes/w/h`` replaced by the
    resized payload (always ``raw``-encoded) — the thumbnailing step of
    an image-curation pipeline.  Small ``batch_size`` required: batches
    are sized by payload bytes, not rows.
    """

    def __init__(self, target: int = 32):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_b, out_w, out_h = [], [], []
        for buf, w, h, fmt in zip(bufs, ws, hs, fmts):
            if fmt not in REAL_FORMATS:
                raise NotImplementedError(
                    f"codec {fmt!r} needs PIL/libjpeg — not in this container"
                )
            px = codecs.decode(buf, w, h, fmt)
            gray3 = np.stack(
                [codecs._block_mean_resize(px[:, :, c].astype(np.float64), self.target)
                 for c in range(3)],
                axis=2,
            )
            small = np.clip(gray3, 0, 255).astype(np.uint8)
            out_b.append(codecs.encode(small, "raw"))
            out_w.append(self.target)
            out_h.append(self.target)
        t = batch.drop_columns(["bytes", "w", "h", "fmt"])
        t = t.append_column("bytes", pa.array(out_b, pa.binary()))
        t = t.append_column("w", pa.array(out_w, pa.int32()))
        t = t.append_column("h", pa.array(out_h, pa.int32()))
        return t.append_column("fmt", pa.array(["raw"] * len(out_b), pa.string()))


class ImageFeatureExtractor:
    """Actor-pool stage: decode → fixed-length feature vector
    (list<float32>): channel means/stds + 8×8 luminance grid — a
    deterministic stand-in for a CNN/CLIP embedding with the identical
    Ray plumbing (broadcast model ref would arrive via fn_constructor_kwargs
    exactly like the langid model)."""

    DIM = 6 + 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        feats = []
        for buf, w, h, fmt in zip(bufs, ws, hs, fmts):
            px = codecs.decode(buf, w, h, fmt).astype(np.float32)
            gray = px.mean(axis=2)
            grid = codecs._block_mean_resize(gray.astype(np.float64), 8).ravel()
            v = np.concatenate(
                [px.mean(axis=(0, 1)) / 255.0, px.std(axis=(0, 1)) / 255.0,
                 grid / 255.0]
            ).astype(np.float32)
            feats.append(v.tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


def frame_sample_batch(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Superseded: real frame sampling over the uncompressed OTRV
    container lives in ``ops/video.frame_sample`` (random-access frame
    slicing, flat-map fan-out, scene cuts) — only compressed-codec
    decode still needs ffmpeg (swap seam documented there)."""
    raise NotImplementedError(
        "use ops/video.frame_sample — compressed codecs still need ffmpeg"
    )
