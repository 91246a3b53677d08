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


class ImageQualityGate:
    """Actor-pool stage: pixel-level image quality gate — the image-side
    complement of the caption heuristics (north-star quality_filter).

    Per image (luminance plane = channel mean, float64):
    * ``sharpness``  — variance of the 4-neighbour Laplacian
      (4·c − up − down − left − right over the interior); the classic
      variance-of-Laplacian blur detector.  < 3×3 images score 0.
    * ``contrast``   — RMS contrast (std of luminance).
    * ``clip_frac``  — fraction of channel samples at the sensor rails
      (≤2 or ≥253): over/under-exposure.

    ``mode="annotate"`` appends the three signals + ``img_keep``;
    ``mode="filter"`` drops failing rows and keeps the schema unchanged.
    All numpy-vectorized per image; payload bytes are read zero-copy and
    never duplicated into the output."""

    def __init__(self, min_sharpness: float = 10.0,
                 min_contrast: float = 8.0,
                 max_clip_frac: float = 0.30,
                 mode: str = "annotate"):
        if mode not in ("annotate", "filter"):
            raise ValueError(f"mode must be annotate/filter, got {mode!r}")
        self.min_sharpness = float(min_sharpness)
        self.min_contrast = float(min_contrast)
        self.max_clip_frac = float(max_clip_frac)
        self.mode = mode

    @staticmethod
    def signals(px: np.ndarray) -> tuple[float, float, float]:
        """(sharpness, contrast, clip_frac) for one HxWx3 uint8 image."""
        gray = px.astype(np.float64).mean(axis=2)
        if gray.shape[0] >= 3 and gray.shape[1] >= 3:
            lap = (4.0 * gray[1:-1, 1:-1] - gray[:-2, 1:-1] - gray[2:, 1:-1]
                   - gray[1:-1, :-2] - gray[1:-1, 2:])
            sharp = float(lap.var())
        else:
            sharp = 0.0
        contrast = float(gray.std())
        clip = float(((px <= 2) | (px >= 253)).mean())
        return sharp, contrast, clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(bufs)
        sharpness = np.empty(n, dtype=np.float64)
        contrast = np.empty(n, dtype=np.float64)
        clip_frac = np.empty(n, dtype=np.float64)
        for i, (buf, w, h, fmt) in enumerate(zip(bufs, ws, hs, fmts)):
            px = codecs.decode(buf, w, h, fmt)
            sharpness[i], contrast[i], clip_frac[i] = self.signals(px)
        keep = ((sharpness >= self.min_sharpness)
                & (contrast >= self.min_contrast)
                & (clip_frac <= self.max_clip_frac))
        if self.mode == "filter":
            return batch.filter(pa.array(keep))
        batch = batch.append_column("sharpness", pa.array(sharpness, pa.float64()))
        batch = batch.append_column("contrast", pa.array(contrast, pa.float64()))
        batch = batch.append_column("clip_frac", pa.array(clip_frac, pa.float64()))
        return batch.append_column("img_keep", pa.array(keep))


def geometry_gate_batch(batch: pa.Table, min_side: int = 16,
                        min_pixels: int = 0, max_aspect: float = 3.0,
                        mode: str = "annotate") -> pa.Table:
    """METADATA-ONLY image geometry gate (DataComp/LAION-style: drop
    tiny images and extreme aspect ratios) — vectorized over the w/h
    columns, payload bytes never touched.  Run this BEFORE any decode
    stage: at 10^12 images the decode cost of rows this rule rejects is
    pure waste, and a metadata filter pushes down to the scan.

    ``mode="filter"`` drops failing rows; ``"annotate"`` appends
    ``geom_keep``."""
    w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.float64)
    side_ok = (np.minimum(w, h) >= min_side)
    px_ok = (w * h >= min_pixels)
    aspect = np.maximum(w, h) / np.maximum(np.minimum(w, h), 1.0)
    asp_ok = aspect <= max_aspect
    keep = side_ok & px_ok & asp_ok
    if mode == "filter":
        return batch.filter(pa.array(keep))
    return batch.append_column("geom_keep", pa.array(keep))


def frame_sample_batch(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Superseded: real frame sampling over the uncompressed OTRV
    container lives in ``ops/video.frame_sample`` (random-access frame
    slicing, flat-map fan-out, scene cuts) — only compressed-codec
    decode still needs ffmpeg (swap seam documented there)."""
    raise NotImplementedError(
        "use ops/video.frame_sample — compressed codecs still need ffmpeg"
    )
