"""Image–caption alignment scoring (CLIP-score analogue) + filter.

The reference's quality stack gates caption and image INDEPENDENTLY
(caption heuristics in commons.py, image embedding in
embedding_operator.py + FAISS filters); web-scale image–text curation
additionally needs the JOINT signal — "does this caption describe this
image" — the CLIP-score filter of LAION/DataComp (Schuhmann et al.
2021, Gadre et al. 2023).  This module gives that stage its Ray shape:

* plain-task ``map_batches`` stages with a per-worker model cache
  (fills every core, composes with other model stages — see
  ops/bcast.py; pass the class + ``concurrency`` for a GPU pool),
* both modalities embedded into ONE shared space,
* ``align_score`` = cosine(img_vec, txt_vec) appended per row,
* payload bytes decoded once inside the task and never re-emitted,
* ``mode="filter"`` drops rows below ``min_score`` with the input
  schema unchanged (payloads of dropped rows never re-enter the
  object store).

No CLIP in this sandbox, so the encoders are deterministic stand-ins
that honour the property a real two-tower model provides — a SHARED
token space:

* image tower: decode → coarse visual statistics (4×4 grid of mean
  luminance AND per-cell contrast, plus global brightness/contrast) →
  quantized observations rendered as opaque crc32 hex words → the SAME
  hashed-n-gram bag + seeded projection the text tower uses;
* text tower: ``models.fasttext_like`` hashed byte-n-grams → the same
  projection (the ``TextEmbedder`` kernel, ops/embed.py).

A caption that (partially) names the image's visual tokens lands near
the image vector; an unrelated caption does not.  Swap seam: replace
``_visual_tokens``/``_encode_tokens`` with real CLIP image/text encoder
calls on a GPU pool — every batch/actor/filter contract stays as-is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io import codecs
from ..models.fasttext_like import DEFAULT_DIM, _features_concat

ALIGN_DIM = 64
_GRID = 4
_LEVELS = 8


def _tok(kind: str, idx: int, level: int) -> str:
    """Opaque hex word for one (cell, quantized level) observation.
    Neighbouring levels must share (almost) NO byte n-grams — the text
    tower hashes 2/3-grams, and structured tokens like ``v3_5``/``v3_2``
    overlap on most grams, collapsing the score range.  crc32 of the
    triple gives unrelated 8-hex-char words instead."""
    import zlib

    return format(zlib.crc32(f"{kind}:{idx}:{level}".encode()), "08x")


def _visual_tokens(px: np.ndarray) -> str:
    """Deterministic visual-token string for one HxWx3 uint8 image.

    4×4 grid of mean-luminance AND per-cell-contrast levels (32 tokens)
    plus global brightness/contrast — each rendered as an opaque hashed
    word (see ``_tok``) so two images share a token iff they agree on
    that quantized observation."""
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(h) * _GRID // max(h, 1)).clip(0, _GRID - 1)
    xs = (np.arange(w) * _GRID // max(w, 1)).clip(0, _GRID - 1)
    cell = np.zeros((_GRID, _GRID), dtype=np.float64)
    cell2 = np.zeros((_GRID, _GRID), dtype=np.float64)
    cnt = np.zeros((_GRID, _GRID), dtype=np.float64)
    np.add.at(cell, (ys[:, None], xs[None, :]), gray)
    np.add.at(cell2, (ys[:, None], xs[None, :]), gray * gray)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    n = np.maximum(cnt, 1.0)
    mean = cell / n
    var = np.maximum(cell2 / n - mean * mean, 0.0)
    mlev = (mean * _LEVELS / 256.0).astype(np.int64).clip(0, _LEVELS - 1)
    slev = (np.sqrt(var) / 10.0).astype(np.int64).clip(0, _LEVELS - 1)
    toks = [_tok("m", i, int(mlev.flat[i])) for i in range(_GRID * _GRID)]
    toks += [_tok("s", i, int(slev.flat[i])) for i in range(_GRID * _GRID)]
    toks.append(_tok("b", -1, int(gray.mean() * _LEVELS / 256.0)))
    toks.append(_tok("c", -1, min(int(gray.std() / 12.0), 7)))
    return " ".join(toks)


class ImageTextAligner:
    """Callable stage: append ``align_score`` (cosine in the shared
    embedding space) per image+caption row; optionally filter.

    ``__init__`` builds the seeded projection once (the 'model load' —
    per actor in a pool layout, per worker via ``_worker_model`` in the
    default task layout); ``__call__`` is per batch."""

    def __init__(self, dim: int = ALIGN_DIM, seed: int = 1234,
                 caption_col: str = "caption", mode: str = "annotate",
                 min_score: float = 0.2, out: str = "align_score"):
        if mode not in ("annotate", "filter"):
            raise ValueError(f"mode must be annotate/filter, got {mode!r}")
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((DEFAULT_DIM, dim)).astype(np.float32)
        self.caption_col = caption_col
        self.mode = mode
        self.min_score = float(min_score)
        self.out = out

    def _encode_tokens(self, texts: list[str]) -> np.ndarray:
        grams, owner, counts = _features_concat(texts, DEFAULT_DIM)
        vec = np.zeros((len(texts), self.proj.shape[1]), dtype=np.float32)
        np.add.at(vec, owner, self.proj[grams])
        vec /= np.maximum(counts[:, None], 1).astype(np.float32)
        norm = np.linalg.norm(vec, axis=1, keepdims=True)
        return vec / np.maximum(norm, 1e-9)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        vis = [
            _visual_tokens(codecs.decode(buf, w, h, fmt))
            for buf, w, h, fmt in zip(bufs, ws, hs, fmts)
        ]
        img_vec = self._encode_tokens(vis)
        txt_vec = self._encode_tokens(
            [t or "" for t in batch.column(self.caption_col).to_pylist()])
        score = (img_vec * txt_vec).sum(axis=1).astype(np.float64)
        if self.mode == "filter":
            return batch.filter(pa.array(score >= self.min_score))
        return batch.append_column(self.out, pa.array(score, pa.float64()))


_MODELS: dict = {}


def _worker_model(dim: int, seed: int, caption_col: str, mode: str,
                  min_score: float) -> ImageTextAligner:
    """Per-worker-process aligner cache (the score-stage task layout:
    plain tasks fill every core with no pool-sizing knobs, and the 8 MB
    seeded projection is rebuilt once per worker, not per batch)."""
    key = (dim, seed, caption_col, mode, min_score)
    m = _MODELS.get(key)
    if m is None:
        m = ImageTextAligner(dim=dim, seed=seed, caption_col=caption_col,
                             mode=mode, min_score=min_score)
        _MODELS[key] = m
    return m


def align_score(ds, caption_col: str = "caption", dim: int = ALIGN_DIM,
                seed: int = 1234, batch_size: int = 256,
                out: str = "align_score"):
    """Append per-row image–caption ``align_score`` (annotate mode)."""

    def fn(batch: pa.Table) -> pa.Table:
        m = _worker_model(dim, seed, caption_col, "annotate", 0.0)
        scored = m(batch)
        if out != "align_score":
            i = scored.column_names.index("align_score")
            scored = scored.set_column(i, out, scored.column("align_score"))
        return scored

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def align_filter(ds, min_score: float, caption_col: str = "caption",
                 dim: int = ALIGN_DIM, seed: int = 1234,
                 batch_size: int = 256):
    """Drop rows whose image–caption alignment is below ``min_score``;
    schema unchanged, dropped payloads never re-enter the object
    store (decode-and-drop inside the task, the flagship pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        return _worker_model(dim, seed, caption_col, "filter",
                             float(min_score))(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def image_search(ds, queries: dict[int, str], k: int = 5,
                 id_col: str = "image_id", dim: int = ALIGN_DIM,
                 seed: int = 1234, batch_size: int = 256):
    """Cross-modal retrieval: text queries against an image corpus
    through the shared alignment space (the CLIP-retrieval shape).

    Per batch: decode → visual tokens → image-tower embedding, one
    (B×d)·(d×Q) matmul against the broadcast query matrix, local top-k
    partials; a final per-query reduce picks the global top-k (the
    ann_topk combine).  Returns Dataset[(query_id, image_id, cos,
    rank)], ties broken by (cos desc, id asc) — deterministic.  Swap
    the stand-in towers for CLIP and nothing else changes."""
    import pandas as pd
    import ray

    from .bcast import cached_get

    model = ImageTextAligner(dim=dim, seed=seed)
    qids = sorted(queries)
    q_mat = model._encode_tokens([queries[q] for q in qids])
    q_ref = ray.put((np.asarray(qids, np.int64), q_mat))

    def score(batch: pa.Table) -> pa.Table:
        qid_arr, qm = cached_get(q_ref)
        m = _worker_model(dim, seed, "caption", "annotate", 0.0)
        bufs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        vis = [
            _visual_tokens(codecs.decode(buf, w, h, fmt))
            for buf, w, h, fmt in zip(bufs, ws, hs, fmts)
        ]
        emb = m._encode_tokens(vis)
        sims = emb @ qm.T  # (B, Q)
        ids = batch.column(id_col).to_pylist()
        out_q, out_id, out_sim = [], [], []
        kk = min(k, sims.shape[0])
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) \
                else np.arange(len(s))
            for j in part:
                out_q.append(int(qid_arr[qi]))
                out_id.append(ids[j])
                out_sim.append(float(s[j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, batch.schema.field(id_col).type),
            "cos": pa.array(out_sim, pa.float64()),
        })

    cand = ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "cos", "rank"]]

    # Q groups (human-sized query set) → bounded dispatch
    return cand.groupby("query_id").map_groups(final_topk,
                                               batch_format="pandas")
