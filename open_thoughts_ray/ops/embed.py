"""Text embedding actor-pool stage + trainable classifier fit.

* ``TextEmbedder`` — the reference's SentenceTransformer embedding stage
  (engine/operators/embedding_operator.py:48-128;
  commons.py:652-741) with the identical Ray shape: callable class,
  model state built once per actor, chunk-and-mean-pool for long texts,
  L2-normalized ``list<float32>`` output.  The vectorizer is the repo's
  deterministic hashed-n-gram featurizer projected through a seeded
  random matrix (a stand-in for the transformer; swap ``_encode`` for a
  real model call on GPU pools).
* ``train_text_classifier`` — the reference's global-fit train_fasttext
  operator (engine/operators/train_fasttext_operator.py:52-256): merge
  the (small) labeled sides driver-side, fit, return model bytes ready
  for ``ray.put`` into scorer actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..models.fasttext_like import DEFAULT_DIM, HashedNgramClassifier, _features_concat

EMBED_DIM = 64


class TextEmbedder:
    def __init__(self, dim: int = EMBED_DIM, seed: int = 1234,
                 text_column: str = "text", out: str = "embedding",
                 chunk_tokens: int = 64):
        rng = np.random.default_rng(seed)
        # seeded projection built once per actor (the 'model load')
        self.proj = rng.standard_normal((DEFAULT_DIM, dim)).astype(np.float32)
        self.text_column = text_column
        self.out = out
        self.chunk_tokens = chunk_tokens

    def _encode(self, texts: list[str]) -> np.ndarray:
        # chunk long texts, encode each chunk, length-weighted mean-pool
        # (embedding_operator.py:48-103 semantics)
        chunks, owner, weights = [], [], []
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                chunks.append("")
                owner.append(i)
                weights.append(1.0)
                continue
            for s in range(0, len(toks), self.chunk_tokens):
                piece = toks[s : s + self.chunk_tokens]
                chunks.append(" ".join(piece))
                owner.append(i)
                weights.append(float(len(piece)))
        grams, gram_owner, counts = _features_concat(chunks, DEFAULT_DIM)
        bag = np.zeros((len(chunks), self.proj.shape[1]), dtype=np.float32)
        np.add.at(bag, gram_owner, self.proj[grams])
        bag /= np.maximum(counts[:, None], 1)
        out = np.zeros((len(texts), self.proj.shape[1]), dtype=np.float32)
        wsum = np.zeros(len(texts), dtype=np.float32)
        for c, (o, w) in enumerate(zip(owner, weights)):
            out[o] += bag[c] * w
            wsum[o] += w
        out /= np.maximum(wsum[:, None], 1e-9)
        norm = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norm, 1e-9)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self._encode(batch.column(self.text_column).to_pylist())
        return batch.append_column(
            self.out, pa.array([v.tolist() for v in emb], pa.list_(pa.float32()))
        )


def embed_dataset(ds, text_column: str = "text", dim: int = EMBED_DIM,
                  concurrency=(1, 8), batch_size: int = 1024):
    return ds.map_batches(
        TextEmbedder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"text_column": text_column, "dim": dim},
    )


def train_text_classifier(positive_ds, negative_ds, text_column: str = "text",
                          pos_label: str = "pos", neg_label: str = "neg",
                          max_rows_per_side: int = 100_000) -> bytes:
    """Global fit (train_fasttext analogue): labeled sides are SMALL
    curated sets, collected driver-side (bounded by max_rows_per_side via
    ``limit``), fit deterministically, returns serialized model bytes —
    ``ray.put`` them into a scorer pool for the big-data pass."""
    texts, labels = [], []
    for ds, lab in ((positive_ds, pos_label), (negative_ds, neg_label)):
        for b in ds.limit(max_rows_per_side).select_columns([text_column]).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            for t in b.column(text_column).to_pylist():
                texts.append(t or "")
                labels.append(lab)
    return HashedNgramClassifier.train(texts, labels).to_bytes()
