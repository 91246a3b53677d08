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


_EMBEDDERS: dict = {}


def embed_dataset(ds, text_column: str = "text", dim: int = EMBED_DIM,
                  concurrency=None, batch_size: int = 1024,
                  vec_path: str | None = None):
    """Default layout: plain tasks + per-worker embedder cache (the
    8 MB seeded projection is rebuilt once per worker process) — fills
    every core with no pool sizing, and composes with other model
    stages (two chained FIXED pools over-reserve a small cluster and
    deadlock the streaming executor).  Pass ``concurrency`` explicitly
    to pin an actor pool (e.g. a GPU stage swapping in a real model).

    ``vec_path`` swaps the hashed stand-in for REAL pretrained word
    vectors (word2vec ``.vec`` / GloVe text file —
    models/word_vectors.py); the file is parsed once per actor/worker,
    never per batch."""
    if vec_path is not None:
        from ..models.word_vectors import WordVecEmbedder

        if concurrency is not None:
            return ds.map_batches(
                WordVecEmbedder, batch_format="pyarrow",
                batch_size=batch_size, concurrency=concurrency, num_cpus=1,
                fn_constructor_kwargs={"vec_path": vec_path,
                                       "text_column": text_column})

        def wv_fn(batch: pa.Table) -> pa.Table:
            key = ("wv", vec_path, text_column)
            m = _EMBEDDERS.get(key)
            if m is None:
                m = WordVecEmbedder(vec_path, text_column=text_column)
                _EMBEDDERS[key] = m
            return m(batch)

        return ds.map_batches(wv_fn, batch_format="pyarrow",
                              batch_size=batch_size)
    if concurrency is not None:
        return ds.map_batches(
            TextEmbedder, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1,
            fn_constructor_kwargs={"text_column": text_column, "dim": dim},
        )

    def fn(batch: pa.Table) -> pa.Table:
        key = (text_column, dim)
        m = _EMBEDDERS.get(key)
        if m is None:
            m = TextEmbedder(text_column=text_column, dim=dim)
            _EMBEDDERS[key] = m
        return m(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


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


def train_text_classifier_distributed(ds, text_column: str = "text",
                                      label_column: str = "label",
                                      dim: int = DEFAULT_DIM,
                                      alpha: float = 0.5,
                                      num_partitions: int | None = None) -> bytes:
    """``train_fasttext`` at 100-TB scale: no driver text collect.

    The model is count-based (W = log-smoothed per-class feature counts,
    b = log class priors — HashedNgramClassifier.train), and counts are
    MERGEABLE SUMS, so the fit distributes exactly:

    1. one ``map_batches`` pass emits each batch's per-class feature
       counts SPARSE — (label, feat, cnt) rows pre-combined inside the
       batch, plus a (label, -1, n_rows) prior row;
    2. one ``groupby(label, feat).sum`` shuffle merges them globally —
       shuffle payload is O(batches × distinct-feats-per-batch), never
       row- or corpus-sized;
    3. the driver scatters the ≤ C·dim summed rows into the (C, dim)
       count matrix and applies the identical smoothing/log/float32
       pipeline as the serial fit.

    Integer count addition is associative, so the returned bytes are
    BIT-IDENTICAL to ``HashedNgramClassifier.train`` on the same rows
    (asserted in tests/test_similarity_embed.py).  Driver state is
    O(C·dim) — the model itself."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_column).to_pylist()
        labels = t.column(label_column).to_pylist()
        lab_arr = np.asarray(labels, dtype=object)
        out_lab, out_idx, out_cnt = [], [], []
        for lab in sorted(set(labels)):
            sel = np.nonzero(lab_arr == lab)[0]
            f, _owner, _counts = _features_concat(
                [texts[i] or "" for i in sel], dim)
            if f.size:
                idx, cnt = np.unique(f, return_counts=True)
                out_lab.extend([lab] * (len(idx) + 1))
                out_idx.extend([int(v) for v in idx] + [-1])
                out_cnt.extend([int(v) for v in cnt] + [len(sel)])
            else:
                out_lab.append(lab)
                out_idx.append(-1)
                out_cnt.append(len(sel))
        return pa.table({"label": pa.array(out_lab, pa.string()),
                         "feat": pa.array(out_idx, pa.int64()),
                         "cnt": pa.array(out_cnt, pa.int64())})

    agg = (ds.select_columns([text_column, label_column])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "feat"]).sum("cnt")
           .to_pandas())  # ≤ C·dim + C rows: the model's own size
    classes = sorted(agg["label"].unique())
    cidx = {c: i for i, c in enumerate(classes)}
    counts = np.zeros((len(classes), dim), dtype=np.float64)
    prior = np.zeros(len(classes), dtype=np.float64)
    for lab, feat, cnt in zip(agg["label"], agg["feat"], agg["sum(cnt)"]):
        if feat < 0:
            prior[cidx[lab]] += cnt
        else:
            counts[cidx[lab], feat] += cnt
    totals = counts.sum(axis=1, keepdims=True)
    W = np.log((counts + alpha) / (totals + alpha * dim)).astype(np.float32)
    b = np.log(prior / prior.sum()).astype(np.float32)
    return HashedNgramClassifier(W, b, classes).to_bytes()
