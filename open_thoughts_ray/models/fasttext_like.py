"""From-scratch hashed character-n-gram linear language classifier.

Architecturally a fastText-supervised-style model (linear classifier over a
hashed bag of character n-grams with a softmax head) — the sandbox has no
``fasttext`` wheel, so weights come from deterministic multinomial
Naive-Bayes counting (NB *is* a linear model in log space), trained on the
synthetic 4-language corpus at artifact-build time.

Plays the role of the reference's fastText operator
(open_thoughts_3/engine/operators/fasttext_operator.py:57-267): load once
per actor, score batches of 500+ texts, emit a label + confidence column.
Everything is float32 with a stable feature hash (zlib.crc32), so scores
are bit-identical across processes and machines.
"""

from __future__ import annotations

import io
import zlib

import numpy as np

DEFAULT_DIM = 1 << 15
_NGRAM_NS = (2, 3)


def _features(text: str, dim: int) -> np.ndarray:
    """Hashed char-n-gram feature indices (with multiplicity)."""
    s = f" {text.lower()} "
    b = s.encode("utf-8", "ignore")
    idx = []
    for n in _NGRAM_NS:
        step = 1
        for i in range(0, len(b) - n + 1, step):
            idx.append(zlib.crc32(b[i : i + n]) % dim)
    return np.asarray(idx, dtype=np.int64)


class HashedNgramClassifier:
    """Linear classifier: score(c) = b_c + Σ_i W[c, h(ngram_i)]."""

    def __init__(self, W: np.ndarray, b: np.ndarray, classes: list[str]):
        self.W = np.ascontiguousarray(W, dtype=np.float32)
        self.b = np.ascontiguousarray(b, dtype=np.float32)
        self.classes = list(classes)
        self.dim = self.W.shape[1]

    # ---------------------------------------------------------- training
    @classmethod
    def train(
        cls, texts: list[str], labels: list[str], dim: int = DEFAULT_DIM, alpha: float = 0.5
    ) -> "HashedNgramClassifier":
        classes = sorted(set(labels))
        cidx = {c: i for i, c in enumerate(classes)}
        counts = np.zeros((len(classes), dim), dtype=np.float64)
        prior = np.zeros(len(classes), dtype=np.float64)
        for text, lab in zip(texts, labels):
            ci = cidx[lab]
            prior[ci] += 1
            f = _features(text, dim)
            if f.size:
                np.add.at(counts[ci], f, 1.0)
        totals = counts.sum(axis=1, keepdims=True)
        W = np.log((counts + alpha) / (totals + alpha * dim)).astype(np.float32)
        b = np.log(prior / prior.sum()).astype(np.float32)
        return cls(W, b, classes)

    # --------------------------------------------------------- inference
    def predict_batch(self, texts: list[str]) -> tuple[list[str], np.ndarray]:
        """(labels, confidences) for a batch; vectorized scoring."""
        n = len(texts)
        feats = [_features(t, self.dim) for t in texts]
        lens = np.asarray([f.size for f in feats], dtype=np.int64)
        labels = [""] * n
        confs = np.zeros(n, dtype=np.float32)
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.size:
            all_idx = np.concatenate([feats[i] for i in nonempty])
            starts = np.zeros(nonempty.size, dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=starts[1:])
            scores = np.empty((nonempty.size, len(self.classes)), dtype=np.float32)
            for ci in range(len(self.classes)):
                vals = self.W[ci][all_idx]
                scores[:, ci] = np.add.reduceat(vals, starts) if all_idx.size else 0.0
            scores += self.b
            # length-normalize before softmax so confidence is comparable
            scores_n = scores / np.maximum(lens[nonempty, None], 1)
            m = scores_n.max(axis=1, keepdims=True)
            p = np.exp((scores_n - m) * 8.0)  # temperature to sharpen
            p /= p.sum(axis=1, keepdims=True)
            arg = scores.argmax(axis=1)
            for k, i in enumerate(nonempty):
                labels[i] = self.classes[arg[k]]
                confs[i] = p[k, arg[k]]
        for i in np.nonzero(lens == 0)[0]:
            labels[i] = "und"
            confs[i] = 0.0
        return labels, confs

    def predict_one(self, text: str) -> tuple[str, float]:
        labels, confs = self.predict_batch([text])
        return labels[0], float(confs[0])

    # ------------------------------------------------------- persistence
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(
            buf, W=self.W, b=self.b, classes=np.asarray(self.classes, dtype=object)
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HashedNgramClassifier":
        with np.load(io.BytesIO(data), allow_pickle=True) as z:
            return cls(z["W"], z["b"], [str(c) for c in z["classes"]])
