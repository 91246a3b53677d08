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

import numpy as np

DEFAULT_DIM = 1 << 15

_P1 = np.uint64(65599)
_MIX = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def _features_concat(texts: list[str], dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashed byte-2/3-gram indices for a whole batch, fully vectorized.

    Returns (grams, owner, counts): feature indices, the text index owning
    each feature, and per-text feature counts.  Each text is padded with
    one space on both sides; rolling polynomial hashes are computed over
    the concatenation of all padded texts at once, then n-grams that
    straddle a text boundary are masked out — identical feature BAGS to
    hashing each text separately, at numpy speed.
    """
    enc = [f" {t.lower()} ".encode("utf-8", "ignore") for t in texts]
    lens_b = np.asarray([len(e) for e in enc], dtype=np.int64)
    if len(enc) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    a = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    ends = np.cumsum(lens_b)
    starts = ends - lens_b
    n_feats = np.maximum(lens_b - 1, 0) + np.maximum(lens_b - 2, 0)
    total = len(a)
    with np.errstate(over="ignore"):
        h2 = (a[:-1] * _P1 + a[1:]) if total >= 2 else np.empty(0, np.uint64)
        h3 = (h2[:-1] * _P1 + a[2:]) if total >= 3 else np.empty(0, np.uint64)
        i2 = (((h2 * _MIX) & _MASK32) % np.uint64(dim)).astype(np.int64)
        i3 = (((h3 * _MIX) & _MASK32) % np.uint64(dim)).astype(np.int64)
    # valid gram start positions per text: [start, end - n]
    pos2_text = np.searchsorted(ends, np.arange(total - 1), side="right") if total >= 2 else None
    out_idx = []
    out_lens = np.zeros(len(enc), dtype=np.int64)
    if total >= 2:
        valid2 = np.arange(total - 1) <= (ends[pos2_text] - 2)
        keep2 = i2[valid2]
        owner2 = pos2_text[valid2]
    else:
        keep2 = np.empty(0, np.int64)
        owner2 = np.empty(0, np.int64)
    if total >= 3:
        pos3_text = pos2_text[: total - 2]
        valid3 = np.arange(total - 2) <= (ends[pos3_text] - 3)
        keep3 = i3[valid3]
        owner3 = pos3_text[valid3]
    else:
        keep3 = np.empty(0, np.int64)
        owner3 = np.empty(0, np.int64)
    owner = np.concatenate([owner2, owner3])
    grams = np.concatenate([keep2, keep3])
    counts = np.bincount(owner, minlength=len(enc)).astype(np.int64)
    return grams, owner, counts


def _features(text: str, dim: int) -> np.ndarray:
    """Hashed char-n-gram feature indices for one text (bag, unordered)."""
    idx, _owner, _counts = _features_concat([text], dim)
    return idx


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
        lab_idx = np.asarray([cidx[l] for l in labels], dtype=np.int64)
        for ci in range(len(classes)):
            sel = np.nonzero(lab_idx == ci)[0]
            prior[ci] = len(sel)
            f, _owner, _counts = _features_concat([texts[i] for i in sel], dim)
            if f.size:
                counts[ci] += np.bincount(f, minlength=dim).astype(np.float64)
        totals = counts.sum(axis=1, keepdims=True)
        W = np.log((counts + alpha) / (totals + alpha * dim)).astype(np.float32)
        b = np.log(prior / prior.sum()).astype(np.float32)
        return cls(W, b, classes)

    # --------------------------------------------------------- inference
    def predict_batch(self, texts: list[str]) -> tuple[list[str], np.ndarray]:
        """(labels, confidences) for a batch; vectorized scoring."""
        n = len(texts)
        grams, owner, lens = _features_concat(texts, self.dim)
        labels = [""] * n
        confs = np.zeros(n, dtype=np.float32)
        scores = np.zeros((n, len(self.classes)), dtype=np.float32)
        for ci in range(len(self.classes)):
            scores[:, ci] = np.bincount(
                owner, weights=self.W[ci][grams].astype(np.float64), minlength=n
            ).astype(np.float32)
        scores += self.b
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.size:
            sc = scores[nonempty]
            # length-normalize before softmax so confidence is comparable
            scores_n = sc / np.maximum(lens[nonempty, None], 1)
            m = scores_n.max(axis=1, keepdims=True)
            p = np.exp((scores_n - m) * 8.0)  # temperature to sharpen
            p /= p.sum(axis=1, keepdims=True)
            arg = sc.argmax(axis=1)
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
