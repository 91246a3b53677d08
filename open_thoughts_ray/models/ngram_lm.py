"""From-scratch interpolated word-bigram language model (KenLM-style).

The perplexity scorer of the quality-filter pipeline.  Jelinek–Mercer
interpolation over bigram / unigram / uniform-unknown:

    P(w | p) = λ2·c(p,w)/c(p) + λ1·c(w)/N + λ0·1/(V+1)

Perplexity = exp(−mean ln P) over the tokens of a caption.  Deterministic:
counts are exact integers, scoring is float64 with a fixed evaluation
order, so the actor-pool scorer and the single-process oracle agree
bit-for-bit.

Fills the role KenLM plays in web-curation quality filters; the reference
analogue is the fastText quality scorer used as a keep/drop signal
(open_thoughts_3/engine/operators/fasttext_operator.py:145-154).
"""

from __future__ import annotations

import io
import math

import numpy as np

LAMBDA2, LAMBDA1, LAMBDA0 = 0.70, 0.25, 0.05


def tokenize(text: str) -> list[str]:
    """Whitespace tokens, lowercased, stripped of edge punctuation."""
    out = []
    for t in text.lower().split():
        t = t.strip(".,!?;:\"'")
        if t:
            out.append(t)
    return out


class BigramLM:
    def __init__(
        self,
        vocab: dict[str, int],
        uni: np.ndarray,
        bi: dict[int, float],
        total: int,
    ):
        self.vocab = vocab
        self.uni = np.asarray(uni, dtype=np.float64)
        self.bi = bi  # key = prev_id * V + word_id → count
        self.total = total
        self.V = len(vocab)
        self.p_unk = LAMBDA0 / (self.V + 1)

    @classmethod
    def train(cls, sentences: list[str]) -> "BigramLM":
        vocab: dict[str, int] = {}
        uni_counts: dict[int, int] = {}
        bi_counts: dict[tuple[int, int], int] = {}
        for s in sentences:
            toks = tokenize(s)
            prev = -1
            for t in toks:
                wid = vocab.setdefault(t, len(vocab))
                uni_counts[wid] = uni_counts.get(wid, 0) + 1
                if prev >= 0:
                    bi_counts[(prev, wid)] = bi_counts.get((prev, wid), 0) + 1
                prev = wid
        V = len(vocab)
        uni = np.zeros(V, dtype=np.float64)
        for wid, c in uni_counts.items():
            uni[wid] = c
        bi = {p * V + w: float(c) for (p, w), c in bi_counts.items()}
        return cls(vocab, uni, bi, int(uni.sum()))

    def logprob(self, prev_id: int, word_id: int) -> float:
        p = self.p_unk
        if word_id >= 0:
            p += LAMBDA1 * self.uni[word_id] / self.total
            if prev_id >= 0:
                c_prev = self.uni[prev_id]
                if c_prev > 0:
                    c_bi = self.bi.get(prev_id * self.V + word_id, 0.0)
                    if c_bi:
                        p += LAMBDA2 * c_bi / c_prev
        return math.log(p)

    def perplexity(self, text: str) -> float:
        """Scalar path DELEGATES to the batch kernel so the single-process
        oracle and the pipeline score with one implementation —
        bit-identical by construction."""
        return float(self.perplexity_batch([text])[0])

    def _bi_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Sorted bigram (key, count) arrays for vectorized searchsorted
        lookup; built once per model instance."""
        if not hasattr(self, "_bik"):
            k = np.fromiter(self.bi.keys(), dtype=np.int64, count=len(self.bi))
            v = np.fromiter(self.bi.values(), dtype=np.float64,
                            count=len(self.bi))
            o = np.argsort(k)
            self._bik, self._biv = k[o], v[o]
        return self._bik, self._biv

    def perplexity_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized over the whole batch: one flat token array, dict→id
        lookups in a single pass, unigram/bigram probability terms as
        masked numpy ops in the SAME accumulation order as the scalar
        formula, per-text log-likelihoods via np.bincount (sequential
        in-order accumulation, matching a per-token loop)."""
        tok_lists = [tokenize(t) for t in texts]
        lens = np.asarray([len(t) for t in tok_lists], dtype=np.int64)
        n_texts = len(texts)
        out = np.full(n_texts, float(np.exp(-np.log(self.p_unk))),
                      dtype=np.float64)
        total_toks = int(lens.sum())
        if total_toks == 0:
            return out.astype(np.float32)
        get = self.vocab.get
        wid = np.fromiter(
            (get(t, -1) for lst in tok_lists for t in lst),
            dtype=np.int64, count=total_toks,
        )
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        owner = np.repeat(np.arange(n_texts), lens)
        prev = np.empty_like(wid)
        prev[1:] = wid[:-1]
        prev[starts[lens > 0]] = -1  # no cross-text context
        p = np.full(total_toks, self.p_unk, dtype=np.float64)
        known = wid >= 0
        p[known] += LAMBDA1 * self.uni[wid[known]] / self.total
        both = known & (prev >= 0)
        if both.any():
            idx_prev = prev[both]
            c_prev = self.uni[idx_prev]
            keys = idx_prev * self.V + wid[both]
            bik, biv = self._bi_arrays()
            add = np.zeros(len(keys), dtype=np.float64)
            if len(bik):
                pos = np.clip(np.searchsorted(bik, keys), 0, len(bik) - 1)
                hit = (bik[pos] == keys) & (c_prev > 0)
                add[hit] = LAMBDA2 * biv[pos[hit]] / c_prev[hit]
            p[both] += add
        ll = np.bincount(owner, weights=np.log(p), minlength=n_texts)
        nz = lens > 0
        out[nz] = np.exp(-ll[nz] / lens[nz])
        return out.astype(np.float32)

    # ------------------------------------------------------- persistence
    def to_bytes(self) -> bytes:
        words = sorted(self.vocab, key=self.vocab.get)
        keys = np.fromiter(self.bi.keys(), dtype=np.int64, count=len(self.bi))
        vals = np.fromiter(self.bi.values(), dtype=np.float64, count=len(self.bi))
        # canonical serialization: bigrams sorted by key, so a serial fit
        # and the distributed rebuild (train_bigram_lm_distributed, whose
        # dict insertion order is shuffle-dependent) emit IDENTICAL bytes
        o = np.argsort(keys, kind="stable")
        keys, vals = keys[o], vals[o]
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            words=np.asarray(words, dtype=object),
            uni=self.uni,
            bi_keys=keys,
            bi_vals=vals,
            total=np.asarray([self.total], dtype=np.int64),
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BigramLM":
        with np.load(io.BytesIO(data), allow_pickle=True) as z:
            words = [str(w) for w in z["words"]]
            vocab = {w: i for i, w in enumerate(words)}
            bi = dict(zip(z["bi_keys"].tolist(), z["bi_vals"].tolist()))
            return cls(vocab, z["uni"], bi, int(z["total"][0]))
