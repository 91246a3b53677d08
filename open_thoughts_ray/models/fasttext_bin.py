"""Reader / writer / predictor for the official fastText ``.bin`` format.

Closes the "real pretrained models" gap for the language-ID stage: the
reference loads ``lid.176.bin`` through fastText's C++ library
(open_thoughts_3/engine/operators/fasttext_operator.py:193-281, with an
fcntl-locked node-local download cache).  The sandbox has no ``fasttext``
wheel and no network, so this module implements the *file format and
inference math itself* from the public fastText sources
(facebookresearch/fastText: src/fasttext.cc saveModel/loadModel,
src/dictionary.cc hash/computeSubwords/addWordNgrams/getLine,
src/loss.cc SoftmaxLoss/OneVsAllLoss/HierarchicalSoftmaxLoss):

* binary layout: magic ``0x2F49AB3A`` (793712314) + version 12, Args
  block, Dictionary block (null-terminated words + int64 count + int8
  type), quant flag, dense input matrix, qout flag, dense output matrix;
* tokenization: whitespace split + trailing ``</s>`` EOS token;
* feature ids: vocab word id, UTF-8-aware character-n-gram buckets
  (``minn..maxn`` over ``<word>``), and supervised word-n-gram buckets
  (``h = h*116049371 + h_j`` over the *sign-extended* FNV-1a word
  hashes) — all hashed with fastText's FNV-1a variant (int8
  sign-extension before the xor);
* prediction: hidden = mean of input rows; softmax / one-vs-all /
  negative-sampling sigmoid / hierarchical-softmax (Huffman tree rebuilt
  from the saved label counts, exactly fastText's ``buildTree``).

A genuine ``lid.176.bin`` therefore loads and predicts here with no
third-party code; tests exercise the format via :func:`write_bin`
round-trips and a real word-level NB language-ID model emitted *in* the
official format (:mod:`..models.artifacts` ``build_langid_bin``).
Quantized ``.ftz`` models (product-quantizer codebooks) are the one
documented NotImplementedError seam.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass, field

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

EOS = "</s>"
BOW = "<"
EOW = ">"

# enum values from src/args.h
LOSS_HS, LOSS_NS, LOSS_SOFTMAX, LOSS_OVA = 1, 2, 3, 4
MODEL_CBOW, MODEL_SG, MODEL_SUP = 1, 2, 3

ENTRY_WORD, ENTRY_LABEL = 0, 1

_WS = b" \n\t\v\f\r\x00"


def ft_hash(s: str | bytes) -> int:
    """fastText's FNV-1a-32 with int8 sign-extension (dictionary.cc:163)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 2166136261
    for b in s:
        if b >= 128:
            b |= 0xFFFFFF00  # uint32_t(int8_t(ch)) sign extension
        h = (h ^ b) * 16777619 & 0xFFFFFFFF
    return h


def _subword_ngrams(word: str, minn: int, maxn: int, bucket: int, nwords: int) -> list[int]:
    """Character-n-gram bucket ids of ``<word>`` (dictionary.cc computeSubwords).

    Iterates UTF-8 *character* boundaries (continuation bytes 0b10xxxxxx are
    glued to their lead byte) and excludes the 1-char BOW/EOW singletons.
    """
    w = (BOW + word + EOW).encode("utf-8")
    size = len(w)
    out: list[int] = []
    for i in range(size):
        if (w[i] & 0xC0) == 0x80:
            continue
        j, n = i, 1
        ngram = bytearray()
        while j < size and n <= maxn:
            ngram.append(w[j])
            j += 1
            while j < size and (w[j] & 0xC0) == 0x80:
                ngram.append(w[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                out.append(nwords + ft_hash(bytes(ngram)) % bucket)
            n += 1
    return out


def _sign32(h: int) -> int:
    """uint32 -> the value C++ gets from widening int32_t(h) to uint64_t."""
    return (h | 0xFFFFFFFF00000000) if h & 0x80000000 else h


def _word_ngram_ids(word_hashes: list[int], n: int, bucket: int, nwords: int) -> list[int]:
    """Supervised word-n-gram bucket ids (dictionary.cc addWordNgrams).

    ``hashes`` are stored as int32_t in fastText and sign-extend when
    widened to uint64 — replicated bit-for-bit here.
    """
    out: list[int] = []
    m = (1 << 64) - 1
    for i in range(len(word_hashes)):
        h = _sign32(word_hashes[i])
        for j in range(i + 1, min(len(word_hashes), i + n)):
            h = (h * 116049371 + _sign32(word_hashes[j])) & m
            out.append(nwords + h % bucket)
    return out


@dataclass
class FastTextArgs:
    dim: int = 100
    ws: int = 5
    epoch: int = 5
    min_count: int = 1
    neg: int = 5
    word_ngrams: int = 1
    loss: int = LOSS_SOFTMAX
    model: int = MODEL_SUP
    bucket: int = 2_000_000
    minn: int = 0
    maxn: int = 0
    lr_update_rate: int = 100
    t: float = 1e-4


@dataclass
class FastTextModel:
    """A loaded (non-quantized) fastText model + supervised inference."""

    args: FastTextArgs
    words: list[str]
    counts: np.ndarray  # int64 per entry
    types: np.ndarray  # int8 per entry (0=word, 1=label)
    ntokens: int
    input: np.ndarray  # float32 [nwords + bucket, dim]
    output: np.ndarray  # float32 [nlabels, dim]
    _word2id: dict[str, int] = field(default_factory=dict, repr=False)
    _hs_tree: list | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        if not self._word2id:
            self._word2id = {w: i for i, w in enumerate(self.words)}

    # ------------------------------------------------------------- dict
    @property
    def nwords(self) -> int:
        return int((self.types == ENTRY_WORD).sum())

    @property
    def nlabels(self) -> int:
        return int((self.types == ENTRY_LABEL).sum())

    @property
    def labels(self) -> list[str]:
        nw = self.nwords
        return self.words[nw:]

    # -------------------------------------------------------- tokenize
    def _line_ids(self, text: str) -> list[int]:
        """Input-row ids for one text (dictionary.cc getLine, supervised)."""
        nw = self.nwords
        a = self.args
        raw = text.encode("utf-8")
        toks_b = [t for t in raw.split() if t]  # bytes.split() splits on exactly fastText's ws set minus \x00
        ids: list[int] = []
        word_hashes: list[int] = []
        for tb in toks_b + [EOS.encode()]:
            tok = tb.decode("utf-8", "replace")
            h = ft_hash(tb)
            wid = self._word2id.get(tok, -1)
            is_label = (self.types[wid] == ENTRY_LABEL) if wid >= 0 else tok.startswith("__label__")
            if is_label:
                continue
            # addSubwords (dictionary.cc:323)
            if wid < 0:
                if tok != EOS:
                    ids.extend(_subword_ngrams(tok, a.minn, a.maxn, a.bucket, nw))
            elif a.maxn <= 0:
                ids.append(wid)
            else:
                ids.append(wid)
                if tok != EOS:
                    ids.extend(_subword_ngrams(tok, a.minn, a.maxn, a.bucket, nw))
            word_hashes.append(h)
        if a.word_ngrams > 1:
            ids.extend(_word_ngram_ids(word_hashes, a.word_ngrams, a.bucket, nw))
        return ids

    # ------------------------------------------------------- inference
    def _hidden(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        hid = np.zeros((n, self.args.dim), dtype=np.float32)
        nids = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            ids = self._line_ids(t)
            if ids:
                hid[i] = self.input[np.asarray(ids, dtype=np.int64)].mean(axis=0)
                nids[i] = len(ids)
        return hid, nids

    def predict_batch(self, texts: list[str], k: int = 1) -> tuple[list[list[str]], np.ndarray]:
        """Top-k (labels, probabilities) per text; empty texts get none."""
        hid, nids = self._hidden(texts)
        labels = self.labels
        loss = self.args.loss
        probs = np.zeros((len(texts), min(k, len(labels))), dtype=np.float32)
        out_labels: list[list[str]] = []
        if loss in (LOSS_SOFTMAX, LOSS_NS, LOSS_OVA):
            scores = hid @ self.output.T.astype(np.float32)
            if loss == LOSS_SOFTMAX:
                m = scores.max(axis=1, keepdims=True)
                p = np.exp(scores - m)
                p /= p.sum(axis=1, keepdims=True)
            else:  # binary-logistic heads (loss.cc BinaryLogisticLoss::predict)
                p = 1.0 / (1.0 + np.exp(-scores))
            top = np.argsort(-p, axis=1, kind="stable")[:, : probs.shape[1]]
            for i in range(len(texts)):
                if nids[i] == 0:
                    out_labels.append([])
                    continue
                out_labels.append([labels[j] for j in top[i]])
                probs[i] = p[i, top[i]]
        elif loss == LOSS_HS:
            tree = self._tree()
            for i in range(len(texts)):
                if nids[i] == 0:
                    out_labels.append([])
                    continue
                pairs = self._hs_predict(hid[i], tree, probs.shape[1])
                out_labels.append([labels[j] for _, j in pairs])
                probs[i, : len(pairs)] = [math.exp(lp) for lp, _ in pairs]
        else:  # pragma: no cover - unknown loss enum
            raise NotImplementedError(f"loss enum {loss}")
        return out_labels, probs

    def predict_one(self, text: str) -> tuple[str, float]:
        lab, p = self.predict_batch([text], k=1)
        if not lab[0]:
            return "", 0.0
        return lab[0][0], float(p[0][0])

    # -------------------------------------------- hierarchical softmax
    def _tree(self) -> list:
        """Huffman tree over label counts (loss.cc buildTree), cached."""
        if self._hs_tree is not None:
            return self._hs_tree
        counts = self.counts[self.nwords :].astype(np.int64)
        osz = len(counts)
        # node = [parent, left, right, count, binary]
        tree = [[-1, -1, -1, int(1e15), False] for _ in range(2 * osz - 1)]
        for i in range(osz):
            tree[i][3] = int(counts[i])
        leaf, node = osz - 1, osz
        for i in range(osz, 2 * osz - 1):
            mini = [0, 0]
            for j in range(2):
                if leaf >= 0 and tree[leaf][3] < tree[node][3]:
                    mini[j] = leaf
                    leaf -= 1
                else:
                    mini[j] = node
                    node += 1
            tree[i][1], tree[i][2] = mini[0], mini[1]
            tree[i][3] = tree[mini[0]][3] + tree[mini[1]][3]
            tree[mini[0]][0] = i
            tree[mini[1]][0] = i
            tree[mini[1]][4] = True
        self._hs_tree = tree
        return tree

    def _hs_predict(self, hidden: np.ndarray, tree: list, k: int) -> list[tuple[float, int]]:
        """DFS over the Huffman tree (loss.cc HierarchicalSoftmaxLoss::dfs)."""
        osz = self.nlabels
        heap: list[tuple[float, int]] = []
        threshold = -1e30

        def dfs(node: int, score: float) -> None:
            nonlocal threshold
            if score < threshold:
                return
            if tree[node][1] == -1 and tree[node][2] == -1:
                heap.append((score, node))
                heap.sort(key=lambda x: -x[0])
                del heap[k:]
                if len(heap) == k:
                    threshold = heap[-1][0]
                return
            f = 1.0 / (1.0 + math.exp(-float(self.output[node - osz] @ hidden)))
            dfs(tree[node][1], score + math.log(max(1.0 - f, 1e-12)))
            dfs(tree[node][2], score + math.log(max(f, 1e-12)))

        dfs(2 * osz - 2, 0.0)
        return heap


# ---------------------------------------------------------------- I/O


def load_bin(path: str) -> FastTextModel:
    """Parse an official fastText ``.bin`` (fasttext.cc loadModel)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"{path}: not a fastText model (magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"{path}: unsupported fastText version {version}")
        (dim, ws, epoch, min_count, neg, word_ngrams, loss, model, bucket,
         minn, maxn, lr_update_rate) = struct.unpack("<12i", f.read(48))
        (t,) = struct.unpack("<d", f.read(8))
        args = FastTextArgs(dim, ws, epoch, min_count, neg, word_ngrams,
                            loss, model, bucket, minn, maxn, lr_update_rate, t)
        size, nwords, nlabels = struct.unpack("<3i", f.read(12))
        ntokens, pruneidx_size = struct.unpack("<qq", f.read(16))
        words: list[str] = []
        counts = np.empty(size, dtype=np.int64)
        types = np.empty(size, dtype=np.int8)
        buf = f.read()  # rest of file; dictionary entries then matrices
        off = 0
        for i in range(size):
            end = buf.index(b"\x00", off)
            words.append(buf[off:end].decode("utf-8"))
            off = end + 1
            counts[i], types[i] = struct.unpack_from("<qb", buf, off)
            off += 9
        if pruneidx_size > 0:
            off += 8 * pruneidx_size  # pairs of int32 (pruned-vocab remap)
        (quant,) = struct.unpack_from("<?", buf, off)
        off += 1
        if quant:
            raise NotImplementedError(
                "quantized .ftz models (product-quantizer codebooks) are the "
                "documented swap seam — use the non-quantized .bin")
        m, n = struct.unpack_from("<qq", buf, off)
        off += 16
        inp = np.frombuffer(buf, dtype="<f4", count=m * n, offset=off).reshape(m, n).copy()
        off += 4 * m * n
        (qout,) = struct.unpack_from("<?", buf, off)
        off += 1
        if qout:
            raise NotImplementedError("quantized output matrix unsupported")
        m2, n2 = struct.unpack_from("<qq", buf, off)
        off += 16
        out = np.frombuffer(buf, dtype="<f4", count=m2 * n2, offset=off).reshape(m2, n2).copy()
    if nwords + nlabels != size:
        raise ValueError(f"{path}: dict size {size} != {nwords}+{nlabels}")
    return FastTextModel(args, words, counts, types, ntokens, inp, out)


def write_bin(path: str, model: FastTextModel) -> None:
    """Emit ``model`` in the official on-disk layout (fasttext.cc saveModel).

    Primarily the test/round-trip seam — but the output is a real
    ``.bin`` the C++ ``fasttext predict`` CLI would load.
    """
    with open(path, "wb") as f:
        _write_bin_fp(f, model)


def bin_bytes(model: FastTextModel) -> bytes:
    import io

    buf = io.BytesIO()
    _write_bin_fp(buf, model)
    return buf.getvalue()


def _write_bin_fp(f, model: FastTextModel) -> None:
    a = model.args
    f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
    f.write(struct.pack("<12i", a.dim, a.ws, a.epoch, a.min_count, a.neg,
                        a.word_ngrams, a.loss, a.model, a.bucket, a.minn,
                        a.maxn, a.lr_update_rate))
    f.write(struct.pack("<d", a.t))
    f.write(struct.pack("<3i", len(model.words), model.nwords, model.nlabels))
    f.write(struct.pack("<qq", model.ntokens, -1))
    for i, w in enumerate(model.words):
        f.write(w.encode("utf-8") + b"\x00")
        f.write(struct.pack("<qb", int(model.counts[i]), int(model.types[i])))
    f.write(struct.pack("<?", False))
    f.write(struct.pack("<qq", *model.input.shape))
    f.write(np.ascontiguousarray(model.input, dtype="<f4").tobytes())
    f.write(struct.pack("<?", False))
    f.write(struct.pack("<qq", *model.output.shape))
    f.write(np.ascontiguousarray(model.output, dtype="<f4").tobytes())


# ------------------------------------------------------- node cache


def cached_model_file(source: str, cache_dir: str = "/tmp/otr_model_cache",
                      timeout_s: float = 30.0) -> str:
    """Node-local model cache with an fcntl download lock.

    Mirrors the reference's semantics
    (fasttext_operator.py:193-281): the cache key is md5(source); the
    first process to take ``model.lock`` copies the file and writes a
    SUCCESS marker; concurrent processes block on the marker.  Transport
    here is local-file copy — hf-hub / gcs transports are the documented
    network swap seam.
    """
    import fcntl
    import hashlib
    import shutil
    import time

    key = hashlib.md5(source.encode()).hexdigest()
    model_dir = os.path.join(cache_dir, key)
    model_file = os.path.join(model_dir, "model.bin")
    success = os.path.join(model_dir, "SUCCESS")
    if os.path.exists(success):
        return model_file
    os.makedirs(model_dir, exist_ok=True)
    lock_path = os.path.join(model_dir, "model.lock")
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            holds_lock = True
        except OSError:
            holds_lock = False
        if holds_lock:
            if not os.path.exists(success):
                tmp = model_file + ".tmp"
                shutil.copyfile(source, tmp)
                os.replace(tmp, model_file)
                with open(success, "w") as sf:
                    sf.write("Success.")
            return model_file
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if os.path.exists(success):
                return model_file
            time.sleep(0.05)
        raise TimeoutError(f"model cache never became ready: {model_dir}")
    finally:
        if holds_lock:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def load_bin_cached(source: str, cache_dir: str = "/tmp/otr_model_cache") -> FastTextModel:
    return load_bin(cached_model_file(source, cache_dir))
