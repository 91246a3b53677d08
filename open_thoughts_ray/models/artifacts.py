"""Deterministic model-artifact build + cache.

The langid classifier and the bigram LM are trained from scratch on seeded
synthetic corpora (FIXTURES.md F2).  Training is deterministic, so every
process that builds them gets byte-identical artifacts; a /tmp file cache
(atomic write-temp-rename, safe under concurrent builders) avoids
retraining.  At pipeline start the driver loads both artifacts once and
``ray.put``s them; each actor deserializes from the broadcast ref in
``__init__`` — replacing the reference's fcntl-locked node-local model
cache (open_thoughts_3/engine/operators/fasttext_operator.py:193-281).
"""

from __future__ import annotations

import json
import os
import tempfile

ARTIFACT_VERSION = 3
_CACHE_DIR = os.environ.get("OTR_ARTIFACT_DIR", f"/tmp/otr_artifacts_v{ARTIFACT_VERSION}")

_LANGID_N_PER_LANG = 3000
_LM_N_SENT = 12000

_mem_cache: dict[str, object] = {}


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def build_langid_bytes() -> bytes:
    from ..fixtures.textgen import langid_corpus
    from .fasttext_like import HashedNgramClassifier

    texts, labels = langid_corpus(n_per_lang=_LANGID_N_PER_LANG)
    return HashedNgramClassifier.train(texts, labels).to_bytes()


def build_lm_bytes() -> bytes:
    from ..fixtures.textgen import lm_corpus
    from .ngram_lm import BigramLM

    return BigramLM.train(lm_corpus(n=_LM_N_SENT)).to_bytes()


def get_artifact_bytes(name: str) -> bytes:
    """name ∈ {'langid', 'lm'} → serialized model bytes (cached)."""
    key = f"{name}.npz"
    if key in _mem_cache:
        return _mem_cache[key]  # type: ignore[return-value]
    path = os.path.join(_CACHE_DIR, key)
    if os.path.exists(path):
        with open(path, "rb") as f:
            data = f.read()
    else:
        data = build_langid_bytes() if name == "langid" else build_lm_bytes()
        _atomic_write(path, data)
    _mem_cache[key] = data
    return data


def build_langid_bin() -> bytes:
    """A *real-format* fastText ``.bin`` language-ID model.

    Word-level multinomial NB over the synthetic corpus, emitted in the
    official supervised layout (``models.fasttext_bin``): input row of
    word *w* = log P(w|class) across classes (dim = n_classes), the EOS
    row carries the log prior, output = identity — so fastText's own
    hidden-mean + softmax prediction IS the NB decision.  The file the
    C++ ``fasttext predict`` CLI would load; stands in for lid.176.bin
    (fasttext_operator.py:193-240) until a network seam provides the
    real weights.
    """
    from collections import Counter

    import numpy as np

    from ..fixtures.textgen import langid_corpus
    from .fasttext_bin import (ENTRY_LABEL, ENTRY_WORD, EOS, FastTextArgs,
                               FastTextModel, bin_bytes)

    from .fasttext_bin import _subword_ngrams

    MINN, MAXN, BUCKET = 2, 3, 1 << 16
    texts, labels = langid_corpus(n_per_lang=_LANGID_N_PER_LANG)
    classes = sorted(set(labels))
    cidx = {c: i for i, c in enumerate(classes)}
    # pass 1: word vocab (fastText never lowercases; match its tokenizer)
    vocab_counts: Counter = Counter()
    for t in texts:
        vocab_counts.update(t.split())
    words = [w for w, c in vocab_counts.most_common() if c >= 2 and w != EOS]
    word_id = {w: 1 + i for i, w in enumerate(words)}  # 0 = EOS
    nwords = 1 + len(words)
    # pass 2: per-class counts over the SAME feature ids fastText's
    # getLine produces — word id (in-vocab) + char-ngram bucket ids, so
    # its hidden-mean + identity-output softmax IS this NB's decision
    dim = len(classes)
    feat_counts = np.zeros((nwords + BUCKET, dim), dtype=np.float64)
    prior = np.zeros(dim, dtype=np.float64)
    memo: dict[str, list[int]] = {}
    ntokens = 0
    for t, l in zip(texts, labels):
        ci = cidx[l]
        prior[ci] += 1
        toks = t.split()
        ntokens += len(toks) + 1
        for w in toks:
            ids = memo.get(w)
            if ids is None:
                ids = _subword_ngrams(w, MINN, MAXN, BUCKET, nwords)
                wid = word_id.get(w)
                if wid is not None:
                    ids = [wid] + ids
                memo[w] = ids
            for fid in ids:
                feat_counts[fid, ci] += 1
    alpha = 0.5
    totals = feat_counts.sum(axis=0)
    nz = (feat_counts.sum(axis=1) > 0).sum()
    inp = np.log((feat_counts + alpha) / (totals + alpha * nz)).astype(np.float32)
    inp[0] = np.log(prior / prior.sum())  # EOS row = prior
    out = np.eye(dim, dtype=np.float32)
    all_words = [EOS] + words
    counts = np.asarray(
        [len(texts)] + [vocab_counts[w] for w in words]
        + [int(p) for p in prior], dtype=np.int64)
    types = np.asarray(
        [ENTRY_WORD] * len(all_words) + [ENTRY_LABEL] * dim, dtype=np.int8)
    model = FastTextModel(
        FastTextArgs(dim=dim, bucket=BUCKET, minn=MINN, maxn=MAXN,
                     word_ngrams=1),
        all_words + [f"__label__{c}" for c in classes],
        counts, types, ntokens, inp, out)
    return bin_bytes(model)


def langid_bin_path() -> str:
    """Path to the cached real-format ``.bin`` langid artifact."""
    key = "langid.bin"
    path = os.path.join(_CACHE_DIR, key)
    if not os.path.exists(path):
        _atomic_write(path, build_langid_bin())
    return path


def load_langid():
    from .fasttext_like import HashedNgramClassifier

    return HashedNgramClassifier.from_bytes(get_artifact_bytes("langid"))


def load_lm():
    from .ngram_lm import BigramLM

    return BigramLM.from_bytes(get_artifact_bytes("lm"))


def write_manifest(extra: dict | None = None) -> str:
    """Record artifact + rule provenance (FIXTURES.md determinism rules)."""
    import hashlib

    from ..ops.scrub import rules_json
    from ..ops.text_rules import RuleConfig

    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "langid_sha256": hashlib.sha256(get_artifact_bytes("langid")).hexdigest(),
        "lm_sha256": hashlib.sha256(get_artifact_bytes("lm")).hexdigest(),
        "rule_config": RuleConfig().to_dict(),
        "scrub_rules": rules_json(),
    }
    if extra:
        manifest.update(extra)
    path = os.path.join(_CACHE_DIR, "MANIFEST.json")
    _atomic_write(path, json.dumps(manifest, indent=2).encode())
    return path
