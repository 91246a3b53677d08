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
