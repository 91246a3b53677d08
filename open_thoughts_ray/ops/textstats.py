"""Text-analysis operators over a documents table (token counting,
quality scoring, fingerprinting) — the SURVEY.md 'training-data pipeline'
extras, each vectorized inside ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..common.hashing import rolling_fingerprint, uint64_to_int64


def token_count_batch(batch: pa.Table, text_col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    """Whitespace token count (single-space corpora: len(split))."""
    texts = batch.column(text_col).to_pylist()
    n = np.asarray([len(t.split(" ")) if t else 0 for t in texts], dtype=np.int64)
    return batch.append_column(out, pa.array(n, pa.int64()))


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / repetition / mean-word-length quality signals.

    Float ratios are quantized to 1e-6 by floor(x·1e6)/1e6 in float64 so
    the values are bit-identical to the DuckDB oracle SQL expression.
    """
    texts = batch.column(text_col).to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_uniq = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else []
        n_tok[i] = len(toks)
        n_uniq[i] = len(set(toks))
    rep = 1.0 - n_uniq / np.maximum(n_tok, 1)
    rep_q = np.floor(rep * 1_000_000.0) / 1_000_000.0
    batch = batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    batch = batch.append_column("n_unique", pa.array(n_uniq, pa.int64()))
    return batch.append_column("rep_ratio", pa.array(rep_q, pa.float64()))


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                          out: str = "fp") -> pa.Table:
    """Content fingerprint, md5 hex (reference problem-id scheme,
    open_thoughts/code/standardize.py:65-66; SQL-checkable via DuckDB
    ``md5()``)."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(fps, pa.string()))


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                              out: str = "rfp") -> pa.Table:
    """Polynomial rolling-hash fingerprint (int64) — cheap non-crypto
    document identity for dedup partitioning."""
    texts = batch.column(text_col).to_pylist()
    fps = [uint64_to_int64(rolling_fingerprint(t)) for t in texts]
    return batch.append_column(out, pa.array(fps, pa.int64()))


# BPE-ish pre-tokenizer: word runs / digit runs / single non-alnum marks
# (the GPT-2 pretokenizer shape without lookaheads, so the same pattern
# runs in RE2/DuckDB for the SQL oracle)
_BPE_RE = None
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text",
                          out: str = "n_bpe_tokens") -> pa.Table:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex
    (compiled once per process)."""
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(_BPE_PATTERN)
    texts = batch.column(text_col).to_pylist()
    n = np.asarray([len(_BPE_RE.findall(t)) if t else 0 for t in texts],
                   dtype=np.int64)
    return batch.append_column(out, pa.array(n, pa.int64()))
