"""Vectorized whitespace tokenization kernels for the text partials.

VERDICT r4 #5: ``_term_freqs`` / ``token_df_table`` / the consensus
token partials were per-doc ``str.split`` + dict loops inside
``map_batches`` — correct and batch-level, but the hot loops at 100 TB
of text.  This module re-expresses them on Arrow kernels:
``pc.split_pattern`` (one C pass over the whole batch),
``pc.list_flatten`` + ``np.repeat`` row indices, and
``pc.value_counts`` / Arrow ``Table.group_by`` hash aggregation —
nothing per-row in Python.

Two empty-text conventions coexist in the engine and BOTH are
preserved exactly (they are visible in the SQL oracles):

* ``empty_as_token=True``  mirrors ``(t or "").split(" ")`` — a NULL
  or empty document contributes ONE empty-string token (DuckDB's
  ``string_split('', ' ') = ['']``).
* ``empty_as_token=False`` mirrors ``t.split(" ") if t else []`` — a
  NULL/empty document contributes ZERO tokens (the BM25/doc-length
  convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["split_tokens", "token_lengths", "partial_token_counts_table",
           "distinct_pair_df_table"]


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    if isinstance(col, (list, tuple)):
        return pa.array(col, pa.string())
    return col


def split_tokens(col, empty_as_token: bool = True):
    """→ ``(flat_tokens: pa.Array[string], row_idx: np.int64[Σn],
    n_tokens: np.int64[rows])`` for a string column, single-space
    split, fully vectorized."""
    col = _as_array(col)
    filled = pc.fill_null(col, "")
    lists = pc.split_pattern(filled, " ")
    n = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(lists)
    row_idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
    if not empty_as_token:
        empty = pc.equal(filled, "").to_numpy(zero_copy_only=False)
        if empty.any():
            keep = ~empty[row_idx]
            flat = flat.filter(pa.array(keep))
            row_idx = row_idx[keep]
            n = n.copy()
            n[empty] = 0
    return flat, row_idx, n


def token_lengths(col, empty_as_token: bool = False) -> np.ndarray:
    """Per-row whitespace token count without materializing the flat
    token array (``len(t.split(' ')) if t else 0`` by default)."""
    col = _as_array(col)
    filled = pc.fill_null(col, "")
    n = pc.list_value_length(pc.split_pattern(filled, " ")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if not empty_as_token:
        empty = pc.equal(filled, "").to_numpy(zero_copy_only=False)
        if empty.any():
            n = n.copy()
            n[empty] = 0
    return n


def partial_token_counts_table(col, *, token_name: str = "token",
                               count_name: str = "c") -> pa.Table:
    """Batch-partial ``(token, count)`` rows — the ``(t or
    '').split(' ')`` convention (empty docs count one '' token)."""
    flat, _, _ = split_tokens(col, empty_as_token=True)
    vc = pc.value_counts(flat)
    return pa.table({token_name: vc.field("values"),
                     count_name: vc.field("counts")})


def distinct_pair_df_table(col, *, term_name: str = "term",
                           count_name: str = "c") -> pa.Table:
    """Batch-partial document frequency: distinct (row, token) pairs →
    per-token row counts, all in Arrow's hash aggregator (the ``set(
    (t or '').split(' '))`` convention)."""
    flat, rows, _ = split_tokens(col, empty_as_token=True)
    if len(flat) == 0:
        return pa.table({term_name: pa.array([], pa.string()),
                         count_name: pa.array([], pa.int64())})
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    v = len(vocab)
    # distinct (row, token) pairs via one sort-based unique over the
    # packed 64-bit key, then a bincount of the token part — all C
    ukey = np.unique(rows * v + codes)
    cnt = np.bincount(ukey % v, minlength=v)
    return pa.table({term_name: vocab,
                     count_name: pa.array(cnt, pa.int64())})
