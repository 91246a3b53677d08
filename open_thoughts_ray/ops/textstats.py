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
    """Whitespace token count (single-space corpora: len(split)),
    vectorized via ``pc.split_pattern`` + ``list_value_length``."""
    from .tokvec import token_lengths

    n = token_lengths(batch.column(text_col), empty_as_token=False)
    return batch.append_column(out, pa.array(n, pa.int64()))


def _row_codes(col, empty_as_token: bool = False):
    """(codes:int64[Σn], rows:int64[Σn], n:int64[rows], vocab_size) —
    dictionary-encoded whitespace tokens with row indices, fully
    vectorized (ops/tokvec.py split + Arrow dictionary encode)."""
    import pyarrow.compute as pc

    from .tokvec import split_tokens

    flat, rows, n = split_tokens(col, empty_as_token=empty_as_token)
    if len(flat) == 0:
        return (np.empty(0, np.int64), rows, n, 0)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, rows, n, len(enc.dictionary)


def _distinct_per_row(codes: np.ndarray, rows: np.ndarray, v: int,
                      n_rows: int) -> np.ndarray:
    """Distinct token count per row via one packed-key unique."""
    out = np.zeros(n_rows, np.int64)
    if len(codes):
        ukey = np.unique(rows * v + codes)
        out = np.bincount(ukey // v, minlength=n_rows).astype(np.int64)
    return out


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / repetition / mean-word-length quality signals —
    vectorized (VERDICT r4 #5 family): one split pass + dictionary
    encode + packed-key unique, no per-row Python.

    Float ratios are quantized to 1e-6 by floor(x·1e6)/1e6 in float64 so
    the values are bit-identical to the DuckDB oracle SQL expression.
    """
    codes, rows, n_tok, v = _row_codes(batch.column(text_col))
    n_uniq = _distinct_per_row(codes, rows, max(v, 1), len(n_tok))
    rep = 1.0 - n_uniq / np.maximum(n_tok, 1)
    rep_q = np.floor(rep * 1_000_000.0) / 1_000_000.0
    batch = batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    batch = batch.append_column("n_unique", pa.array(n_uniq, pa.int64()))
    return batch.append_column("rep_ratio", pa.array(rep_q, pa.float64()))


def gopher_repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021,
    arXiv:2112.11446 §A1.1), word-granular:

    * ``dup_line_frac``     — fraction of lines that are duplicates of an
      earlier line (newline split).
    * ``top_bigram_frac``   — fraction of tokens covered by the single
      most frequent bigram (2·max_count / n_tokens).
    * ``dup_trigram_frac``  — fraction of trigram occurrences whose
      trigram appears more than once (Σ count>1 / total trigrams).

    Ratios are floor-quantized to 1e-6 (the quality_stats convention) so
    the DuckDB oracle reproduces them bit-for-bit.  Fully vectorized
    (VERDICT r4 #5 family): dictionary-coded tokens, within-row
    adjacency masks, two-step n-gram re-encoding (unique of packed
    pairs, then pairs×next-code) and grouped unique-with-counts — no
    per-document Python."""
    import pyarrow.compute as pc

    col = batch.column(text_col)
    codes, rows, n_tok, v = _row_codes(col)
    n = len(n_tok)
    top_big = np.zeros(n, dtype=np.float64)
    dup_tri = np.zeros(n, dtype=np.float64)
    dup_line = np.zeros(n, dtype=np.float64)

    if len(codes) >= 2:
        adj = rows[:-1] == rows[1:]
        bg_rows = rows[:-1][adj]
        if len(bg_rows):
            # re-encode bigrams to a dense id space so the (row, gram)
            # pack can never overflow int64
            bg_u, bg_code = np.unique(codes[:-1][adj] * v + codes[1:][adj],
                                      return_inverse=True)
            b = len(bg_u)
            uk, cnt = np.unique(bg_rows * b + bg_code, return_counts=True)
            maxc = np.zeros(n, np.int64)
            np.maximum.at(maxc, uk // b, cnt)
            has2 = n_tok >= 2
            top_big[has2] = 2.0 * maxc[has2] / n_tok[has2]

            # trigram = (bigram at i, code at i+2) where all three
            # positions share the row
            adj3 = adj[:-1] & (rows[1:-1] == rows[2:])
            if adj3.any():
                # bigram code aligned to position i (length Σn-1): the
                # inverse array bg_code only covers adj positions —
                # scatter it back
                bg_at = np.full(len(adj), -1, np.int64)
                bg_at[adj] = bg_code
                t_rows = rows[:-2][adj3]
                t_u, t_code = np.unique(
                    bg_at[:-1][adj3] * v + codes[2:][adj3],
                    return_inverse=True)
                tN = len(t_u)
                uk3, cnt3 = np.unique(t_rows * tN + t_code,
                                      return_counts=True)
                dup = np.zeros(n, np.int64)
                dmask = cnt3 > 1
                np.add.at(dup, uk3[dmask] // tN, cnt3[dmask])
                has3 = n_tok >= 3
                dup_tri[has3] = dup[has3] / (n_tok[has3] - 2)

    # duplicate-line fraction: newline split, same vectorized shape
    # (``t.split("\n") if t else []`` — empty/None docs have no lines)
    carr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    filled = pc.fill_null(carr, "")
    empty = pc.equal(filled, "").to_numpy(zero_copy_only=False)
    line_lists = pc.split_pattern(filled, "\n")
    raw_nl = pc.list_value_length(line_lists) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    lflat = pc.list_flatten(line_lists)
    lrows = np.repeat(np.arange(n, dtype=np.int64), raw_nl)
    if empty.any():
        keep = ~empty[lrows]
        lflat = lflat.filter(pa.array(keep))
        lrows = lrows[keep]
    nl = raw_nl.copy()
    nl[empty] = 0
    if len(lflat):
        lenc = pc.dictionary_encode(lflat)
        if isinstance(lenc, pa.ChunkedArray):
            lenc = lenc.combine_chunks()
        lcodes = lenc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lv = max(len(lenc.dictionary), 1)
        uniq_l = _distinct_per_row(lcodes, lrows, lv, n)
        hasl = nl > 0
        dup_line[hasl] = (nl[hasl] - uniq_l[hasl]) / nl[hasl]
    for name, vals in (("dup_line_frac", dup_line),
                       ("top_bigram_frac", top_big),
                       ("dup_trigram_frac", dup_tri)):
        q = np.floor(vals * 1_000_000.0) / 1_000_000.0
        batch = batch.append_column(name, pa.array(q, pa.float64()))
    return batch


def gopher_repetition_filter(ds, text_col: str = "text",
                             max_dup_line_frac: float = 0.30,
                             max_top_bigram_frac: float = 0.20,
                             max_dup_trigram_frac: float = 0.30):
    """Drop repetitive documents by the Gopher thresholds (the published
    rule set uses 0.30 / 0.18–0.20 / 0.30 for the analogous
    character-fraction rules).  Pure map_batches + filter — no shuffle."""
    import pyarrow.compute as pc

    def apply(t: pa.Table) -> pa.Table:
        t = gopher_repetition_batch(t, text_col)
        keep = pc.and_(
            pc.and_(
                pc.less_equal(t.column("dup_line_frac"), max_dup_line_frac),
                pc.less_equal(t.column("top_bigram_frac"), max_top_bigram_frac)),
            pc.less_equal(t.column("dup_trigram_frac"), max_dup_trigram_frac))
        return t.filter(keep).drop_columns(
            ["dup_line_frac", "top_bigram_frac", "dup_trigram_frac"])

    return ds.map_batches(apply, batch_format="pyarrow")


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


def corpus_profile(ds, text_col: str = "text") -> dict:
    """One-row dataset card: (n_docs, total_tokens, total_chars,
    distinct_tokens, token_entropy) — the audit summary written next to
    every published dataset.  One map_batches partial-sums pass for the
    scalar counts plus the token groupby the entropy/distinct metrics
    share; nothing row- or vocabulary-sized reaches the driver (entropy
    via the two-Sum identity, distinct via a grouped count)."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .consensus import _partial_token_counts

    def scalar_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .tokvec import token_lengths

        filled = pc.fill_null(t.column(text_col), "")
        toks = int(token_lengths(filled, empty_as_token=True).sum())
        chars = int(pc.sum(pc.utf8_length(filled)).as_py() or 0)
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_tokens": pa.array([toks], pa.int64()),
            "n_chars": pa.array([chars], pa.int64()),
        })

    s = ds.map_batches(scalar_partial, batch_format="pyarrow") \
        .sum(["n_docs", "n_tokens", "n_chars"])
    grouped = ds.map_batches(
        _partial_token_counts, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    ).groupby("token").aggregate(Sum("c", alias_name="n")).materialize()

    def ent_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "s1": pa.array([float((n * np.log(n)).sum())], pa.float64()),
            "t": pa.array([float(n.sum())], pa.float64()),
            "d": pa.array([len(n)], pa.int64()),
        })

    e = grouped.map_batches(ent_partial, batch_format="pyarrow") \
        .sum(["s1", "t", "d"])
    tot = float(e["sum(t)"])
    entropy = float(np.log(tot) - float(e["sum(s1)"]) / tot) if tot > 0 else 0.0
    return {
        "n_docs": int(s["sum(n_docs)"] or 0),
        "n_tokens": int(s["sum(n_tokens)"] or 0),
        "n_chars": int(s["sum(n_chars)"] or 0),
        "distinct_tokens": int(e["sum(d)"] or 0),
        "token_entropy": entropy,
    }


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            out: str = "zlib_ratio",
                            level: int = 6) -> pa.Table:
    """zlib-compressed bytes / raw bytes per document — the classic
    low-entropy detector (template spam and keyword stuffing compress
    far below prose; near-random strings sit near 1.0).  RefinedWeb-era
    pipelines gate on exactly this signal.  Empty docs → 1.0.  Pure
    map_batches; zlib level pinned so the score is deterministic across
    runs and machines."""
    import zlib as _z

    import numpy as np
    import pyarrow as pa_

    vals = []
    for t in batch.column(text_col).to_pylist():
        b = (t or "").encode("utf-8")
        if not b:
            vals.append(1.0)
            continue
        vals.append(len(_z.compress(b, level)) / len(b))
    return batch.append_column(out, pa_.array(np.asarray(vals, np.float64),
                                              pa_.float64()))


def compression_ratio_filter(ds, text_col: str = "text",
                             min_ratio: float = 0.25,
                             max_ratio: float = 1.1):
    """Drop documents whose zlib ratio falls outside [min, max] — below
    the floor means pathological repetition, above the ceiling means
    binary junk mislabelled as text."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        t = compression_ratio_batch(t, text_col)
        keep = pc.and_(pc.greater_equal(t.column("zlib_ratio"), min_ratio),
                       pc.less_equal(t.column("zlib_ratio"), max_ratio))
        return t.filter(keep).drop_columns(["zlib_ratio"])

    return ds.map_batches(f, batch_format="pyarrow")
