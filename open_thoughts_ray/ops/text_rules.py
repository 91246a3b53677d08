"""Heuristic caption quality rules (ordered keep/drop with reason codes).

The graft analogue of the reference's heuristic filter sets:
``filter_problems`` (open_thoughts/math/filter.py:4-18 — keyword blocklist,
emptiness, structural rules) and the code filters
(open_thoughts/code/filters.py:6-49 — min length, URL/image blocklist).

Rules are evaluated IN A FIXED ORDER; the first failing rule becomes the
row's ``drop_reason`` (empty string = keep).  Order and thresholds live in
``RuleConfig`` so the Ray pipeline and the pure-Python oracle share one
spec but independent implementations.

Rule order:
    1. empty        — caption is empty / whitespace
    2. too_short    — len(caption) < min_chars
    3. too_long     — len(caption) > max_chars
    4. lang         — predicted language not in allowed set
    5. ppl          — n-gram LM perplexity > ppl_max
    6. repetition   — 1 - unique_tokens/tokens > rep_max
    7. symbol       — symbol_chars / word_tokens > sym_max
    8. stopword     — stopword_tokens / word_tokens < stop_min
    (near_dup is assigned later by the dedup stage)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fixtures.textgen import STOPWORDS, SYMBOLS

RULE_ORDER = (
    "empty",
    "too_short",
    "too_long",
    "lang",
    "ppl",
    "repetition",
    "symbol",
    "stopword",
)

_SYMBOL_SET = frozenset(SYMBOLS)
_STOPWORD_SET = frozenset(STOPWORDS)


@dataclass(frozen=True)
class RuleConfig:
    min_chars: int = 5
    max_chars: int = 512
    allowed_langs: tuple[str, ...] = ("en",)
    ppl_max: float = 1000.0
    rep_max: float = 0.3
    sym_max: float = 0.1
    stop_min: float = 0.05
    dup_hamming_max: int = 2
    # 2 bands × 32 bits over the 64-bit phash: guarantees detection for
    # Hamming ≤ 1 (planted near-dups hash within 0-1); wider-tolerance
    # pairs are still found when either 32-bit half agrees.  Halves the
    # dedup shuffle volume vs 4×16 and collapses band-value collisions.
    dup_bands: int = 2
    scrub_version: int = 1

    def to_dict(self) -> dict:
        from dataclasses import asdict

        return asdict(self)


# byte-level symbol lookup: every symbol is ASCII, so counting flagged
# bytes over the UTF-8 encoding equals the per-char membership test
# (multi-byte chars only produce bytes ≥ 0x80, never counted)
_SYM_BYTES = np.zeros(256, dtype=np.int64)
for _ch in _SYMBOL_SET:
    if ord(_ch) < 128:
        _SYM_BYTES[ord(_ch)] = 1
_EDGE_PUNCT = ".,!?;:\"'"


def caption_stats(texts: list[str]) -> dict[str, np.ndarray]:
    """Per-caption surface statistics.

    word tokens = whitespace tokens containing ≥1 alphabetic char,
    lowercased and stripped of edge punctuation — the same tokenization
    the LM uses, so 'symbols' never count as words.  Symbol counting is
    a 256-entry byte table over the UTF-8 bytes; token normalization is
    memoized per unique raw token across the batch (captions repeat
    vocabulary heavily — strip/alpha/stopword run once per distinct
    token, not once per occurrence).
    """
    n = len(texts)
    char_len = np.zeros(n, dtype=np.int32)
    n_words = np.zeros(n, dtype=np.int32)
    rep_ratio = np.zeros(n, dtype=np.float64)
    sym_ratio = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    is_empty = np.zeros(n, dtype=bool)
    # whole-batch symbol count: one concat + one table-lookup +
    # one reduceat instead of a per-row fancy-index-and-sum
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    nz = np.flatnonzero(lens)
    n_sym_all = np.zeros(n, dtype=np.int64)
    if nz.size:
        joined = np.frombuffer(b"".join(enc[i] for i in nz), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens[nz][:-1])])
        n_sym_all[nz] = np.add.reduceat(_SYM_BYTES[joined], starts,
                                        dtype=np.int64)
    tok_cache: dict[str, tuple] = {}
    for i, t in enumerate(texts):
        char_len[i] = len(t)
        if not t.strip():
            is_empty[i] = True
            continue
        n_sym = int(n_sym_all[i])
        words = []
        n_stop = 0
        for tok in t.lower().split():
            r = tok_cache.get(tok)
            if r is None:
                s = tok.strip(_EDGE_PUNCT)
                keep = bool(s) and any(c.isalpha() for c in s)
                r = (s if keep else None, s in _STOPWORD_SET)
                tok_cache[tok] = r
            if r[0] is not None:
                words.append(r[0])
                if r[1]:
                    n_stop += 1
        nw = len(words)
        n_words[i] = nw
        if nw:
            rep_ratio[i] = 1.0 - len(set(words)) / nw
            stop_ratio[i] = n_stop / nw
        sym_ratio[i] = n_sym / max(1, nw)
    return {
        "char_len": char_len,
        "n_words": n_words,
        "rep_ratio": rep_ratio,
        "sym_ratio": sym_ratio,
        "stop_ratio": stop_ratio,
        "is_empty": is_empty,
    }


def first_drop_reason(
    stats: dict[str, np.ndarray],
    lang: np.ndarray,
    ppl: np.ndarray,
    cfg: RuleConfig,
) -> np.ndarray:
    """Vectorized first-failing-rule selection → array of reason strings
    ('' = keep).  Must mirror oracle.reference_impl.oracle_row exactly."""
    allowed = np.isin(np.asarray(lang, dtype=object), list(cfg.allowed_langs))
    conds = [
        stats["is_empty"],
        stats["char_len"] < cfg.min_chars,
        stats["char_len"] > cfg.max_chars,
        ~allowed,
        np.asarray(ppl, dtype=np.float64) > cfg.ppl_max,
        stats["rep_ratio"] > cfg.rep_max,
        stats["sym_ratio"] > cfg.sym_max,
        stats["stop_ratio"] < cfg.stop_min,
    ]
    return np.select(conds, list(RULE_ORDER), default="").astype(object)
