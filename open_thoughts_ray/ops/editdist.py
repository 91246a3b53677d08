"""Exact edit-distance (Levenshtein) dedup via PassJoin partitioning.

The SQL-checkable member of the fuzzy/edit-distance family (the
companion to `dedup_text.ngram_jaccard_dedup` for `ops/fuzzy`): drop a
doc iff some NUMERICALLY-smaller-id doc is within ``max_dist``
Levenshtein edits — exactly DuckDB's
``NOT EXISTS (… WHERE e.id < g.id AND levenshtein(e,g) <= k)``, so the
survivor set hash-checks against a SQL oracle while the Ray plan stays
candidate-bucketed, never all-pairs.

Candidates come from PassJoin (Li, Deng, Wang, Feng — PVLDB 2011):
partition the shorter string of a true pair into ``k+1`` contiguous
segments; by pigeonhole at least one segment survives the ≤ k edits
UNCHANGED, and the edits before it can shift its position by at most k.
So the candidate shuffle emits, per doc,
* index rows — its own k+1 segments keyed by (len, seg_idx, content),
* probe rows — every substring that could BE such a segment of a
  same-or-shorter partner: lengths L in [len-k, len], each L's segment
  scheme, start positions within ±k of the segment's home position,
giving RECALL 1 with O(k³) short keys per doc (constant per doc — the
shuffle stays narrow at any N; this is PassJoin's published cost, far
below the q-gram lemma's hot-gram joins).  Strings shorter than 2k+1
fall back to one shared "short" bucket (exact, rare in real corpora).

Verification is an exact vectorized Levenshtein row DP (same
minimum.accumulate collapse as fuzzy.lcs_length) with early abandon at
row-min > k, run distributed over candidate pairs only
(`pairverify.verify_pairs_distributed`).

Reference semantics: open_thoughts/deduplicate.py:12-55 (all-pairs
fuzz.ratio pool) — re-expressed with an absolute edit-distance bound so
the survivors are SQL-verifiable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..common.hashing import splitmix64
from .dedup_text import _auto_partitions, _drop_ids_filter, _h64


def levenshtein_within(a: str, b: str, k: int) -> bool:
    """True iff Levenshtein(a, b) ≤ k.  Exact; numpy row DP with the
    insertion chain collapsed to minimum.accumulate, early abandon when
    a full row's minimum exceeds k."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if la == 0 or lb == 0:
        return max(la, lb) <= k
    if la < lb:
        a, b, la, lb = b, a, lb, la  # inner vector = the shorter string
    bc = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(lb + 1, dtype=np.int32)
    ar = np.arange(lb + 1, dtype=np.int32)
    t = np.empty(lb + 1, dtype=np.int32)
    for i, ch in enumerate(a, start=1):
        code = np.uint32(ord(ch))
        # t[j] = min(prev[j]+1 (delete), prev[j-1]+cost (sub/match))
        np.add(prev[:-1], bc != code, out=t[1:], casting="unsafe")
        np.minimum(t[1:], prev[1:] + 1, out=t[1:])
        t[0] = i
        # cur[j] = min_{l<=j}(t[l] + j - l): insertion chain
        np.subtract(t, ar, out=t)
        np.minimum.accumulate(t, out=t)
        np.add(t, ar, out=prev)
        if prev.min() > k:
            return False
    return int(prev[-1]) <= k


def _segments(length: int, k: int) -> list[tuple[int, int]]:
    """Even PassJoin partition of a length-``length`` string into k+1
    (start, seg_len) pieces — shorter segments first, longer last (the
    deterministic convention both the index and probe sides share)."""
    n = k + 1
    q, r = divmod(length, n)
    out = []
    pos = 0
    for i in range(n):
        ln = q + (1 if i >= n - r else 0)
        out.append((pos, ln))
        pos += ln
    return out


def _bkey(length: int, i: int, content_hash: int) -> int:
    """Bucket key combining the partner-length scheme, segment index and
    segment content into one int64 shuffle key."""
    mix = int(splitmix64(np.uint64((length * 131 + i) & 0xFFFFFFFFFFFFFFFF)))
    return int(np.uint64(content_hash) ^ np.uint64(mix)) - (1 << 63)


_SHORT_KEY = -(1 << 62) + 41  # shared bucket for strings shorter than 2k+1


def passjoin_rows(batch: pa.Table, *, k: int, id_col: str,
                  text_col: str) -> pa.Table:
    """doc → (bkey, id, side) candidate-shuffle rows.  side 0 = index
    (own segments), side 1 = probe (possible partner segments).  A true
    pair always collides in ≥ 1 bucket with opposite sides (shorter
    string indexed, longer string probing)."""
    ids = [str(v) for v in batch.column(id_col).to_pylist()]
    texts = batch.column(text_col).to_pylist()
    keys: list[int] = []
    out_ids: list[str] = []
    sides: list[int] = []
    cache: dict[str, int] = {}

    def h(s: str) -> int:
        v = cache.get(s)
        if v is None:
            v = _h64(s)
            cache[s] = v
        return v

    for doc_id, text in zip(ids, texts):
        L = len(text)
        # ---- index side: own segments under the own-length scheme
        if L < 2 * k + 1:
            keys.append(_SHORT_KEY)
            out_ids.append(doc_id)
            sides.append(0)
        if L >= k + 1:
            for i, (pos, ln) in enumerate(_segments(L, k)):
                keys.append(_bkey(L, i, h(text[pos:pos + ln])))
                out_ids.append(doc_id)
                sides.append(0)
        # ---- probe side: substrings matching segments of partners with
        # length Lp in [L-k, L] (the shorter string is always indexed)
        if L < 2 * k + 1:
            keys.append(_SHORT_KEY)
            out_ids.append(doc_id)
            sides.append(1)
        for lp in range(max(k + 1, L - k), L + 1):
            for i, (pos, ln) in enumerate(_segments(lp, k)):
                if ln == 0:
                    continue
                lo = max(0, pos - k)
                hi = min(L - ln, pos + k)
                for p in range(lo, hi + 1):
                    keys.append(_bkey(lp, i, h(text[p:p + ln])))
                    out_ids.append(doc_id)
                    sides.append(1)
    return pa.table({
        "bkey": pa.array(keys, pa.int64()),
        "id": pa.array(out_ids, pa.string()),
        "side": pa.array(sides, pa.int8()),
    })


def _canon_pair(x: str, y: str) -> tuple[str, str]:
    try:
        return (x, y) if int(x) < int(y) else (y, x)
    except ValueError:
        return (x, y) if x < y else (y, x)


def passjoin_partition_pairs(group: pd.DataFrame,
                             max_bucket: int = 4096) -> pa.Table:
    """Candidate pairs over one hash partition of (bkey, id, side) rows:
    per bucket, index×probe cross pairs (canonicalized, deduped within
    the partition).  ``max_bucket`` caps pathological buckets (identical
    -text floods) with a sorted neighbor chain — set high when exact
    oracle parity matters, same valve as gram_partition_pairs."""
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
    if len(group) < 2:
        return empty
    keys = group["bkey"].to_numpy(dtype=np.int64)
    ids = group["id"].astype(str).to_numpy(dtype=object)
    sides = group["side"].to_numpy(dtype=np.int8)
    order = np.lexsort((sides, ids, keys))
    keys, ids, sides = keys[order], ids[order], sides[order]
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    seen: set = set()
    a_out, b_out = [], []
    for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
        bi, bs = ids[s:s + c], sides[s:s + c]
        idx = np.unique(bi[bs == 0])
        prb = np.unique(bi[bs == 1])
        if len(idx) == 0 or len(prb) == 0:
            continue
        if len(idx) * len(prb) > max_bucket * max_bucket:
            # neighbor chain over the union (identical-flood valve)
            uni = np.unique(bi)
            for x, y in zip(uni[:-1], uni[1:]):
                p = _canon_pair(x, y)
                if p not in seen:
                    seen.add(p)
                    a_out.append(p[0])
                    b_out.append(p[1])
            continue
        for x in idx:
            for y in prb:
                if x == y:
                    continue
                p = _canon_pair(x, y)
                if p not in seen:
                    seen.add(p)
                    a_out.append(p[0])
                    b_out.append(p[1])
    if not a_out:
        return empty
    return pa.table({"a": pa.array(a_out, pa.string()),
                     "b": pa.array(b_out, pa.string())})


def passjoin_pairs(ds, id_col: str, text_col: str, k: int,
                   num_partitions: int = 32, max_bucket: int = 4096):
    """Recall-1 candidate pair Dataset for edit distance ≤ k."""
    rows = ds.select_columns([id_col, text_col]).map_batches(
        passjoin_rows, batch_format="pyarrow",
        fn_kwargs=dict(k=k, id_col=id_col, text_col=text_col),
    ).map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("bkey").to_numpy(zero_copy_only=False)
                             % num_partitions, pa.int64())),
        batch_format="pyarrow",
    )
    return rows.groupby("part", num_partitions=num_partitions).map_groups(
        passjoin_partition_pairs, batch_format="pandas",
        fn_kwargs={"max_bucket": max_bucket},
    )


def levenshtein_verify_kernel(k: int):
    def kernel(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
        return np.asarray(
            [levenshtein_within(a, b, k) for a, b in zip(texts_a, texts_b)],
            dtype=bool)

    return kernel


def levenshtein_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      max_dist: int = 5, num_partitions: int | None = None,
                      max_bucket: int = 4096,
                      max_driver_drops: int = 2_000_000):
    """Exact Levenshtein dedup, sequential first-seen semantics: drop
    doc b iff some doc a with numerically smaller id has
    Levenshtein(a, b) ≤ ``max_dist``.  PassJoin candidates (recall 1) →
    distributed exact verification → drop-id set (broadcast when small,
    anti-joined when large — the flagship's max_driver switch)."""
    from .pairverify import anti_join_ids, verify_pairs_distributed

    num_partitions = _auto_partitions(num_partitions)
    pairs = passjoin_pairs(ds, id_col, text_col, max_dist,
                           num_partitions, max_bucket).materialize()
    if pairs.count() == 0:
        return ds
    edges = verify_pairs_distributed(
        pairs, ds, id_col, text_col,
        levenshtein_verify_kernel(max_dist), num_partitions,
    )

    def losers(t: pa.Table) -> pa.Table:
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        return pa.table({
            "id": pa.array([_canon_pair(x, y)[1] for x, y in zip(a, b)],
                           pa.string())})

    drop_ds = edges.map_batches(losers, batch_format="pyarrow").materialize()
    n_drops = drop_ds.count()
    if n_drops == 0:
        return ds
    if n_drops <= max_driver_drops:
        drop = set(drop_ds.to_pandas()["id"])  # bounded: O(#dups)
        return _drop_ids_filter(ds, id_col, drop)
    return anti_join_ids(ds, id_col, drop_ds, num_partitions)
