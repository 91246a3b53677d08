"""Text near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

The reference's fuzzy dedup is an O(U²) all-pairs RapidFuzz scan on a
multiprocessing pool (open_thoughts/deduplicate.py:12-55).  Rebuilt here
as shuffle-based LSH families, all deterministic (stable crc32 token
hashes, fixed hash-family seeds, canonical winner = min id):

* MinHash+LSH  — word-shingle minhash signatures, banded; candidates
  verified by signature agreement (estimated Jaccard); union-find.
* SimHash      — 64-bit sign-of-sum token fingerprint; banded Hamming
  collapse reusing the phash machinery (ops.dedup).
* n-gram Jaccard — exact verification kernel for candidate pairs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import union_find_canonical

_MERS61 = (1 << 61) - 1


def _keep_ids_filter(ds, id_col: str, keep: set):
    """Keep only rows whose id is in ``keep`` — candidate-pruning filter
    (small sets in task closures; large via _drop_ids_filter pattern)."""
    import ray

    if len(keep) <= 100_000:
        def f(batch: pa.Table) -> pa.Table:
            vals = [str(v) for v in batch.column(id_col).to_pylist()]
            mask = np.asarray([v in keep for v in vals], dtype=bool)
            return batch.filter(pa.array(mask))

        return ds.map_batches(f, batch_format="pyarrow")
    keep_ref = ray.put(keep)

    class F:
        def __init__(self):
            self.keep = ray.get(keep_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = [str(v) for v in batch.column(id_col).to_pylist()]
            mask = np.asarray([v in self.keep for v in vals], dtype=bool)
            return batch.filter(pa.array(mask))

    return ds.map_batches(F, batch_format="pyarrow", concurrency=(1, 8),
                          num_cpus=0.5)


def _drop_ids_filter(ds, id_col: str, drop: set):
    """Filter out rows whose id is in ``drop``.  Small sets ride in the
    task closure (plain tasks — no actor-pool launch latency, ~1 s saved
    per query); large sets are broadcast once via ray.put and read by an
    actor pool."""
    import ray

    if not drop:
        return ds
    if len(drop) <= 100_000:
        def f(batch: pa.Table) -> pa.Table:
            vals = [str(v) for v in batch.column(id_col).to_pylist()]
            mask = np.asarray([v not in drop for v in vals], dtype=bool)
            return batch.filter(pa.array(mask))

        return ds.map_batches(f, batch_format="pyarrow")
    drop_ref = ray.put(drop)

    class F:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = [str(v) for v in batch.column(id_col).to_pylist()]
            mask = np.asarray([v not in self.drop for v in vals], dtype=bool)
            return batch.filter(pa.array(mask))

    return ds.map_batches(F, batch_format="pyarrow", concurrency=(1, 8),
                          num_cpus=0.5)


def _hash_family(k: int, seed: int = 97) -> tuple[np.ndarray, np.ndarray]:
    """k pairs (a, b) for h(x) = (a·x + b) mod 2^61−1.  ``a`` is drawn
    from [1, 2^31) so that a·x fits in uint64 for 32-bit crc inputs
    (a < 2^31, x < 2^32 → a·x < 2^63) — no silent wrap before the modulo
    (ADVICE r1: a up to 2^61 overflowed mod 2^64 first, so the computed
    family was not the stated universal family)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERS61, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


# 28-bit multipliers: token_hash(32-bit) × C < 2^60, sum of three < 2^62
# — no uint64 wrap before the 2^61−1 modulo
_GRAM_C = (np.uint64(268435399), np.uint64(268435367), np.uint64(268435361))


def _gram_hashes_batch(texts: list[str], n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """32-bit word-n-gram hashes for every doc, vectorized.

    Tokens are crc32-hashed ONCE per unique string (batch vocab dict);
    gram hashes are a rolling positional combination of token hashes
    computed in one numpy pass over the batch-wide concatenation, with
    doc-boundary-crossing positions masked out.  Returns (flat gram
    array, doc offsets for np.minimum.reduceat); docs with no grams get
    one sentinel gram so offsets stay monotone."""
    vocab: dict = {}
    tok_arrays = []
    for t in texts:
        toks = t.split()
        if len(toks) < n:  # short doc: single gram = crc32 of joined text
            tok_arrays.append(
                np.array([zlib.crc32(" ".join(toks).encode("utf-8"))],
                         dtype=np.uint64) if toks else
                np.array([0], dtype=np.uint64))
            continue
        hs = np.empty(len(toks), dtype=np.uint64)
        for i, tk in enumerate(toks):
            h = vocab.get(tk)
            if h is None:
                h = zlib.crc32(tk.encode("utf-8"))
                vocab[tk] = h
            hs[i] = h
        tok_arrays.append(hs)
    lens = np.asarray([len(a) for a in tok_arrays], dtype=np.int64)
    short = lens < n  # already a single pre-hashed gram
    gram_counts = np.where(short, 1, lens - n + 1)
    concat = np.concatenate(tok_arrays)
    # rolling combine over the concatenation (positions crossing a doc
    # boundary are cut away below)
    total = len(concat)
    if total >= n:
        rolled = concat[: total - n + 1] * _GRAM_C[0]
        for j in range(1, n):
            rolled = rolled + concat[j : total - n + 1 + j] * _GRAM_C[j % len(_GRAM_C)]
        rolled = (rolled % np.uint64(_MERS61)) & np.uint64(0xFFFFFFFF)
    else:
        rolled = np.empty(0, dtype=np.uint64)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out_parts = []
    for d in range(len(texts)):
        if short[d]:
            out_parts.append(tok_arrays[d][:1])
        else:
            s = doc_starts[d]
            out_parts.append(rolled[s : s + gram_counts[d]])
    flat = np.concatenate(out_parts)
    offsets = np.concatenate([[0], np.cumsum(gram_counts)[:-1]]).astype(np.int64)
    return flat, offsets


def minhash_signature(text: str, k: int = 64, shingle_n: int = 3,
                      family=None) -> np.ndarray:
    """Single-doc signature (reference semantics / tests); the batch path
    is minhash_signatures_batch."""
    sig = minhash_signatures_batch([text], k, shingle_n, family)
    return sig[0]


def minhash_signatures_batch(texts: list[str], k: int = 64, shingle_n: int = 3,
                             family=None) -> np.ndarray:
    """(n_docs, k) minhash signatures, vectorized across the whole batch:
    all docs' gram hashes are computed in one rolling pass
    (_gram_hashes_batch), ONE (k × total_grams) affine transform runs
    over the concatenation, and per-doc minima are taken with
    np.minimum.reduceat at the doc offsets — no per-doc Python/numpy
    dispatch (the _features_concat trick from models/fasttext_like.py
    applied to minhash)."""
    a, b = family if family is not None else _hash_family(k)
    if not texts:
        return np.zeros((0, len(a)), dtype=np.uint64)
    x, offsets = _gram_hashes_batch(texts, shingle_n)
    # (k, total) affine mod 2^61-1; inputs sized so nothing wraps.
    # Mersenne reduction (y & M) + (y >> 61) with one conditional
    # subtract replaces the uint64 `%` — numpy integer division has no
    # SIMD path and dominated this kernel (~10× slower).
    M = np.uint64(_MERS61)
    vals = np.multiply(x[None, :], a[:, None])  # < 2^63
    vals += b[:, None]
    high = vals >> np.uint64(61)
    vals &= M
    vals += high
    np.subtract(vals, M, out=vals, where=vals >= M)
    mins = np.minimum.reduceat(vals, offsets, axis=1)  # (k, n_docs)
    out = mins.T.copy()
    # truly empty docs → all-zero signature (stable sentinel)
    empty = np.asarray([not t.split() for t in texts], dtype=bool)
    out[empty] = 0
    return out


def minhash_band_rows(batch: pa.Table, *, k: int, bands: int, shingle_n: int,
                      id_col: str, text_col: str) -> pa.Table:
    """doc → `bands` rows of (band_key, id) for the LSH shuffle.

    Only the 8-byte band key and the id enter the shuffle — NOT the
    k×8-byte signature (which r1 shipped on every band row, a ~16×
    payload amplification).  Candidates are re-verified from a pruned
    re-read after the buckets are found."""
    fam = _hash_family(k)
    r = k // bands
    ids = batch.column(id_col)
    sigs = minhash_signatures_batch(batch.column(text_col).to_pylist(),
                                    k, shingle_n, fam)
    n = len(sigs)
    keys = np.empty(n * bands, dtype=np.int64)
    sig_bytes = sigs.tobytes()  # row-major: doc i band b at (i*k + b*r)*8
    for i in range(n):
        base = i * k * 8
        for b in range(bands):
            h = zlib.crc32(sig_bytes[base + b * r * 8 : base + (b + 1) * r * 8])
            keys[b * n + i] = (b << 32) | h
    out_ids = pa.concat_arrays(
        [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * bands
    )
    return pa.table({"band_key": pa.array(keys, pa.int64()), "id": out_ids})


def minhash_partition_pairs(group: pd.DataFrame, max_bucket: int = 256,
                            window: int = 16) -> pa.Table:
    """Candidate pairs over a whole hash partition of (band_key, id) rows
    (partition-level bucket detection, same shape as dedup.partition_pairs).

    Oversized buckets fall back to a sorted-by-id neighbor window instead
    of silently truncating members (ADVICE r1).  Pairs are emitted
    UNVERIFIED — verification happens against recomputed signatures on
    the pruned candidate re-read."""
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    n = len(group)
    if n < 2:
        return empty
    keys = group["band_key"].to_numpy(dtype=np.int64)
    ids = group["id"].astype(str).to_numpy(dtype=object)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    a_out, b_out = [], []
    for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
        bi = ids[s : s + c]
        m = int(c)
        if m <= max_bucket:
            for i in range(m - 1):
                for j in range(i + 1, m):
                    a_out.append(bi[i])
                    b_out.append(bi[j])
        else:
            for i in range(m - 1):
                for j in range(i + 1, min(m, i + 1 + window)):
                    a_out.append(bi[i])
                    b_out.append(bi[j])
    if not a_out:
        return empty
    return pa.table({"a": pa.array(a_out, pa.string()),
                     "b": pa.array(b_out, pa.string())})


def minhash_lsh_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 64, bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7, max_bucket: int = 256,
                      num_partitions: int = 32, source_fetch=None):
    """Near-dup collapse; survivors = min id per component.

    shingle→minhash→band→shuffle→candidates→verify→union-find (SURVEY.md
    dedup family).  The shuffle carries only (band_key, id); candidate
    pairs (O(#dups)) are verified by estimated Jaccard over signatures
    recomputed from a candidate-pruned re-read of the input.  The
    candidate/edge structures collected to the driver are O(#dups);
    scale path for adversarial duplicate fractions = dedup.edges_to_labels
    label propagation over the verified edge Dataset.
    """
    import ray

    band_rows = ds.map_batches(
        minhash_band_rows, batch_format="pyarrow",
        fn_kwargs=dict(k=k, bands=bands, shingle_n=shingle_n,
                       id_col=id_col, text_col=text_col),
    ).map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("band_key").to_numpy(zero_copy_only=False)
                             % num_partitions, pa.int64())),
        batch_format="pyarrow",
    )
    pairs = band_rows.groupby("part", num_partitions=num_partitions).map_groups(
        minhash_partition_pairs, batch_format="pandas",
        fn_kwargs={"max_bucket": max_bucket},
    ).to_pandas()
    if pairs.empty or "a" not in pairs.columns:
        return ds
    pairs = pairs.drop_duplicates()  # same pair found via several bands
    cand_ids = set(pairs["a"]).union(pairs["b"])
    if source_fetch is not None:
        # predicate-pushdown re-read of just the candidate rows from the
        # source (e.g. a DuckDB/pyarrow filtered parquet scan) — no second
        # Dataset execution; the 100-TB path when the source supports
        # row filters
        cand_tbl = source_fetch(cand_ids)
    else:
        cand_tbl = (
            _keep_ids_filter(ds.select_columns([id_col, text_col]),
                             id_col, cand_ids)
            .to_pandas()  # bounded: O(#candidate ids)
        )
    fam = _hash_family(k)
    sigs = minhash_signatures_batch(cand_tbl[text_col].tolist(), k, shingle_n, fam)
    sig_by_id = {str(i): sigs[j] for j, i in enumerate(cand_tbl[id_col])}
    sa = np.stack([sig_by_id[i] for i in pairs["a"]])
    sb = np.stack([sig_by_id[i] for i in pairs["b"]])
    est = (sa == sb).mean(axis=1)
    verified = pairs[est >= threshold]
    if verified.empty:
        return ds
    canon = union_find_canonical(verified["a"].tolist(), verified["b"].tolist())
    drop = {m for m, c in canon.items() if m != c}
    return _drop_ids_filter(ds, id_col, drop)


# ------------------------------------------------------------------ simhash
def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (stable crc32-seeded bit hashes)."""
    v = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        b = tok.encode("utf-8")
        h64 = (zlib.crc32(b) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        h64 ^= zlib.crc32(b[::-1])
        bits = np.unpackbits(np.frombuffer(np.uint64(h64).tobytes(), dtype=np.uint8))
        v += np.where(bits.astype(bool), 1, -1)
    h = np.uint64(0)
    for j in range(64):
        h = (h << np.uint64(1)) | np.uint64(1 if v[j] > 0 else 0)
    return int(h)


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  out: str = "simhash") -> pa.Table:
    from ..common.hashing import uint64_to_int64

    vals = [uint64_to_int64(simhash64(t)) for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out, pa.array(vals, pa.int64()))


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  hamming_max: int = 3, bands: int = 4,
                  num_partitions: int = 32):
    """SimHash near-dup collapse, reusing the phash banded machinery
    (partition-level pair finding — no per-singleton-bucket dispatch)."""
    from .dedup import near_dup_edges

    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})
    small = hashed.map_batches(
        lambda t: pa.table({"image_id": pa.array([str(v) for v in t.column(id_col).to_pylist()], pa.string()),
                            "phash": t.column("simhash")}),
        batch_format="pyarrow",
    )
    edges = near_dup_edges(small, bands=bands, hamming_max=hamming_max,
                           num_partitions=num_partitions)
    edf = edges.to_pandas()
    if edf.empty or "a" not in edf.columns:
        return ds
    canon = union_find_canonical(edf["a"].tolist(), edf["b"].tolist())
    drop = {m for m, c in canon.items() if m != c}
    return _drop_ids_filter(ds, id_col, drop)


# --------------------------------------------------------------- jaccard
def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification kernel for candidates)."""
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(n)]))) if len(a.split()) >= n else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(n)]))) if len(b.split()) >= n else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
