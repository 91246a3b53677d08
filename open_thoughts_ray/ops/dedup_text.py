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

from .dedup import band_explode_batch, bucket_pairs, union_find_canonical

_MERS61 = (1 << 61) - 1


def _hash_family(k: int, seed: int = 97) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERS61, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERS61, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.asarray(
        sorted({zlib.crc32(g.encode("utf-8")) for g in grams}), dtype=np.uint64
    )


def minhash_signature(text: str, k: int = 64, shingle_n: int = 3,
                      family=None) -> np.ndarray:
    a, b = family if family is not None else _hash_family(k)
    x = _shingle_hashes(text, shingle_n)
    if x.size == 0:
        return np.zeros(len(a), dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (a*x + b) mod 2^61-1 via uint64 arithmetic on 32-bit inputs
        vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERS61)
    return vals.min(axis=1)


def minhash_band_rows(batch: pa.Table, *, k: int, bands: int, shingle_n: int,
                      id_col: str, text_col: str) -> pa.Table:
    """doc → `bands` rows of (band_key, id, sig) for the LSH groupby."""
    fam = _hash_family(k)
    r = k // bands
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_key, out_id, out_sig = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(t, k, shingle_n, fam)
        sig_bytes = sig.tobytes()
        for b in range(bands):
            band_hash = zlib.crc32(sig_bytes[b * r * 8 : (b + 1) * r * 8])
            out_key.append((b << 32) | band_hash)
            out_id.append(ids[i])
            out_sig.append(sig.view(np.int64).tolist())
    return pa.table(
        {
            "band_key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id),
            "sig": pa.array(out_sig, pa.list_(pa.int64())),
        }
    )


def _minhash_bucket_pairs(group: pd.DataFrame, threshold: float,
                          max_bucket: int = 256) -> pa.Table:
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    n = len(group)
    if n < 2:
        return empty
    ids = [str(x) for x in group["id"].tolist()]
    sigs = np.asarray(group["sig"].tolist(), dtype=np.int64)
    order = np.lexsort((ids,))
    a_out, b_out = [], []
    members = sorted(range(n), key=lambda i: ids[i])[:max_bucket]
    for ai in range(len(members) - 1):
        i = members[ai]
        rest = members[ai + 1 :]
        est = (sigs[rest] == sigs[i]).mean(axis=1)
        for j, e in zip(rest, est):
            if e >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
    if not a_out:
        return empty
    return pa.table({"a": pa.array(a_out, pa.string()),
                     "b": pa.array(b_out, pa.string())})


def minhash_lsh_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 64, bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7):
    """Near-dup collapse; survivors = min id per component.

    shingle→minhash→band→groupby→verify→union-find (SURVEY.md dedup
    family).  Edge list collected to the driver (O(#dups)); scale path =
    label propagation as in ops.dedup.
    """
    import ray

    band_rows = ds.map_batches(
        minhash_band_rows, batch_format="pyarrow",
        fn_kwargs=dict(k=k, bands=bands, shingle_n=shingle_n,
                       id_col=id_col, text_col=text_col),
    )
    edges = band_rows.groupby("band_key").map_groups(
        _minhash_bucket_pairs, batch_format="pandas",
        fn_kwargs={"threshold": threshold},
    )
    edf = edges.to_pandas()
    if edf.empty or "a" not in edf.columns:
        return ds
    canon = union_find_canonical(edf["a"].tolist(), edf["b"].tolist())
    drop = {m for m, c in canon.items() if m != c}
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
                  hamming_max: int = 3, bands: int = 4):
    """SimHash near-dup collapse, reusing the phash banded machinery."""
    import ray

    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})
    small = hashed.map_batches(
        lambda t: pa.table({"image_id": pa.array([str(v) for v in t.column(id_col).to_pylist()], pa.string()),
                            "phash": t.column("simhash")}),
        batch_format="pyarrow",
    )
    exploded = small.map_batches(band_explode_batch, batch_format="pyarrow",
                                 fn_kwargs={"bands": bands})
    edges = exploded.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas", fn_kwargs={"hamming_max": hamming_max}
    )
    edf = edges.to_pandas()
    if edf.empty or "a" not in edf.columns:
        return ds
    canon = union_find_canonical(edf["a"].tolist(), edf["b"].tolist())
    drop = {m for m, c in canon.items() if m != c}
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


# --------------------------------------------------------------- jaccard
def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification kernel for candidates)."""
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(n)]))) if len(a.split()) >= n else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(n)]))) if len(b.split()) >= n else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
