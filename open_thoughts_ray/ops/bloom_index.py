"""Persisted exact-dedup index: a hash-partitioned content-fingerprint
table + per-partition Bloom filters, for incremental (day-N+1) ingest.

``ops/dedup.delta_ingest_dedup`` answers "drop delta rows already seen"
but re-hashes the WHOLE seen corpus text every ingest.  This module is
its persisted twin (the exact-dup analogue of ``ops/minhash_index``):

* ``build_bloom_index`` streams the corpus ONCE, writing 8-byte
  content hashes grouped by ``hash % n_parts`` plus one Bloom filter
  per partition (built inside the same per-partition task — the bits
  travel to the driver once, n_parts × n_bits/8 bytes total).
* ``delta_exact_dedup_vs_index`` vets a delta in three tiers:
  (1) within-delta keep-first (one thin (hash, id) shuffle);
  (2) Bloom probe — a broadcast bitset decides "definitely new" for
      the overwhelming majority of rows with ZERO disk reads;
  (3) exact verify — only Bloom POSITIVES read the seen-hash table,
      and only the hash partitions those candidates land in (parquet
      predicate pushdown on the ``part`` column), closing the false-
      positive hole so the result is EXACTLY `h ∉ seen`.

100-TB shape: the seen corpus text is never re-read (8 bytes/doc of
state, like the MinHash index's k×8); the delta-side shuffles carry
(hash, id) pairs only; Bloom misses (≈ all of a fresh crawl) touch no
storage; per-partition Bloom files mean a multi-node deployment can
lazy-load only the partitions a worker actually probes instead of one
monolithic bitset (at 10^10+ keys a single filter stops being
broadcastable; the sharded layout is the documented scale path).

Fingerprint = first 8 big-endian bytes of md5(text) — bit-reproducible
in ANSI SQL as ``CAST('0x' || substr(md5(text), 1, 16) AS UBIGINT)``
(same convention as ``ops/sketch._hash_values_md5``), so the whole
ingest decision is oracle-checkable end to end.

Crash safety follows the MinHash-index contract (ADVICE r4): with
``return_commit=True`` nothing is appended until the caller has
persisted the survivors and invokes ``commit()`` — the index update is
the last, idempotent step (re-appending the same hashes only adds
duplicate membership rows, which membership semantics ignore).

Reference seam: the reference has no persisted-state dedup at all
(its exact dedup is commons.py in-memory `seen` sets); this is one of
the beyond-reference components the 100-TB tier needs.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np
import pyarrow as pa

_META = "manifest.json"
_BLOOM = "bloom.npz"
_HASHES = "hashes"


# ----------------------------------------------------------- fingerprint
def content_hash_batch(texts, prefix_tokens: int | None = None) -> np.ndarray:
    """uint64 content fingerprints (md5 first 8 bytes, big-endian) —
    SQL-replayable; ``prefix_tokens`` hashes only the first k tokens
    (truncation-tolerant variant, as in delta_ingest_dedup)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, x in enumerate(texts):
        s = x or ""
        if prefix_tokens is not None:
            s = " ".join(s.split(" ")[:prefix_tokens])
        out[i] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
    return out


# ----------------------------------------------------------------- bloom
def _positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via the splitmix64 remix chain (same mixing
    as ops/sketch.BloomFilter so behavior is shared and tested)."""
    from .sketch import splitmix64

    pos = np.empty((len(h), k), dtype=np.int64)
    cur = h.astype(np.uint64)
    for j in range(k):
        cur = splitmix64(cur)
        pos[:, j] = (cur % np.uint64(n_bits)).astype(np.int64)
    return pos


class PartitionedBloom:
    """n_parts independent Bloom filters; key i probes filter
    ``i % n_parts`` only.  ``bits`` is a (n_parts, n_bits//8+1) uint8
    matrix — row p is partition p's filter, savable/lazily loadable
    per row."""

    def __init__(self, n_parts: int, n_bits: int, k: int,
                 bits: np.ndarray | None = None):
        self.n_parts, self.n_bits, self.k = n_parts, n_bits, k
        self.bits = (np.zeros((n_parts, n_bits // 8 + 1), dtype=np.uint8)
                     if bits is None else bits)

    def add(self, h: np.ndarray) -> None:
        if not len(h):
            return
        h = h.astype(np.uint64)
        part = (h % np.uint64(self.n_parts)).astype(np.int64)
        pos = _positions(h, self.n_bits, self.k)
        rows = np.repeat(part, self.k)
        flat = pos.ravel()
        np.bitwise_or.at(self.bits, (rows, flat // 8),
                         (1 << (flat % 8)).astype(np.uint8))

    def contains(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=bool)
        h = h.astype(np.uint64)
        part = (h % np.uint64(self.n_parts)).astype(np.int64)
        pos = _positions(h, self.n_bits, self.k)
        ok = np.ones(len(h), dtype=bool)
        for j in range(self.k):
            p = pos[:, j]
            ok &= (self.bits[part, p // 8]
                   & (1 << (p % 8)).astype(np.uint8)) != 0
        return ok

    def save(self, path: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                   suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez_compressed(
                    f, bits=self.bits,
                    meta=np.asarray([self.n_parts, self.n_bits, self.k],
                                    dtype=np.int64))
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @classmethod
    def load(cls, path: str) -> "PartitionedBloom":
        with np.load(path) as z:
            n_parts, n_bits, k = (int(v) for v in z["meta"])
            return cls(n_parts, n_bits, k, bits=z["bits"])


def _next_pow2(n: int) -> int:
    return 1 << max(10, int(n - 1).bit_length())


# ----------------------------------------------------------------- build
def _hash_rows(t: pa.Table, *, text_col: str, id_col: str | None,
               n_parts: int, prefix_tokens: int | None) -> pa.Table:
    h = content_hash_batch(t.column(text_col).to_pylist(), prefix_tokens)
    cols = {
        "h": pa.array(h.view(np.int64), pa.int64()),
        "part": pa.array((h % np.uint64(n_parts)).astype(np.int64),
                         pa.int64()),
    }
    if id_col is not None:
        cols[id_col] = t.column(id_col)
    return pa.table(cols)


def build_bloom_index(ds, out_dir: str, text_col: str = "text",
                      n_parts: int = 16, bits_per_key: int = 12,
                      k: int = 7, prefix_tokens: int | None = None) -> str:
    """Corpus → ``out_dir``: hash fragments grouped by partition +
    per-partition Bloom filters + manifest.  One thin 8-byte/row
    shuffle; the text column never leaves the hashing task."""
    import functools

    os.makedirs(os.path.join(out_dir, _HASHES), exist_ok=True)
    thin = ds.map_batches(
        functools.partial(_hash_rows, text_col=text_col, id_col=None,
                          n_parts=n_parts, prefix_tokens=prefix_tokens),
        batch_format="pyarrow").materialize()
    n_rows = thin.count()
    n_bits = _next_pow2(bits_per_key * max(1, n_rows) // n_parts)

    def per_part(df):
        import pandas as _pd

        if df.empty or "h" not in df.columns:
            return _pd.DataFrame({"part": _pd.Series([], dtype="int64"),
                                  "bloom": _pd.Series([], dtype=object)})
        p = int(df["part"].iloc[0])
        uniq = np.unique(df["h"].to_numpy(dtype=np.int64))
        frag = pa.table({
            "h": pa.array(uniq, pa.int64()),
            "part": pa.array(np.full(len(uniq), p), pa.int64()),
        })
        import pyarrow.parquet as pq

        pq.write_table(frag, os.path.join(out_dir, _HASHES,
                                          f"part-{p:05d}-0.parquet"),
                       compression="zstd", compression_level=1)
        bl = PartitionedBloom(1, n_bits, k)
        # single-row filter: add with part forced to 0
        pos = _positions(uniq.view(np.uint64), n_bits, k).ravel()
        np.bitwise_or.at(bl.bits[0], pos // 8,
                         (1 << (pos % 8)).astype(np.uint8))
        return _pd.DataFrame({"part": [p], "bloom": [bl.bits[0].tobytes()]})

    parts = thin.groupby("part").map_groups(per_part).take_all()
    bloom = PartitionedBloom(n_parts, n_bits, k)
    for row in parts:
        bloom.bits[int(row["part"])] = np.frombuffer(row["bloom"],
                                                     dtype=np.uint8)
    bloom.save(os.path.join(out_dir, _BLOOM))
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"n_parts": n_parts, "n_bits": n_bits, "k": k,
                   "n_rows": n_rows, "prefix_tokens": prefix_tokens,
                   "text_col": text_col, "appends": 0}, f)
    return out_dir


# ---------------------------------------------------------------- ingest
def delta_exact_dedup_vs_index(new_ds, index_dir: str,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               update_index: bool = True,
                               return_commit: bool = False,
                               num_partitions: int | None = None):
    """Delta → rows whose content fingerprint is new (vs the index AND
    earlier delta rows; keep-first by min id within the delta).

    Returns the kept full-width Dataset, or ``(kept, commit)`` with
    ``return_commit=True`` — call ``commit()`` only after persisting
    the survivors (index append is the last, idempotent step)."""
    import functools

    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from .dedup_text import _auto_partitions

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    n_parts = int(meta["n_parts"])
    bloom = PartitionedBloom.load(os.path.join(index_dir, _BLOOM))
    num_partitions = _auto_partitions(num_partitions)

    thin = new_ds.map_batches(
        functools.partial(_hash_rows, text_col=text_col, id_col=id_col,
                          n_parts=n_parts,
                          prefix_tokens=meta.get("prefix_tokens")),
        batch_format="pyarrow")

    # tier 1 — within-delta keep-first: hash-partitioned, one vectorized
    # drop-duplicates per partition (exact_dedup's partition-level trick)
    def first_seen(df):
        if df.empty or "h" not in df.columns:
            return df
        return df.sort_values(["h", id_col], kind="mergesort") \
            .drop_duplicates("h", keep="first")

    # groupby aggregators emit schema-LESS blocks for empty partitions;
    # retype them BEFORE anything join-shaped consumes this dataset
    # (verify-skill r4 hazard; deterministic fix, not the probabilistic
    # trailing repartition)
    from .pairverify import retype_empty

    try:
        id_type = new_ds.schema().base_schema.field(id_col).type
    except AttributeError:
        id_type = pa.string()
    winners = thin.groupby("part").map_groups(first_seen).map_batches(
        retype_empty({"h": pa.int64(), "part": pa.int64(),
                      id_col: id_type}),
        batch_format="pyarrow").materialize()

    # tier 2 — Bloom probe (broadcast bits, no disk): miss ⇒ truly new
    ref = ray.put(bloom)

    def probe(t: pa.Table, *, want_hit: bool) -> pa.Table:
        from .bcast import cached_get

        bl = cached_get(ref)
        if t.num_rows == 0 or "h" not in t.column_names:
            return t
        hit = bl.contains(t.column("h").to_numpy(
            zero_copy_only=False).view(np.uint64))
        return t.filter(pa.array(hit if want_hit else ~hit))

    misses = winners.map_batches(probe, batch_format="pyarrow",
                                 fn_kwargs={"want_hit": False})
    hits = winners.map_batches(probe, batch_format="pyarrow",
                               fn_kwargs={"want_hit": True}).materialize()

    # tier 3 — exact verify of Bloom positives: read ONLY the candidate
    # hash partitions, anti-join on the fingerprint
    kept_thin = misses
    if hits.count() > 0:
        cand_parts = sorted({int(r["part"]) for r in
                             hits.select_columns(["part"])
                             .groupby("part").count().take_all()})
        import pyarrow.dataset as pads

        seen = rd.read_parquet(
            os.path.join(index_dir, _HASHES), columns=["h"],
            filter=pads.field("part").isin(cand_parts))
        from .pairverify import anti_join_ids

        seen_ids = seen.map_batches(
            lambda t: pa.table({"id": pc.cast(t.column("h"),
                                              pa.string())})
            if t.num_columns else pa.table({"id": pa.array([],
                                                           pa.string())}),
            batch_format="pyarrow")
        new_hits = anti_join_ids(
            hits.map_batches(
                lambda t: t.append_column(
                    "_hs", pc.cast(t.column("h"), pa.string())),
                batch_format="pyarrow"),
            "_hs", seen_ids, num_partitions) \
            .select_columns(["h", "part", id_col])
        kept_thin = misses.union(new_hits)

    kept_thin = kept_thin.materialize()
    # delta-survivor-bounded driver state (same contract as
    # minhash_index): the kept id set + hashes come to the driver once
    kept_rows = kept_thin.take_all()
    kept_id_set = {str(r[id_col]) for r in kept_rows}
    kept_hashes = np.asarray([r["h"] for r in kept_rows], dtype=np.int64)
    id_ref = ray.put(kept_id_set)

    def keep_rows(t: pa.Table) -> pa.Table:
        from .bcast import cached_get

        ids = cached_get(id_ref)
        col = t.column(id_col)
        if col.type != pa.string():
            col = pc.cast(col, pa.string())
        mask = [v in ids for v in col.to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    kept = new_ds.map_batches(keep_rows, batch_format="pyarrow")

    def _commit() -> None:
        if not len(kept_hashes):
            return
        import pyarrow.parquet as pq

        h64 = kept_hashes.view(np.uint64)
        parts = (h64 % np.uint64(n_parts)).astype(np.int64)
        gen = int(meta.get("appends", 0)) + 1
        for p in np.unique(parts):
            sel = kept_hashes[parts == p]
            pq.write_table(
                pa.table({"h": pa.array(sel, pa.int64()),
                          "part": pa.array(np.full(len(sel), int(p)),
                                           pa.int64())}),
                os.path.join(index_dir, _HASHES,
                             f"part-{int(p):05d}-{gen}.parquet"),
                compression="zstd", compression_level=1)
        bloom.add(h64)
        bloom.save(os.path.join(index_dir, _BLOOM))
        meta["appends"] = gen
        meta["n_rows"] = int(meta.get("n_rows", 0)) + len(kept_hashes)
        with open(os.path.join(index_dir, _META), "w") as f:
            json.dump(meta, f)

    if return_commit:
        return kept, (_commit if update_index else (lambda: None))
    if update_index:
        _commit()
    return kept
