"""Persisted MinHash signature index (ops/minhash_index.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.ops.dedup_text import delta_neardup_ingest
from open_thoughts_ray.ops.minhash_index import (
    build_minhash_index,
    delta_neardup_vs_index,
)


def _doc(rng, n=30):
    return " ".join(f"w{int(v)}" for v in rng.integers(0, 500, n))


def _perturb(text, rng):
    toks = text.split()
    i = int(rng.integers(0, len(toks)))
    toks[i] = "zz" + toks[i]
    return " ".join(toks)


def _tables(seed=31):
    rng = np.random.default_rng(seed)
    seen_texts = [_doc(rng) for _ in range(20)]
    seen = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
    })
    fresh = [_doc(rng) for _ in range(5)]
    copies = [_perturb(seen_texts[i], rng) for i in range(5)]
    d10 = _doc(rng)
    new = pa.table({
        "doc_id": pa.array(range(100, 112), pa.int64()),
        "text": pa.array(fresh + copies + [d10, _perturb(d10, rng)],
                         pa.string()),
    })
    return seen, new


def test_index_path_matches_recompute_path(ray_session, tmp_path):
    seen, new = _tables()
    idx = build_minhash_index(rd.from_arrow(seen).repartition(4),
                              str(tmp_path / "idx"))
    got = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=False).to_pandas()
    want = delta_neardup_ingest(
        rd.from_arrow(new).repartition(4),
        rd.from_arrow(seen).repartition(4), threshold=0.5).to_pandas()
    assert sorted(got.doc_id) == sorted(want.doc_id)
    assert sorted(got.doc_id) == [100, 101, 102, 103, 104, 110]


def test_index_update_sees_prior_shard(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    seen = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([_doc(rng) for _ in range(10)], pa.string()),
    })
    idx = build_minhash_index(rd.from_arrow(seen), str(tmp_path / "idx"))
    d = _doc(rng)
    shard1 = pa.table({
        "doc_id": pa.array([200], pa.int64()),
        "text": pa.array([d], pa.string()),
    })
    out1 = delta_neardup_vs_index(rd.from_arrow(shard1), idx,
                                  threshold=0.5).to_pandas()
    assert list(out1.doc_id) == [200]
    # shard 2 contains a near-copy of shard 1's survivor → must drop
    shard2 = pa.table({
        "doc_id": pa.array([300, 301], pa.int64()),
        "text": pa.array([_perturb(d, rng), _doc(rng)], pa.string()),
    })
    out2 = delta_neardup_vs_index(rd.from_arrow(shard2), idx,
                                  threshold=0.5).to_pandas()
    assert list(out2.doc_id) == [301]


def test_index_path_high_dup_stress(ray_session, tmp_path):
    """95%-dup delta against a 2k-doc corpus: candidate volume is
    O(delta), every machine stage is distributed, and the survivor set
    is exactly the non-dup tail plus first-seen representatives."""
    rng = np.random.default_rng(61)
    base = [_doc(rng, 40) for _ in range(2000)]
    seen = pa.table({
        "doc_id": pa.array(range(2000), pa.int64()),
        "text": pa.array(base, pa.string()),
    })
    idx = build_minhash_index(rd.from_arrow(seen).repartition(8),
                              str(tmp_path / "idx"))
    # delta: 950 near-copies of seen docs + 50 fresh
    new_rows = []
    for i in range(950):
        new_rows.append((10_000 + i, _perturb(base[i % 2000], rng)))
    for i in range(50):
        new_rows.append((20_000 + i, _doc(rng, 40)))
    new = pa.table({
        "doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
        "text": pa.array([r[1] for r in new_rows], pa.string()),
    })
    out = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(8), idx, threshold=0.5,
        update_index=False).to_pandas()
    ids = set(out.doc_id)
    assert all(20_000 + i in ids for i in range(50))  # fresh all kept
    # LSH banding recall is probabilistic (16 bands x 4 rows at ~0.85
    # signature agreement); assert the documented bound, not perfection
    leaked = sum(1 for i in range(950) if 10_000 + i in ids)
    assert leaked <= 950 * 0.01  # >= 99% near-dup recall


def test_return_commit_defers_index_append(ray_session, tmp_path):
    """ADVICE r4 (medium): with return_commit=True the index must stay
    untouched until commit() — persisting survivors first makes the
    append the last idempotent step, so a crash-retry cannot find the
    survivors' own signatures and drop the whole delta."""
    import os

    seen, new = _tables(seed=91)
    idx = build_minhash_index(rd.from_arrow(seen).repartition(4),
                              str(tmp_path / "idx"))

    def sig_files():
        d = os.path.join(idx, "sigs")
        return sorted(os.listdir(d))

    before = sig_files()
    kept, commit = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=True, return_commit=True)
    kept = kept.materialize()
    n_kept = kept.count()
    assert sig_files() == before  # nothing appended yet
    # simulated retry BEFORE commit: the same delta must re-vet to the
    # same survivors (no self-signature poisoning)
    again = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=False).to_pandas()
    assert len(again) == n_kept
    commit()
    assert len(sig_files()) > len(before)
    # after commit the whole delta is recognized as already ingested
    third = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=False).to_pandas()
    assert len(third) == 0


def test_driver_fast_path_matches_distributed_verify(ray_session, tmp_path):
    """VERDICT r5: the small-candidate driver verify (fetch endpoint
    signatures, numpy agreement) must drop exactly the ids the
    distributed partition-merge verify drops."""
    seen, new = _tables(seed=131)
    idx = build_minhash_index(rd.from_arrow(seen).repartition(4),
                              str(tmp_path / "idx"))
    fast = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=False).to_pandas()
    dist = delta_neardup_vs_index(
        rd.from_arrow(new).repartition(4), idx, threshold=0.5,
        update_index=False, max_driver_pairs=0).to_pandas()
    assert sorted(fast.doc_id) == sorted(dist.doc_id)
