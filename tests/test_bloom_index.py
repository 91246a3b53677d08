"""Persisted Bloom exact-dedup index (ops/bloom_index.py).

Correctness bar: three-tier ingest (within-delta keep-first → Bloom
prefilter → partition-pruned exact verify) must equal the plain
"delta minus seen fingerprints" semantics EXACTLY — including under a
deliberately undersized Bloom (high false-positive rate), which only
shifts work to the verify tier, never changes the answer.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops.bloom_index import (
    PartitionedBloom,
    build_bloom_index,
    content_hash_batch,
    delta_exact_dedup_vs_index,
)


def _docs(ids, texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _expect_kept(seen_texts, delta):
    """Oracle in plain python: delta (id, text) rows kept = fingerprint
    unseen and first occurrence (min id) within the delta."""
    seen = set(content_hash_batch(seen_texts).tolist())
    kept, used = [], set()
    for i, t in sorted(delta):
        h = int(content_hash_batch([t])[0])
        if h in seen or h in used:
            continue
        used.add(h)
        kept.append(i)
    return kept


def test_partitioned_bloom_membership_and_fpr():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, 5000).astype(np.uint64)
    other = rng.integers(0, 2**63, 5000).astype(np.uint64)
    bl = PartitionedBloom(n_parts=8, n_bits=1 << 16, k=7)
    bl.add(keys)
    assert bl.contains(keys).all()          # no false negatives, ever
    fpr = bl.contains(other).mean()
    assert fpr < 0.05                        # ~5k keys in 8×64Kb ≈ tiny

    # roundtrip through the atomic save
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "b.npz")
        bl.save(p)
        bl2 = PartitionedBloom.load(p)
        assert bl2.contains(keys).all()
        assert (bl2.bits == bl.bits).all()


def test_sql_replayable_fingerprint():
    import duckdb

    texts = ["alpha beta", "", "üñï¢ødé", "x " * 50]
    mine = content_hash_batch(texts)
    got = [duckdb.sql(
        "SELECT CAST('0x' || substr(md5(?), 1, 16) AS UBIGINT)",
        params=[t]).fetchone()[0] for t in texts]
    assert [int(v) for v in mine] == got


def test_ingest_matches_oracle(ray_session, tmp_path):
    seen_texts = [f"doc number {i}" for i in range(40)]
    idx = str(tmp_path / "idx")
    build_bloom_index(_docs(range(40), seen_texts), idx, n_parts=4)

    # delta: 10 new, 5 dup-of-seen, plus an intra-delta dup pair
    d_ids = list(range(100, 115)) + [115, 116]
    d_txt = [f"new doc {i}" for i in range(10)] \
        + [f"doc number {i}" for i in range(5)] \
        + ["twin text", "twin text"]
    delta = _docs(d_ids, d_txt)
    kept, commit = delta_exact_dedup_vs_index(
        delta, idx, return_commit=True)
    got = sorted(kept.to_pandas()["doc_id"])
    want = _expect_kept(seen_texts, list(zip(d_ids, d_txt)))
    assert got == sorted(want)
    assert 115 in got and 116 not in got    # keep-first within delta

    # commit is the LAST idempotent step: before commit a re-run keeps
    # the same rows; after commit the same delta is fully seen
    again = delta_exact_dedup_vs_index(delta, idx, update_index=False)
    assert sorted(again.to_pandas()["doc_id"]) == got
    commit()
    after = delta_exact_dedup_vs_index(delta, idx, update_index=False)
    assert after.count() == 0


def test_undersized_bloom_still_exact(ray_session, tmp_path):
    """Force heavy false positives (tiny filter): the verify tier must
    rescue exactness; only performance degrades."""
    seen_texts = [f"s{i}" for i in range(30)]
    idx = str(tmp_path / "idx")
    build_bloom_index(_docs(range(30), seen_texts), idx,
                      n_parts=2, bits_per_key=1, k=2)
    d_ids = list(range(200, 230))
    d_txt = [f"n{i}" for i in range(20)] + [f"s{i}" for i in range(10)]
    kept = delta_exact_dedup_vs_index(_docs(d_ids, d_txt), idx,
                                      update_index=False)
    got = sorted(kept.to_pandas()["doc_id"])
    assert got == list(range(200, 220))


def test_empty_delta_and_all_new(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    build_bloom_index(_docs(range(5), [f"s{i}" for i in range(5)]), idx,
                      n_parts=2)
    all_new = delta_exact_dedup_vs_index(
        _docs([9, 10], ["brand new", "also new"]), idx,
        update_index=False)
    assert all_new.count() == 2
    none = delta_exact_dedup_vs_index(
        _docs([], []), idx, update_index=False)
    assert none.count() == 0
