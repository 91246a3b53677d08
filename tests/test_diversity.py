"""Greedy k-center diversity selection (ops/diversity.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.ops.diversity import (
    kcenter_select,
    kcenter_select_dataset,
)


def _serial_kcenter(ids, M, k):
    """Reference greedy farthest-point (cosine), seed = smallest id."""
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    sel = [order[0]]
    while len(sel) < k:
        dist = 1.0 - (M @ M[sel].T).max(axis=1)
        dist[sel] = -np.inf
        j = int(np.lexsort((ids, -dist))[0])
        sel.append(j)
    return [int(ids[i]) for i in sel]


def _emb_table(n=200, d=16, seed=5):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in M],
                              pa.list_(pa.float64())),
    })
    return ids, M, t


def test_kcenter_matches_serial_reference(ray_session):
    ids, M, t = _emb_table()
    got = kcenter_select(rd.from_arrow(t).repartition(8), k=10)
    want = _serial_kcenter(ids, M, 10)
    assert [int(v) for v in got] == want


def test_kcenter_spreads_over_clusters(ray_session):
    # 4 tight clusters far apart: the first 4 selections must hit all 4
    rng = np.random.default_rng(9)
    centers = np.eye(4)
    rows, ids = [], []
    for i in range(80):
        c = i % 4
        rows.append(centers[c] + 0.01 * rng.standard_normal(4))
        ids.append(i)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              pa.list_(pa.float64())),
    })
    got = kcenter_select(rd.from_arrow(t).repartition(4), k=4)
    assert {int(g) % 4 for g in got} == {0, 1, 2, 3}


def test_kcenter_dataset_filter(ray_session):
    ids, M, t = _emb_table(n=60)
    out = kcenter_select_dataset(rd.from_arrow(t).repartition(4), k=5) \
        .to_pandas()
    assert len(out) == 5
    assert sorted(out.vec_id) == sorted(
        int(v) for v in kcenter_select(rd.from_arrow(t), k=5))


def test_kcenter_k_exceeds_rows(ray_session):
    """ADVICE r4: k > row count must return each point once, not loop
    re-picking duplicates."""
    ids, M, t = _emb_table(n=7)
    got = kcenter_select(rd.from_arrow(t).repartition(3), k=50)
    assert sorted(got) == sorted(ids.tolist())
    assert len(got) == len(set(got)) == 7
