"""Distributed k-means and cluster-restricted semantic dedup.

``kmeans_fit`` runs Lloyd's algorithm with the DATA streamed: each
iteration is one ``map_batches`` pass emitting per-(batch, centroid)
partial sums — a (cid, n, sum-vector) row, tiny next to the data — and
one small keyed reduce down to k rows.  Driver state is O(k×d) per
iteration, never rows, so the fit holds at any N (unlike the
bounded-sample quantizer in ``similarity._kmeans_lite``, which trains on
≤64k vectors for IVF).  Inputs are L2-normalized so the metric is
cosine.

``semantic_dedup`` is the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): cluster the embeddings, then compare pairs ONLY
within a cluster and drop any row whose cosine to a lower-id row in the
same cluster is ≥ threshold.  Approximate by design — cross-cluster
near-dups are not compared; with k clusters the pair work drops from
O(N²) to ~O(N²/k).  Per-cluster work is one keyed shuffle + a chunked
in-group matmul; skewed clusters cost O(c²/k_chunk) per task (caveat
shared with every keyed groupby here).

Determinism (late r5): every reduction that crosses a batch boundary is
FIXED-POINT int64 — normalized embeddings are quantized at Q=2^20
(``_quantize``), assignments use exact integer matmul argmax, centroid
partial sums accumulate int64 (order-free), and in-cluster cosines are
exact integer dots divided elementwise by exact integer norms.  Result:
``kmeans_fit`` / ``kmeans_assign`` / ``semantic_dedup`` are
bit-identical across parallelism levels and bit-identical to a serial
replay of the same recipe (tests/test_cluster.py) — the property the
driver's hash gate needs.  Quantization perturbs cosines by ≤ ~1e-6,
noise for an approximate method whose own clustering is the larger
approximation.  numpy integer matmul bypasses BLAS (no float blocking),
which costs ~2-5× on the matmul at 100-TB scale — the documented price
of a hash-checkable dedup; pass Q=0 to any entry point for the float
fast path when replayability is not required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _batch_matrix, _normalize

Q_EXACT = 1 << 20  # fixed-point scale for order-free exact reductions


def _quantize(m: np.ndarray, q: int = Q_EXACT) -> np.ndarray:
    """Round a float matrix to int64 fixed-point at scale ``q``."""
    return np.rint(np.asarray(m, dtype=np.float64) * q).astype(np.int64)


def _seed_centroids(thin, emb_col: str, k: int, seed: int,
                    sample_n: int) -> np.ndarray:
    """Deterministic farthest-point (k-means++-style) init on a bounded
    sample: seeded first pick, then greedily the sample point farthest
    (min-cosine) from everything chosen — robust to blob splitting.

    The sample rows are content-sorted (lexicographic over coordinates)
    before the seeded picks: ``to_pandas`` row order follows block
    completion order, which moves with parallelism — sorting makes the
    init a pure function of the sampled SET (and the set is the whole
    table whenever ``sample_n`` ≥ N, the hash-gate regime)."""
    sm = thin.limit(max(sample_n, k)).to_pandas()
    m = _normalize(np.stack(sm[emb_col].to_numpy()).astype(np.float64))
    m = m[np.lexsort(m.T[::-1])]
    rng = np.random.default_rng(seed)
    chosen = [int(rng.integers(len(m)))]
    best = m @ m[chosen[0]]
    while len(chosen) < min(k, len(m)):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    return m[chosen].copy()


def kmeans_fit(ds, emb_col: str = "embedding", k: int = 16, iters: int = 8,
               seed: int = 11, init_sample: int = 4096,
               q: int = Q_EXACT) -> np.ndarray:
    """Fit k cosine centroids over the full dataset.  Returns a (k, d)
    L2-normalized ndarray.  Each iteration: broadcast centroids
    (``ray.put``), stream one partial-sums pass, reduce k rows.

    With ``q`` > 0 (default) assignments and partial sums are exact
    int64 fixed-point, so the fit is bit-identical at any parallelism
    and to a serial replay; ``q=0`` is the float fast path."""
    import ray

    thin = ds.select_columns([emb_col]).materialize()
    cent = _seed_centroids(thin, emb_col, k, seed, init_sample)
    kk, dim = cent.shape

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_batch_matrix(t, emb_col))
            if q:
                qm = _quantize(m, q)
                a = (qm @ _quantize(c, q).T).argmax(axis=1)
                rows_mat = qm
            else:
                a = (m @ c.T).argmax(axis=1)
                rows_mat = m
            cids, ns, sums = [], [], []
            for cid in np.unique(a):
                rows = rows_mat[a == cid]
                cids.append(int(cid))
                ns.append(len(rows))
                sums.append(rows.sum(axis=0))
            typ = pa.int64() if q else pa.float64()
            return pa.table({
                "cid": pa.array(cids, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array([v.tolist() for v in sums],
                              pa.list_(typ)),
            })

        def reduce_cell(g: pd.DataFrame) -> pd.DataFrame:
            stacked = np.stack(g["s"].to_numpy())
            if q:  # int64 partials — exact, order-free
                stacked = stacked.astype(np.int64)
            s = stacked.sum(axis=0)
            return pd.DataFrame({"cid": [int(g["cid"].iloc[0])],
                                 "n": [int(g["n"].sum())],
                                 "s": [s.tolist()]})

        agg = (thin.map_batches(partial, batch_format="pyarrow")
               .groupby("cid").map_groups(reduce_cell,
                                          batch_format="pandas")
               .to_pandas())  # ≤ k rows on the driver

        new = cent.copy()
        for _, row in agg.iterrows():
            if row["n"] > 0:
                v = np.asarray(row["s"], dtype=np.float64)
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[int(row["cid"])] = v / nrm
        if np.allclose(new, cent, atol=1e-12):
            cent = new
            break
        cent = new
    return cent


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  out_col: str = "cluster", q: int = Q_EXACT):
    """Append the nearest-centroid id (int64) — one broadcast, one
    vectorized matmul per batch (exact int64 when ``q`` > 0, so the
    assignment never moves with batch shape)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_batch_matrix(t, emb_col))
        if q:
            a = (_quantize(m, q) @ _quantize(c, q).T).argmax(axis=1)
        else:
            a = (m @ c.T).argmax(axis=1)
        return t.append_column(out_col, pa.array(a, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def semantic_dedup(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                   k: int = 16, threshold: float = 0.9, iters: int = 8,
                   seed: int = 11, chunk: int = 4096, q: int = Q_EXACT):
    """SemDeDup: keep a row unless some LOWER-id row in the same k-means
    cluster has cosine ≥ ``threshold``.  Returns a Dataset[(id_col,)] of
    survivors.  The in-cluster scan is chunked ((chunk × c) matmuls
    against earlier rows only) so a skewed cluster never materializes a
    c×c matrix.  With ``q`` > 0 in-cluster cosines are exact int dots /
    exact int norms — the whole op is parallelism-deterministic."""
    cent = kmeans_fit(ds, emb_col, k=k, iters=iters, seed=seed, q=q)
    assigned = kmeans_assign(ds.select_columns([id_col, emb_col]), cent,
                             emb_col=emb_col, q=q)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        if q:
            qm = _quantize(m, q)
            norms = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
        keep = np.ones(len(g), dtype=bool)
        for lo in range(1, len(g), chunk):
            hi = min(lo + chunk, len(g))
            if q:
                dots = qm[lo:hi] @ qm[:hi].T     # exact int64
                sims = dots / np.outer(norms[lo:hi], norms[:hi])
            else:
                sims = m[lo:hi] @ m[:hi].T       # (chunk, hi)
            # row i (global) may only look at columns < i: strict lower
            # triangle relative to the global index
            earlier = np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
            keep[lo:hi] = ~((sims >= threshold) & earlier).any(axis=1)
        return pd.DataFrame({id_col: ids[keep]})

    return assigned.groupby("cluster").map_groups(per_cluster,
                                                  batch_format="pandas")
