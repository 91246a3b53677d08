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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _batch_matrix, _normalize


def _seed_centroids(thin, emb_col: str, k: int, seed: int,
                    sample_n: int) -> np.ndarray:
    """Deterministic farthest-point (k-means++-style) init on a bounded
    sample: seeded first pick, then greedily the sample point farthest
    (min-cosine) from everything chosen — robust to blob splitting."""
    sm = thin.limit(max(sample_n, k)).to_pandas()
    m = _normalize(np.stack(sm[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    chosen = [int(rng.integers(len(m)))]
    best = m @ m[chosen[0]]
    while len(chosen) < min(k, len(m)):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    return m[chosen].copy()


def kmeans_fit(ds, emb_col: str = "embedding", k: int = 16, iters: int = 8,
               seed: int = 11, init_sample: int = 4096) -> np.ndarray:
    """Fit k cosine centroids over the full dataset.  Returns a (k, d)
    L2-normalized ndarray.  Each iteration: broadcast centroids
    (``ray.put``), stream one partial-sums pass, reduce k rows."""
    import ray

    thin = ds.select_columns([emb_col]).materialize()
    cent = _seed_centroids(thin, emb_col, k, seed, init_sample)
    kk, dim = cent.shape

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_batch_matrix(t, emb_col))
            a = (m @ c.T).argmax(axis=1)
            cids, ns, sums = [], [], []
            for cid in np.unique(a):
                rows = m[a == cid]
                cids.append(int(cid))
                ns.append(len(rows))
                sums.append(rows.sum(axis=0))
            return pa.table({
                "cid": pa.array(cids, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array([v.tolist() for v in sums],
                              pa.list_(pa.float64())),
            })

        def reduce_cell(g: pd.DataFrame) -> pd.DataFrame:
            s = np.stack(g["s"].to_numpy()).sum(axis=0)
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
                  out_col: str = "cluster"):
    """Append the nearest-centroid id (int64) — one broadcast, one
    vectorized matmul per batch."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_batch_matrix(t, emb_col))
        return t.append_column(out_col,
                               pa.array((m @ c.T).argmax(axis=1),
                                        pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def semantic_dedup(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                   k: int = 16, threshold: float = 0.9, iters: int = 8,
                   seed: int = 11, chunk: int = 4096):
    """SemDeDup: keep a row unless some LOWER-id row in the same k-means
    cluster has cosine ≥ ``threshold``.  Returns a Dataset[(id_col,)] of
    survivors.  The in-cluster scan is chunked ((chunk × c) matmuls
    against earlier rows only) so a skewed cluster never materializes a
    c×c matrix."""
    cent = kmeans_fit(ds, emb_col, k=k, iters=iters, seed=seed)
    assigned = kmeans_assign(ds.select_columns([id_col, emb_col]), cent,
                             emb_col=emb_col)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        keep = np.ones(len(g), dtype=bool)
        for lo in range(1, len(g), chunk):
            hi = min(lo + chunk, len(g))
            sims = m[lo:hi] @ m[:hi].T           # (chunk, hi)
            # row i (global) may only look at columns < i: strict lower
            # triangle relative to the global index
            earlier = np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
            keep[lo:hi] = ~((sims >= threshold) & earlier).any(axis=1)
        return pd.DataFrame({id_col: ids[keep]})

    return assigned.groupby("cluster").map_groups(per_cluster,
                                                  batch_format="pandas")
