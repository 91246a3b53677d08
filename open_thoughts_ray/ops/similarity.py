"""Similarity search + embedding near-dup over a ``list<float>`` column.

* ``ann_topk``       — brute-force cosine top-k per query: the query
  matrix is broadcast once (``ray.put``) and each batch does one numpy
  matmul against it.  The scale path keeps the same per-batch matmul but
  restricts candidates with the LSH bucketing below (IVF-style).
* ``cosine_dedup_earlier`` — drop a row iff an earlier id has cosine ≥ t
  (the deterministic analogue of the reference's first-seen-wins FAISS
  IndexFlatIP filter, similarity_filtering_operator.py:93-114, without
  the order-dependent sequential actor).
* ``lsh_bucket_batch`` — random-hyperplane signature (SimHash for dense
  vectors) for bucketed candidate generation at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    flat = arr.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // batch.num_rows
    return flat.reshape(batch.num_rows, dim).astype(np.float64)


def ann_topk(ds, queries: np.ndarray, k: int, id_col: str = "vec_id",
             emb_col: str = "embedding", query_ids: list | None = None):
    """Brute-force cosine top-k: Dataset[(query_id, vec_id, rank)].

    Per batch: one (B×d)·(d×Q) matmul against the broadcast query matrix
    → per-batch local top-k candidates; a final small groupby-per-query
    reduction picks the global top-k (classic partial top-k combine).
    Ties broken by (cos desc, vec_id asc) — deterministic.
    """
    import pandas as pd
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else list(range(len(qn))), dtype=np.int64
    )
    q_ref = ray.put((qn, qids))

    class Score:
        def __init__(self):
            self.q, self.qids = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, emb_col))
            sims = m @ self.q.T  # (B, Q)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            # local top-k per query within this batch
            out_q, out_id, out_sim = [], [], []
            kk = min(k + 1, sims.shape[0])
            for qi in range(sims.shape[1]):
                s = sims[:, qi]
                part = np.argpartition(-s, kk - 1)[:kk]
                for j in part:
                    out_q.append(int(self.qids[qi]))
                    out_id.append(int(ids[j]))
                    out_sim.append(float(s[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "cos": pa.array(out_sim, pa.float64()),
                }
            )

    cand = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8),
                          num_cpus=0.5)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.vec_id != g.query_id]
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def cosine_dedup_earlier(ds, threshold: float, id_col: str = "vec_id",
                         emb_col: str = "embedding"):
    """Survivors: rows with NO earlier id at cosine ≥ threshold.

    The full (normalized) matrix is broadcast once and each batch checks
    its rows against all earlier ids — O(N²/B) matmuls, N·d·8 bytes
    broadcast.  Fine to ~10^6 rows; beyond that restrict candidates with
    lsh_bucket_batch buckets (same verify step per bucket).
    """
    import ray

    mats, ids = [], []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=1 << 14, batch_format="pyarrow"
    ):
        mats.append(_batch_matrix(b, emb_col))
        ids.append(b.column(id_col).to_numpy(zero_copy_only=False))
    all_m = _normalize(np.concatenate(mats))
    all_ids = np.concatenate(ids)
    order = np.argsort(all_ids, kind="stable")
    all_m, all_ids = all_m[order], all_ids[order]
    m_ref = ray.put((all_ids, all_m))

    class F:
        def __init__(self):
            self.ids, self.m = ray.get(m_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bm = _normalize(_batch_matrix(batch, emb_col))
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            keep = np.ones(len(bids), dtype=bool)
            sims = bm @ self.m.T  # (B, N)
            for i, bid in enumerate(bids):
                n_earlier = np.searchsorted(self.ids, bid)
                if n_earlier and sims[i, :n_earlier].max() >= threshold:
                    keep[i] = False
            return batch.filter(pa.array(keep))

    return ds.map_batches(F, batch_format="pyarrow", concurrency=(1, 8),
                          num_cpus=0.5)


def lsh_bucket_batch(batch: pa.Table, n_planes: int = 16, seed: int = 7,
                     emb_col: str = "embedding", out: str = "lsh_bucket") -> pa.Table:
    """Random-hyperplane LSH bucket id (int64) for IVF-style candidate
    restriction: near-identical vectors share a bucket w.h.p."""
    m = _batch_matrix(batch, emb_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((m.shape[1], n_planes))
    bits = (m @ planes) > 0
    bucket = np.zeros(len(m), dtype=np.int64)
    for j in range(n_planes):
        bucket = (bucket << 1) | bits[:, j].astype(np.int64)
    return batch.append_column(out, pa.array(bucket, pa.int64()))
