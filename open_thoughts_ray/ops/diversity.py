"""Diversity / coverage selection over an embedding column.

``kcenter_select`` — greedy k-center (farthest-point-first, Gonzalez
1985): iteratively pick the point whose distance to the already-selected
set is LARGEST, the classic coreset / coverage-maximizing curation rule
("pick k maximally diverse examples").  Used at corpus scale to seed
diverse instruction sets and balance embedding-space coverage
(SemDeDup's complement: SemDeDup removes redundancy, k-center picks the
spanning set).

Distributed shape (exact greedy):
* the selected-center matrix lives on the driver — O(k·d) floats, tiny
  by construction (k is a human-sized sample budget);
* each round is ONE streamed pass: every batch computes its rows'
  min-distance to the centers (one (B×d)·(d×C) matmul) and emits just
  its local argmax candidate — a per-block partial, so the driver sees
  blocks-count rows, not N;
* ties broken by (dist desc, id asc) — fully deterministic.

Cost is k passes over the thin (id, embedding) projection — exact
greedy is inherently sequential in k.  For k beyond ~hundreds, use
``sample_frac`` to pre-thin with a seeded hash sample (k-center on a
uniform sample is the standard scale approximation) or run per-bucket
selection and merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _batch_matrix, _normalize


def kcenter_select(ds, k: int, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   sample_frac: float | None = None,
                   seed: str = "otr") -> list:
    """Return the list of ``k`` selected ids (greedy farthest-point,
    cosine distance), deterministic.  ``sample_frac`` pre-thins with a
    seeded hash sample for large corpora (documented approximation)."""
    import zlib

    import ray

    thin = ds.select_columns([id_col, emb_col])
    if sample_frac is not None:
        lim = int(sample_frac * 0xFFFFFFFF)

        def keep(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            m = [zlib.crc32(f"{v}#{seed}".encode()) <= lim for v in ids]
            return t.filter(pa.array(m, pa.bool_()))

        thin = thin.map_batches(keep, batch_format="pyarrow")
    # k sequential passes over the same blocks → pin them once
    thin = thin.materialize()

    # deterministic seed: the smallest id (one streamed min + one fetch)
    import pyarrow.compute as pc

    first_id = thin.min(id_col)
    seed_rows = thin.map_batches(
        lambda t: t.filter(pc.equal(t.column(id_col), first_id)),
        batch_format="pyarrow").take_all()
    centers = _normalize(np.asarray([seed_rows[0][emb_col]], np.float64))
    selected = [first_id]

    while len(selected) < k:
        ref = ray.put((list(selected), centers))

        def local_best(t: pa.Table) -> pa.Table:
            sel_ids, C = ray.get(ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({id_col: t.column(id_col),
                                 "_dist": pa.array([], pa.float64()),
                                 "_vec": pa.array([], pa.list_(pa.float64()))})
            m = _normalize(_batch_matrix(t, emb_col))
            dist = 1.0 - (m @ C.T).max(axis=1)
            dist[np.isin(ids, np.asarray(sel_ids))] = -np.inf
            j = int(np.lexsort((ids, -dist))[0])
            return pa.table({
                id_col: pa.array([ids[j]], t.schema.field(id_col).type),
                "_dist": pa.array([float(dist[j])], pa.float64()),
                "_vec": pa.array([m[j].tolist()], pa.list_(pa.float64())),
            })

        part = thin.map_batches(local_best, batch_format="pyarrow") \
            .to_pandas()
        part = part.sort_values(["_dist", id_col],
                                ascending=[False, True], kind="mergesort")
        nxt = part.iloc[0]
        if not np.isfinite(nxt["_dist"]):
            # every remaining candidate is already selected (k exceeds
            # the point count) — stop instead of re-picking duplicates
            # (ADVICE r4)
            break
        selected.append(nxt[id_col])
        centers = np.vstack([centers,
                             np.asarray(list(nxt["_vec"]), np.float64)])

    return selected


def kcenter_select_dataset(ds, k: int, id_col: str = "vec_id",
                           emb_col: str = "embedding", **kw):
    """Dataset-returning wrapper: rows of the input whose id is in the
    k-center selection (the filter is a broadcast id-set test)."""
    import ray

    ids = kcenter_select(ds, k, id_col=id_col, emb_col=emb_col, **kw)
    ids_ref = ray.put(set(ids))

    def keep(t: pa.Table) -> pa.Table:
        sel = ray.get(ids_ref)
        m = [v in sel for v in t.column(id_col).to_pylist()]
        return t.filter(pa.array(m, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")
