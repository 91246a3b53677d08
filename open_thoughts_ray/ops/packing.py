"""Global prefix-sum and sequence packing.

Training-data pipelines pack variable-length documents into fixed token
budgets before batching (the reference reaches the same layout goal via
its shard/truncate operators, engine/operators/*shard*; packing proper
is the canonical extension the brief asks for).  The core primitive is
an EXACT distributed running sum over a total order — the classic
two-phase prefix-sum: bucket rows by ordered ranges of the order key,
reduce one partial sum per bucket (driver holds O(#buckets) numbers,
never rows), then finish each bucket independently with its exclusive
offset.  One keyed shuffle, no driver row loop, no global sort.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

_BKT = "_pbkt"


def _bucket_count(num_buckets: int | None) -> int:
    if num_buckets is not None:
        return max(1, int(num_buckets))
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no cluster yet
        cpus = 8
    return max(8, cpus * 4)


def global_cumsum(ds, order_col: str, value_col: str,
                  out_col: str = "running_sum", *, exclusive: bool = False,
                  num_buckets: int | None = None,
                  bounds: tuple[int, int] | None = None):
    """Exact ``sum(v) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING)`` —
    returns ``(order_col, out_col:int64)``.  ``order_col`` must be a
    unique integer key (it defines the total order).  ``exclusive=True``
    yields the sum of strictly-preceding rows (0 for the first row).

    Scale: the thin ``(order, value)`` projection is materialized once,
    per-bucket partials are a #buckets-row driver table, and the finish
    pass is one keyed shuffle on contiguous ranges of the order key —
    ordered range buckets (not hash) so bucket i wholly precedes
    bucket i+1.  Pass ``bounds=(lo, hi)`` to skip the min/max pass.
    """
    from ray.data.aggregate import Max, Min, Sum

    thin = ds.select_columns([order_col, value_col]).materialize()
    if bounds is None:
        row = thin.aggregate(Min(order_col, alias_name="_lo"),
                             Max(order_col, alias_name="_hi"))
        lo, hi = int(row["_lo"]), int(row["_hi"])
    else:
        lo, hi = int(bounds[0]), int(bounds[1])
    nb = _bucket_count(num_buckets)
    width = max(1, math.ceil((hi - lo + 1) / nb))

    def add_bucket(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        return t.append_column(_BKT, pa.array((o - lo) // width,
                                              type=pa.int64()))

    bucketed = thin.map_batches(add_bucket,
                                batch_format="pyarrow").materialize()

    parts = bucketed.groupby(_BKT).aggregate(
        Sum(value_col, alias_name="_s")).to_pandas()
    parts = parts.sort_values(_BKT)
    csum = parts["_s"].to_numpy(dtype="int64").cumsum()
    offsets = dict(zip(parts[_BKT].astype(int),
                       (csum - parts["_s"].to_numpy(dtype="int64"))))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        v = g[value_col].to_numpy(dtype="int64")
        run = offsets[int(g[_BKT].iloc[0])] + v.cumsum()
        if exclusive:
            run = run - v
        out = g[[order_col]].copy()
        out[out_col] = run
        return out

    return bucketed.groupby(_BKT).map_groups(finish, batch_format="pandas")


def pack_sequences(ds, order_col: str, weight_col: str, budget: int,
                   pack_col: str = "pack_id", **cumsum_kw):
    """Assign each row a pack id by cumulative weight offset:
    ``pack = floor(exclusive_running_sum(weight) / budget)`` over rows
    ordered by ``order_col`` — the deterministic boundary-straddling
    packing layout (a document whose span crosses a budget boundary
    belongs to the pack its first token falls in).  Returns
    ``(order_col, pack_col:int64)``; join back on ``order_col`` for the
    payload.  Same scale profile as :func:`global_cumsum`."""
    off = global_cumsum(ds, order_col, weight_col, out_col="_off",
                        exclusive=True, **cumsum_kw)

    def fin(t: pa.Table) -> pa.Table:
        o = t.column("_off").to_numpy(zero_copy_only=False)
        return pa.table({
            order_col: t.column(order_col),
            pack_col: pa.array(o // int(budget), type=pa.int64()),
        })

    return off.map_batches(fin, batch_format="pyarrow")


def chunk_tokens(ds, chunk_size: int = 32, stride: int = 24,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Overlapping token-window chunking (RAG / context-window prep):
    each document fans out to ``max(ceil((n - chunk_size)/stride), 0)+1``
    chunks of ``chunk_size`` whitespace tokens starting every ``stride``
    tokens; the final chunk may be short; empty documents emit nothing.

    Embarrassingly parallel ``map_batches`` fan-out (1→k rows inside the
    batch, no shuffle); output (id, chunk_id, chunk_text,
    n_chunk_tokens).  SQL-checkable via ``generate_series`` +
    ``list_slice``.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")

    def fanout(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_cid, out_txt, out_n = [], [], [], []
        for did, t in zip(ids, texts):
            toks = t.split(" ") if t else []
            n = len(toks)
            if n == 0:
                continue
            n_chunks = max(math.ceil((n - chunk_size) / stride), 0) + 1
            for c in range(n_chunks):
                w = toks[c * stride: c * stride + chunk_size]
                out_id.append(did)
                out_cid.append(c)
                out_txt.append(" ".join(w))
                out_n.append(len(w))
        return pa.table({
            id_col: pa.array(out_id, batch.schema.field(id_col).type),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
            "n_chunk_tokens": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(fanout, batch_format="pyarrow")


def curriculum_interleave(ds, group_col: str, id_col: str,
                          weights: dict, default_weight: float = 1.0,
                          out_col: str = "mix_key"):
    """Weighted round-robin mixture ordering (curriculum interleave):
    every row gets ``mix_key = rank_within_group / weight(group)`` —
    sorting by it emits sources proportionally to their weights (a
    weight-2 source appears twice as often per unit of key space), the
    deterministic replacement for "shuffle the concatenated mixture".

    One keyed shuffle assigns within-group ranks (groups = mixture
    sources, small cardinality by construction); the key arithmetic is
    one exact-integer division per row — hash-identical to SQL
    ``row_number() OVER (PARTITION BY g ORDER BY id) / w``."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        w = float(weights.get(g[group_col].iloc[0], default_weight))
        r = np.arange(1, len(g) + 1, dtype=np.float64)
        g = g.copy()
        g[out_col] = r / w
        return g

    return ds.groupby(group_col).map_groups(rank, batch_format="pandas")


def token_budget_select(ds, group_col: str, order_col: str,
                        tokens_col: str, budget: int, id_col: str,
                        ascending: bool = False):
    """Per-group token-budget quota: in ``(order_col`` desc-by-default,
    ``id_col`` asc) order, keep each group's prefix whose cumulative
    ``tokens_col`` stays ≤ ``budget`` — the "fill N tokens per domain
    in quality order" curation rule (the data-mixture counterpart of
    stratified_first_k's row quota).

    Plan: per-batch pre-reduce then ONE ``hash(group) % P`` shuffle and
    a partition-level segment walk (ops/segment.py) — no per-key
    dispatch.  The pre-reduce prune is exact for positive token counts:
    the global selection keeps a prefix of each group's global order,
    and a batch's rows occupy the same relative order globally, so a
    row past the budget within its own batch is past it globally too.

    SQL-replayable: ``SUM(tokens) OVER (PARTITION BY g ORDER BY o DESC,
    id ROWS UNBOUNDED PRECEDING) <= budget`` — all-integer cumsum, no
    float drift."""
    import pandas as pd

    from .segment import partitioned_groups

    def quota(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or group_col not in g.columns:
            return g  # empty shuffle partition (column-less block)
        g = g.sort_values([group_col, order_col, id_col],
                          ascending=[True, ascending, True],
                          kind="mergesort")
        cum = g.groupby(group_col, sort=False)[tokens_col].cumsum()
        return g[cum <= budget]

    partial = ds.map_batches(quota, batch_format="pandas")
    return partitioned_groups(partial, group_col, quota)
