"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

Select raw-corpus documents whose hashed-n-gram distribution looks like
a small TARGET corpus: fit unigram+bigram bucket counts on both corpora
(one grouped-Sum shuffle each, driver state O(buckets)), score every raw
doc by the per-occurrence log-likelihood ratio, and keep the top-k
(optionally with seeded Gumbel noise, which makes top-k an exact sample
from the softmax of the importance weights — the paper's resampling).

The reference has no importance-resampling selection at all (its closest
surface is the fastText quality filter); this is one of the brief's
"operations a large-scale training-data pipeline would need" extras.

Exactness contract (the tfidf/js_divergence discipline):

* bucket id: first 8 hex chars of md5(feature) mod ``buckets`` — the
  repo's SQL-replayable hash (``CAST(concat('0x', substr(md5(f),1,8))
  AS UBIGINT) % B``);
* per-bucket weight: ``floor(1e6 * ln(float((ct+1)*(Nr+B)) /
  float((cr+1)*(Nt+B))))`` as int64 — add-1 smoothing keeps every
  operand an exact integer, both products are converted to float64
  BEFORE the division (matching SQL's BIGINT→DOUBLE cast, NOT Python's
  correctly-rounded int/int), and one libm ln per DISTINCT bucket is
  the only float op;
* doc score: int64 SUM of per-occurrence weights — order-free, exact.

EXACTNESS BOUND: products stay exact float64 integers only below 2^53,
i.e. while max_bucket_count · corpus_tokens < 9.007e15 (comfortably
>1e7-doc corpora at the default 65536 buckets); beyond that the score
degrades to float64 accuracy and the bit-for-bit SQL parity no longer
applies (document the bound, don't claim past it — ADVICE r3).

Scale plan: the count fold shuffles at most ``buckets`` thin (bucket,
count) rows per block; the weight table is O(buckets) on the driver,
broadcast once via ``ray.put`` and read per actor; scoring is one
embarrassingly-parallel map_batches; top-k folds per-batch partials in
a single final combine task (the bm25/ranker pattern) so nothing
corpus-sized reaches the driver.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


def _features(text: str | None) -> list[str]:
    """Unigrams + space-joined bigrams of a single-space split (one
    occurrence per POSITION, not per distinct feature — DSIR counts
    occurrences)."""
    toks = (text or "").split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(feature: str, buckets: int) -> int:
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16) % buckets


def hashed_ngram_counts(ds, text_col: str = "text", buckets: int = 65536):
    """(counts: np.ndarray[buckets] int64, total: int) — occurrence
    counts of hashed unigram+bigram features over the corpus.  One
    map_batches partial bincount + one grouped Sum; the driver holds
    O(buckets), never rows."""
    from ray.data.aggregate import Sum

    from .dedup_text import _auto_partitions

    def partial(batch: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        c = np.zeros(buckets, np.int64)
        for t in batch.column(text_col).to_pylist():
            for f in _features(t):
                b = cache.get(f)
                if b is None:
                    b = _bucket(f, buckets)
                    cache[f] = b
                c[b] += 1
        nz = np.flatnonzero(c)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "c": pa.array(c[nz], pa.int64())})

    grouped = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("b", num_partitions=_auto_partitions(None))
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()  # bounded: at most ``buckets`` rows
    )
    counts = np.zeros(buckets, np.int64)
    if len(grouped):
        counts[grouped["b"].to_numpy()] = grouped["n"].to_numpy()
    return counts, int(counts.sum())


def dsir_weight_table(target_counts: np.ndarray, n_target: int,
                      raw_counts: np.ndarray, n_raw: int) -> np.ndarray:
    """int64[buckets] per-occurrence weights: floor(1e6 · ln of the
    add-1-smoothed target/raw likelihood ratio).  math.log (scalar
    libm), not np.log — numpy's SIMD ln can differ by 1 ulp from the
    libm double DuckDB calls, and parity is the point."""
    buckets = len(target_counts)
    nt, nr = n_target + buckets, n_raw + buckets
    w = np.empty(buckets, np.int64)
    for b in range(buckets):
        num = float((int(target_counts[b]) + 1) * nr)
        den = float((int(raw_counts[b]) + 1) * nt)
        w[b] = math.floor(1e6 * math.log(num / den))
    return w


def dsir_select(ds_raw, ds_target, id_col: str = "doc_id",
                text_col: str = "text", k: int = 50,
                buckets: int = 65536, gumbel_seed: int | None = None):
    """Dataset[(id_col, dsir_score:int64)] — the ``k`` raw docs whose
    hashed-n-gram content best matches ``ds_target``'s distribution
    (ties → smaller id).  ``gumbel_seed`` switches deterministic top-k
    to the paper's Gumbel-top-k resampling: score/1e6 + Gumbel(md5(id,
    seed)) — still reproducible, no longer SQL-replayable (float sum of
    two ln's), so gate that variant rows-only."""
    import ray
    import ray.data as rd

    tc, nt = hashed_ngram_counts(ds_target, text_col, buckets)
    rc, nr = hashed_ngram_counts(ds_raw, text_col, buckets)
    ref = ray.put(dsir_weight_table(tc, nt, rc, nr))

    # plain tasks + per-worker broadcast cache (ops/bcast.py): the
    # weight table and the feature→bucket memo live once per worker
    def score_task(batch: pa.Table, *, ref) -> pa.Table:
        from .bcast import cached_build

        w, cache = cached_build(ref, lambda v: (v, {}), tag="dsir")
        ids = batch.column(id_col).to_pylist()
        out = np.zeros(len(ids), np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            s = 0
            for f in _features(t):
                b = cache.get(f)
                if b is None:
                    b = _bucket(f, buckets)
                    cache[f] = b
                s += int(w[b])
            out[i] = s
        return pa.table({
            id_col: batch.column(id_col),
            "dsir_score": pa.array(out, pa.int64()),
        })

    scored = ds_raw.map_batches(score_task, batch_format="pyarrow",
                                fn_kwargs={"ref": ref})

    if gumbel_seed is not None:
        def noisy(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            s = batch.column("dsir_score").to_numpy(zero_copy_only=False)
            key = np.empty(len(ids), np.float64)
            for i, v in enumerate(ids):
                h = hashlib.md5(f"{v}#{gumbel_seed}".encode()).hexdigest()
                u = (int(h[:13], 16) + 1) / float(1 << 52)  # u in (0, 1]
                key[i] = s[i] / 1e6 - math.log(-math.log(u))
            return batch.append_column("_key", pa.array(key, pa.float64()))

        scored = scored.map_batches(noisy, batch_format="pyarrow")
        sort_cols, out_cols = ["_key"], [id_col, "dsir_score"]
    else:
        sort_cols, out_cols = None, None

    # per-batch top-k partials + one final combine task (bm25 pattern):
    # nothing corpus-sized shuffles or reaches the driver
    def partial_topk(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        by = sort_cols or ["dsir_score", id_col]
        asc = [False] if sort_cols else [False, True]
        return pa.Table.from_pandas(
            df.sort_values(by, ascending=asc, kind="mergesort").head(k),
            preserve_index=False)

    partials = scored.map_batches(partial_topk, batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        by = sort_cols or ["dsir_score", id_col]
        asc = [False] if sort_cols else [False, True]
        out = df.sort_values(by, ascending=asc, kind="mergesort").head(k)
        if out_cols:
            out = out[out_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    # ≤ k rows per upstream block: repartition(1) is a tiny gather
    return partials.repartition(1).map_batches(
        combine, batch_format="pyarrow")
