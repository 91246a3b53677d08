"""Distributed BM25 full-text retrieval over a documents table.

The sparse-lexical counterpart of ``ops/similarity.ann_topk``: score
every document against a small broadcast set of keyword queries with
BM25 (Robertson/Sparck-Jones; the ``ln((N-df+0.5)/(df+0.5)+1)`` BM25+
idf that is always positive) and return the global top-k per query.

Two streaming passes over the pruned (id, text) projection — the
classic BM25 shape:

1. **stats pass** — each batch emits ONE partial row
   ``(n_docs, sum_dl, df_0..df_{T-1})``; ``Dataset.sum`` folds the
   partials, so nothing per-document crosses the cluster (the shuffle
   payload is O(#blocks × T) ints).  idf / avgdl are computed on the
   driver from those totals (T doubles).
2. **score pass** — per batch, term frequencies for the broadcast term
   list only, vectorized BM25 in float64, per-batch top-k candidates
   per query (score desc, id asc), then a final
   ``groupby(query_id).map_groups`` top-k combine — identical partial
   top-k plan to ``ann_topk``; at most Q·k rows per block enter the
   final tiny shuffle.

Scores are emitted as integer micro-units (``floor(score · 1e6)`` per
TERM, summed as int64) so the result is bit-reproducible in ANSI SQL:
float addition order never matters, and every float expression keeps
the exact parenthesization the DuckDB oracle uses.

Reference semantics: the retrieval/ranking stage of the curation stack
(SURVEY.md §2 'similarity search' extras); no single reference file —
BM25 per Robertson et al., TREC-3.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

K1 = 1.2
B = 0.75


def _term_freqs(texts: list, terms: list[str]):
    """(tf matrix [n_docs × T] int64, dl vector int64) for the
    broadcast term list.  Per-token dict lookup — the term list is
    tiny, the split dominates."""
    idx = {t: j for j, t in enumerate(terms)}
    tf = np.zeros((len(texts), len(terms)), dtype=np.int64)
    dl = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else []
        dl[i] = len(toks)
        row = tf[i]
        for tok in toks:
            j = idx.get(tok)
            if j is not None:
                row[j] += 1
    return tf, dl


def corpus_term_stats(ds, terms: list[str], text_col: str = "text"):
    """One streaming pass → ``(n_docs, sum_dl, df)`` with ``df`` an
    int64 vector aligned to ``terms``.  Distributed partial sums; the
    driver sees T+2 integers."""
    terms = list(terms)

    def partials(batch: pa.Table) -> pa.Table:
        tf, dl = _term_freqs(batch.column(text_col).to_pylist(), terms)
        cols = {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        present = (tf > 0).sum(axis=0)
        for j in range(len(terms)):
            cols[f"df_{j}"] = pa.array([int(present[j])], pa.int64())
        return pa.table(cols)

    part = ds.map_batches(partials, batch_format="pyarrow")
    sums = part.sum(["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))])
    n_docs = int(sums["sum(n_docs)"])
    sum_dl = int(sums["sum(sum_dl)"])
    df = np.asarray([int(sums[f"sum(df_{j})"]) for j in range(len(terms))],
                    dtype=np.int64)
    return n_docs, sum_dl, df


def bm25_topk(ds, queries: dict[int, list[str]], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              stats=None):
    """Dataset[(query_id, doc_id, score_micro, rank)] — global BM25
    top-k per query, ties broken (score desc, id asc).

    ``queries`` maps query_id → list of distinct terms.  ``ds`` must be
    pruned to (id_col, text_col); it is consumed twice (stats pass +
    score pass) unless precomputed ``stats`` is passed.
    """
    import pandas as pd

    terms = sorted({t for ts in queries.values() for t in ts})
    if stats is None:
        stats = corpus_term_stats(ds, terms, text_col=text_col)
    n_docs, sum_dl, df = stats
    # driver-side constants; expressions mirror the SQL oracle exactly
    avgdl = float(sum_dl) / float(n_docs)
    idf = np.asarray(
        [math.log((n_docs - int(d) + 0.5) / (int(d) + 0.5) + 1.0) for d in df],
        dtype=np.float64,
    )
    qterm_idx = {qid: np.asarray([terms.index(t) for t in ts], dtype=np.int64)
                 for qid, ts in queries.items()}

    def score(batch: pa.Table) -> pa.Table:
        tf, dl = _term_freqs(batch.column(text_col).to_pylist(), terms)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        tff = tf.astype(np.float64)
        dlf = dl.astype(np.float64)
        # per-TERM micro contribution, then integer sum → order-free
        denom = tff + (K1 * ((1.0 - B) + B * dlf / avgdl))[:, None]
        contrib = idf[None, :] * (tff * (K1 + 1.0)) / denom
        micro = np.floor(contrib * 1000000.0).astype(np.int64)
        micro[tf == 0] = 0
        out_q, out_id, out_s = [], [], []
        for qid, cols in qterm_idx.items():
            hit = (tf[:, cols] > 0).any(axis=1)
            if not hit.any():
                continue
            scores = micro[:, cols].sum(axis=1)
            rows = np.flatnonzero(hit)
            # per-batch partial top-k with the FINAL tie-break so the
            # global winner set is a subset of the partials
            sub_scores = scores[rows]
            sub_ids = ids[rows]
            order = np.lexsort((sub_ids, -sub_scores))[:k]
            for i in order:
                out_q.append(qid)
                out_id.append(int(sub_ids[i]))
                out_s.append(int(sub_scores[i]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "score_micro": pa.array(out_s, pa.int64()),
        })

    cand = ds.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_micro", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "doc_id", "score_micro", "rank"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")
