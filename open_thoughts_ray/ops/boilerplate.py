"""Corpus-frequency boilerplate-line removal (C4 / CCNet-style).

C4 (Raffel et al. 2020 §2.2) drops any three-sentence span occurring
more than once in the corpus; CCNet prunes lines by document frequency.
The reference scrubs per-document only (its quality rules never look
across documents), so this is one of the brief's "operations a
large-scale training-data pipeline would need" extras.

Ray-Data-first plan, two streaming passes and ONE thin shuffle:

1. explode each doc into "lines" (fixed ``line_tokens``-token windows —
   the synthetic corpus has no newlines; pass ``line_tokens=None`` on
   real crawls to split on ``"\\n"``), emit per-batch PARTIAL document
   frequencies keyed by a 64-bit line hash (a doc's row lives in exactly
   one batch, so per-batch-distinct sums are exact global df), and fold
   them with one ``groupby(line_hash).sum`` — the shuffle carries only
   (8-byte hash, count), never line text;
2. rewrite each doc dropping lines whose df ≥ ``min_df``.  Small
   frequent sets broadcast (``ray.put`` once, read per actor); above
   ``max_driver_lines`` — an adversarial corpus where boilerplate is
   O(vocab) — NOTHING line-sized reaches the driver: docs explode into
   (id, pos, line) rows, anti-join the frequent-hash Dataset, and
   reassemble with one ``groupby(doc_id)`` ordered string-agg.

Hash note: line identity uses the 64-bit crc mix from ops.dedup_text
(_h64); collision odds over a 10^12-line crawl are ~10^24/2^65 ≈ 3%,
acceptable for boilerplate pruning (a collision drops one extra line).
The DuckDB oracle groups by the line STRING, so the driver gate also
verifies the hash never collided at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup_text import _auto_partitions, _h64
from .joinsafe import safe_join


def doc_lines(text: str | None, line_tokens: int | None = 6) -> list[str]:
    """Deterministic line split: ``line_tokens``-token windows over a
    single-space split (matches SQL ``list_slice(string_split(t,' '))``),
    or raw ``"\\n"`` lines when ``line_tokens`` is None."""
    t = text or ""
    if line_tokens is None:
        return t.split("\n")
    toks = t.split(" ")
    k = int(line_tokens)
    return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]


def _joiner(line_tokens: int | None) -> str:
    return "\n" if line_tokens is None else " "


def _partial_df_rows(batch: pa.Table, *, text_col: str,
                     line_tokens: int | None) -> pa.Table:
    """(line_hash, partial document frequency) for one batch.  Hashes
    are cached per unique line string across the batch."""
    cache: dict[str, int] = {}
    counts: dict[int, int] = {}
    for t in batch.column(text_col).to_pylist():
        seen: set[int] = set()
        for ln in doc_lines(t, line_tokens):
            h = cache.get(ln)
            if h is None:
                h = _h64(ln)
                cache[ln] = h
            seen.add(h)
        for h in seen:
            counts[h] = counts.get(h, 0) + 1
    return pa.table({
        "lh": pa.array(np.fromiter(counts.keys(), np.uint64,
                                   len(counts)).view(np.int64), pa.int64()),
        "c": pa.array(list(counts.values()), pa.int64()),
    })


def frequent_line_hashes(ds, text_col: str = "text",
                         line_tokens: int | None = 6, min_df: int = 2):
    """Dataset[(lh:int64, df:int64)] of lines whose corpus document
    frequency reaches ``min_df`` — partial per-batch counts folded by one
    grouped Sum (nothing line-sized shuffles)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        _partial_df_rows, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "line_tokens": line_tokens},
    )
    grouped = partial.groupby(
        "lh", num_partitions=_auto_partitions(None)).aggregate(
        Sum("c", alias_name="df"))
    lo = int(min_df)
    return grouped.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("df"), lo)),
        batch_format="pyarrow",
    )


def _rewrite_batch(batch: pa.Table, *, id_col: str, text_col: str,
                   line_tokens: int | None, out_col: str,
                   drop: set) -> pa.Table:
    cache: dict[str, int] = {}
    out = []
    for t in batch.column(text_col).to_pylist():
        kept = []
        for ln in doc_lines(t, line_tokens):
            h = cache.get(ln)
            if h is None:
                h = _h64(ln)
                cache[ln] = h
            if h not in drop:
                kept.append(ln)
        out.append(_joiner(line_tokens).join(kept))
    return pa.table({id_col: batch.column(id_col),
                     out_col: pa.array(out, pa.string())})


def _line_rows(batch: pa.Table, *, id_col: str, text_col: str,
               line_tokens: int | None) -> pa.Table:
    """Explode docs into (id, pos, line, lh) rows for the distributed
    rewrite path."""
    ids_in = batch.column(id_col).to_pylist()
    cache: dict[str, int] = {}
    ids, pos, lines, lhs = [], [], [], []
    for i, t in zip(ids_in, batch.column(text_col).to_pylist()):
        for p, ln in enumerate(doc_lines(t, line_tokens)):
            h = cache.get(ln)
            if h is None:
                h = _h64(ln)
                cache[ln] = h
            ids.append(i)
            pos.append(p)
            lines.append(ln)
            lhs.append(h)
    return pa.table({
        id_col: pa.array(ids, batch.schema.field(id_col).type),
        "pos": pa.array(pos, pa.int64()),
        "line": pa.array(lines, pa.string()),
        "lh": pa.array(np.asarray(lhs, np.uint64).view(np.int64), pa.int64()),
    })


def dedup_lines_within_doc(ds, id_col: str = "doc_id",
                           text_col: str = "text",
                           line_tokens: int | None = 6,
                           out_col: str = "dedup_text"):
    """Intra-document line dedup (CCNet paragraph dedup within a page):
    keep the FIRST occurrence of every line inside each doc, preserve
    order, rejoin.  Pure ``map_batches`` — the rule is doc-local, so no
    shuffle and no state; SQL replay is ``row_number() OVER (PARTITION
    BY doc, line ORDER BY pos) = 1`` + ordered string_agg."""
    joiner = _joiner(line_tokens)

    def rewrite(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            seen: set[str] = set()
            kept = []
            for ln in doc_lines(t, line_tokens):
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            out.append(joiner.join(kept))
        return pa.table({id_col: batch.column(id_col),
                         out_col: pa.array(out, pa.string())})

    return ds.map_batches(rewrite, batch_format="pyarrow")


def remove_boilerplate_lines(ds, id_col: str = "doc_id",
                             text_col: str = "text",
                             line_tokens: int | None = 6, min_df: int = 2,
                             out_col: str = "clean_text",
                             num_partitions: int | None = None,
                             max_driver_lines: int = 1_000_000):
    """(id_col, out_col) Dataset: every doc rewritten with its
    corpus-frequent lines (document frequency ≥ ``min_df``) removed,
    remaining lines rejoined in order.  Docs whose every line is
    boilerplate survive with ``out_col = ""``."""
    import ray

    num_partitions = _auto_partitions(num_partitions)
    freq = frequent_line_hashes(ds, text_col, line_tokens,
                                min_df).materialize()
    n_freq = freq.count()
    if n_freq <= max_driver_lines:
        drop = set(
            np.asarray(freq.to_pandas()["lh"], np.int64).view(np.uint64)
            .tolist()) if n_freq else set()
        kwargs = dict(id_col=id_col, text_col=text_col,
                      line_tokens=line_tokens, out_col=out_col)
        if len(drop) <= 100_000:
            return ds.map_batches(_rewrite_batch, batch_format="pyarrow",
                                  fn_kwargs=dict(drop=drop, **kwargs))
        ref = ray.put(drop)

        # plain tasks + per-worker broadcast cache (ops/bcast.py): the
        # (1, 8) actor pool never grew past 1 actor and paid its spawn
        def rewrite_task(batch: pa.Table, *, ref) -> pa.Table:
            from .bcast import cached_get

            return _rewrite_batch(batch, drop=cached_get(ref), **kwargs)

        return ds.map_batches(rewrite_task, batch_format="pyarrow",
                              fn_kwargs={"ref": ref})

    # distributed rewrite: explode → anti-join frequent hashes →
    # reassemble per doc (ordered string_agg), then left-join the doc
    # spine so all-boilerplate docs come back as ""
    marker = freq.map_batches(
        lambda t: pa.table({"lh": t.column("lh"),
                            "__freq": pa.array([True] * t.num_rows,
                                               pa.bool_())}),
        batch_format="pyarrow",
    ).repartition(num_partitions).materialize()
    rows = ds.map_batches(
        _line_rows, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, text_col=text_col,
                       line_tokens=line_tokens),
    )
    def _keep_unmarked(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # starved join partition (zero-field)
            return pa.table({id_col: pa.array([], pa.int64()),
                             "line_no": pa.array([], pa.int64()),
                             "line": pa.array([], pa.string()),
                             "lh": pa.array([], pa.int64())})
        return t.filter(pc.is_null(t.column("__freq")))             .drop_columns(["__freq"])

    try:
        _id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        _id_type = pa.int64()
    kept = safe_join(
        rows, marker, join_type="left_outer", on=("lh",),
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, _id_type),
                               ("line_no", pa.int64()),
                               ("line", pa.string()),
                               ("lh", pa.int64())]),
        right_schema=pa.schema([("lh", pa.int64()),
                                ("__freq", pa.bool_())])).map_batches(
        _keep_unmarked, batch_format="pyarrow")
    joiner = _joiner(line_tokens)

    def add_doc_part(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if pa.types.is_integer(col.type):
            part = col.to_numpy(zero_copy_only=False) % num_partitions
        else:
            import zlib

            part = np.asarray([zlib.crc32(str(v).encode()) % num_partitions
                               for v in col.to_pylist()], np.int64)
        return t.append_column("_part", pa.array(part.astype(np.int64),
                                                 pa.int64()))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        # PARTITION-level: one dispatch per partition, docs walked as
        # sorted segments (a per-doc map_groups pays one pandas dispatch
        # per document at crawl scale)
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy()
        lines = g["line"].to_numpy(dtype=object)
        bounds = np.flatnonzero(np.concatenate(
            [[True], ids[1:] != ids[:-1], [True]]))
        out_ids, out_txt = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            out_ids.append(ids[s])
            out_txt.append(joiner.join(lines[s:e]))
        return pd.DataFrame({id_col: out_ids, out_col: out_txt})

    rebuilt = kept.map_batches(add_doc_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(reassemble, batch_format="pandas")
    spine = ds.select_columns([id_col])
    joined = safe_join(
        spine, rebuilt, join_type="left_outer", on=(id_col,),
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, _id_type)]),
        right_schema=pa.schema([(id_col, _id_type),
                                (out_col, pa.string())]))
    return joined.map_batches(
        lambda t: (pa.table({id_col: pa.array([], _id_type),
                             out_col: pa.array([], pa.string())})
                   if t.num_columns == 0
                   else pa.table({id_col: t.column(id_col),
                                  out_col: pc.fill_null(t.column(out_col),
                                                        "")})),
        batch_format="pyarrow",
    )
