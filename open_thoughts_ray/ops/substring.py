"""Exact duplicated-substring scrubbing (suffix-array dedup family).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") remove every substring of >= 50 tokens that occurs verbatim
more than once in the corpus, using one giant suffix array.  The
reference has no cross-document substring pass at all (its scrubbing is
per-document regex only), so this is one of the brief's "operations a
large-scale training-data pipeline would need" extras.

A suffix array over 100 TB is a single global structure; the
Ray-Data-native equivalent decomposes the same decision rule by k-token
window:  a token is removed iff it is covered by some k-gram that occurs
in >= ``min_docs`` DISTINCT documents.  (Lee et al. note that removing
ALL copies of a duplicated span, rather than all-but-one, costs nothing
measurable downstream — we adopt that simplification, which also makes
the op order-independent and embarrassingly parallel after one thin
shuffle.)  Any duplicated substring of length >= k is the union of its
duplicated k-grams, so k plays the role of the suffix-array length
threshold.

Plan (two streaming passes, ONE thin shuffle — the boilerplate-line df
pattern from ops/boilerplate.py one level down, at k-gram granularity):

1. per batch, emit per-doc-DISTINCT 64-bit k-gram hashes with partial
   document-frequency counts; fold with one ``groupby(gh).sum`` — the
   shuffle carries (8-byte hash, count) only, never gram text;
2. rewrite each doc masking tokens covered by a duplicated k-gram.
   Small duplicate sets broadcast (``ray.put`` once, read per actor);
   above ``max_driver_grams`` NOTHING gram-sized reaches the driver:
   docs explode into (id, pos, gh) rows, inner-join the duplicated-hash
   Dataset, fold positions per doc with the partition-level segment
   walk (ops/segment.py), and left-join the doc spine for the rewrite.

Hash note: gram identity uses the 64-bit crc mix from ops.dedup_text
(``_h64``); the DuckDB oracle groups by the gram STRING, so the driver
gate also verifies the hash never collided at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup_text import _auto_partitions, _h64
from .joinsafe import safe_join
from .segment import partitioned_groups


def _arrow_id_type(ds, id_col: str) -> pa.DataType:
    """Arrow type of the id column — Dataset.schema().types yields
    pa.DataType for arrow-backed datasets but numpy dtypes / python
    classes for pandas-backed ones; normalize (ops/temporal.py trick)."""
    t = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def _retype_to(schema: dict[str, pa.DataType]):
    """map_batches fn: force every block (including the schema-less
    empties Ray's sort/aggregate shuffles emit, and pandas-object-dtype
    map_groups output) to exactly ``schema`` — joins need byte-identical
    key field types on both sides (ops/pairverify.retype_empty, extended
    to cast non-empty blocks too)."""

    def fix(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({k: pa.array([], v) for k, v in schema.items()})
        cols = {}
        for name, typ in schema.items():
            c = t.column(name).combine_chunks()
            if c.type != typ:
                c = c.cast(typ)
            cols[name] = c
        return pa.table(cols)

    return fix


def doc_kgrams(text: str | None, k: int) -> list[str]:
    """All overlapping k-token windows of a single-space split (matches
    SQL ``list_transform(generate_series(1, len(t)-k+1), ...)``).  Docs
    shorter than k tokens have no k-grams."""
    toks = (text or "").split(" ")
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _gram_positions(text: str | None, k: int,
                    cache: dict) -> tuple[int, list[int]]:
    """(n_tokens, [gram hash per position]) with a per-batch string→hash
    cache (duplicated grams hash once per batch)."""
    toks = (text or "").split(" ")
    n = len(toks)
    if n < k:
        return n, []
    hs = []
    for i in range(n - k + 1):
        g = " ".join(toks[i : i + k])
        h = cache.get(g)
        if h is None:
            h = _h64(g)
            cache[g] = h
        hs.append(h)
    return n, hs


def _partial_gram_df(batch: pa.Table, *, text_col: str, k: int) -> pa.Table:
    """(gh, partial document frequency) for one batch — per-doc DISTINCT
    hashes so the grouped Sum is an exact cross-document frequency (a
    gram repeated inside one doc counts once)."""
    cache: dict[str, int] = {}
    counts: dict[int, int] = {}
    for t in batch.column(text_col).to_pylist():
        _, hs = _gram_positions(t, k, cache)
        for h in set(hs):
            counts[h] = counts.get(h, 0) + 1
    return pa.table({
        "gh": pa.array(np.fromiter(counts.keys(), np.uint64,
                                   len(counts)).view(np.int64), pa.int64()),
        "c": pa.array(list(counts.values()), pa.int64()),
    })


def duplicated_gram_hashes(ds, text_col: str = "text", k: int = 5,
                           min_docs: int = 2):
    """Dataset[(gh:int64, df:int64)] of k-grams appearing in >=
    ``min_docs`` distinct documents — per-batch partials folded by one
    grouped Sum (nothing gram-sized shuffles)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        _partial_gram_df, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "k": k},
    )
    grouped = partial.groupby(
        "gh", num_partitions=_auto_partitions(None)).aggregate(
        Sum("c", alias_name="df"))
    lo = int(min_docs)
    return grouped.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("df"), lo)),
        batch_format="pyarrow",
    )


def _covered_mask(n_tokens: int, k: int, dup_starts) -> np.ndarray:
    """Boolean mask of tokens covered by any duplicated k-gram starting
    at the 0-based positions in ``dup_starts`` — the diff-array trick,
    no per-position slice loop."""
    diff = np.zeros(n_tokens + 1, np.int64)
    starts = np.asarray(dup_starts, np.int64)
    if starts.size:
        np.add.at(diff, starts, 1)
        np.add.at(diff, np.minimum(starts + k, n_tokens), -1)
    return np.cumsum(diff[:-1]) > 0


def _scrub_batch(batch: pa.Table, *, id_col: str, text_col: str, k: int,
                 out_col: str, dup: set) -> pa.Table:
    cache: dict[str, int] = {}
    out_txt, out_rm = [], []
    for t in batch.column(text_col).to_pylist():
        toks = (t or "").split(" ")
        n, hs = _gram_positions(t, k, cache)
        starts = [i for i, h in enumerate(hs) if h in dup]
        if not starts:
            out_txt.append(t or "")
            out_rm.append(0)
            continue
        mask = _covered_mask(n, k, starts)
        out_txt.append(" ".join(tok for tok, c in zip(toks, mask) if not c))
        out_rm.append(int(mask.sum()))
    return pa.table({
        id_col: batch.column(id_col),
        out_col: pa.array(out_txt, pa.string()),
        "n_removed": pa.array(out_rm, pa.int64()),
    })


def _gram_rows(batch: pa.Table, *, id_col: str, text_col: str,
               k: int) -> pa.Table:
    """Explode docs into thin (id, pos, gh) rows for the distributed
    rewrite path (no gram text ships)."""
    cache: dict[str, int] = {}
    ids_in = batch.column(id_col).to_pylist()
    ids, pos, ghs = [], [], []
    for i, t in zip(ids_in, batch.column(text_col).to_pylist()):
        _, hs = _gram_positions(t, k, cache)
        for p, h in enumerate(hs):
            ids.append(i)
            pos.append(p)
            ghs.append(h)
    return pa.table({
        id_col: pa.array(ids, batch.schema.field(id_col).type),
        "pos": pa.array(pos, pa.int64()),
        "gh": pa.array(np.asarray(ghs, np.uint64).view(np.int64), pa.int64()),
    })


def exact_substring_scrub(ds, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 5,
                          min_docs: int = 2, out_col: str = "clean_text",
                          num_partitions: int | None = None,
                          max_driver_grams: int = 1_000_000):
    """(id_col, out_col, n_removed) Dataset: every doc rewritten with the
    tokens covered by cross-document-duplicated k-grams removed, the
    rest rejoined in order.  ``n_removed`` counts scrubbed tokens; docs
    made entirely of duplicated spans survive with ``out_col = ""``."""
    import ray

    num_partitions = _auto_partitions(num_partitions)
    dup_ds = duplicated_gram_hashes(ds, text_col, k, min_docs).materialize()
    n_dup = dup_ds.count()
    kwargs = dict(id_col=id_col, text_col=text_col, k=k, out_col=out_col)
    if n_dup <= max_driver_grams:
        dup = set(
            np.asarray(dup_ds.to_pandas()["gh"], np.int64).view(np.uint64)
            .tolist()) if n_dup else set()
        if len(dup) <= 100_000:
            return ds.map_batches(_scrub_batch, batch_format="pyarrow",
                                  fn_kwargs=dict(dup=dup, **kwargs))
        ref = ray.put(dup)

        # plain tasks + per-worker broadcast cache (ops/bcast.py)
        def scrub_task(batch: pa.Table, *, ref) -> pa.Table:
            from .bcast import cached_get

            return _scrub_batch(batch, dup=cached_get(ref), **kwargs)

        return ds.map_batches(scrub_task, batch_format="pyarrow",
                              fn_kwargs={"ref": ref})

    # distributed rewrite: explode thin gram rows → inner-join the
    # duplicated-hash marker → ONE id-partitioned shuffle carrying the
    # union of docs (side 0, with text) and duplicated START POSITIONS
    # (side 1, thin) → per-PARTITION segment walk rewrites every doc in
    # place.  No second join: a left_outer join here is poisoned by the
    # schema-less empty blocks Ray's groupby shuffle can emit (the
    # pairverify retype guard can't fire — map_batches never calls its
    # fn on a zero-row block), and the asof_join-style union costs the
    # same single shuffle anyway.
    marker = dup_ds.select_columns(["gh"]).repartition(
        num_partitions).materialize()
    rows = ds.map_batches(
        _gram_rows, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, text_col=text_col, k=k),
    )
    id_type = _arrow_id_type(ds, id_col)
    hits = safe_join(rows, marker, join_type="inner", on=("gh",),
                     num_partitions=num_partitions).map_batches(
        lambda t: (pa.table({id_col: pa.array([], id_type),
                             "pos": pa.array([], pa.int64())})
                   if t.num_columns == 0  # starved join partition
                   else t.select([id_col, "pos"])),
        batch_format="pyarrow")
    union_schema = {id_col: id_type, text_col: pa.string(),
                    "pos": pa.int64(), "_side": pa.int64()}

    def doc_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col).combine_chunks().cast(id_type),
            text_col: t.column(text_col),
            "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "_side": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def hit_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            id_col: t.column(id_col).combine_chunks().cast(id_type),
            text_col: pa.array([""] * n, pa.string()),
            "pos": t.column("pos").combine_chunks().cast(pa.int64()),
            "_side": pa.array(np.ones(n, np.int64), pa.int64()),
        })

    u = ds.select_columns([id_col, text_col]).map_batches(
        doc_side, batch_format="pyarrow").union(
        hits.map_batches(hit_side, batch_format="pyarrow"))

    def rewrite_partition(g: pd.DataFrame) -> pd.DataFrame:
        # sort puts each id's doc row (side 0) before its positions
        g = g.sort_values([id_col, "_side", "pos"], kind="mergesort")
        ids = g[id_col].to_numpy()
        sides = g["_side"].to_numpy()
        texts = g[text_col].to_numpy(dtype=object)
        poss = g["pos"].to_numpy()
        bounds = np.flatnonzero(np.concatenate(
            [[True], ids[1:] != ids[:-1], [True]]))
        out_ids, out_txt, out_rm = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if sides[s] != 0:
                continue  # positions without a doc row (can't happen)
            t = texts[s] or ""
            starts = poss[s + 1 : e]
            if starts.size == 0:
                out_ids.append(ids[s])
                out_txt.append(t)
                out_rm.append(0)
                continue
            toks = t.split(" ")
            mask = _covered_mask(len(toks), k, starts)
            out_ids.append(ids[s])
            out_txt.append(
                " ".join(tok for tok, c in zip(toks, mask) if not c))
            out_rm.append(int(mask.sum()))
        return pd.DataFrame({id_col: out_ids, out_col: out_txt,
                             "n_removed": np.asarray(out_rm, np.int64)})

    return partitioned_groups(u, id_col, rewrite_partition,
                              num_partitions=num_partitions)


def flag_dup_substring_docs(ds, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 5,
                            min_docs: int = 2,
                            num_partitions: int | None = None,
                            max_driver_grams: int = 1_000_000):
    """(id_col,) Dataset of documents containing at least one k-gram that
    occurs in >= ``min_docs`` distinct documents — the screen half of
    the substring pass (route flagged docs to the scrub, pass the rest
    through untouched)."""
    import ray

    num_partitions = _auto_partitions(num_partitions)
    dup_ds = duplicated_gram_hashes(ds, text_col, k, min_docs).materialize()
    n_dup = dup_ds.count()
    if n_dup <= max_driver_grams:
        dup = set(
            np.asarray(dup_ds.to_pandas()["gh"], np.int64).view(np.uint64)
            .tolist()) if n_dup else set()
        ref = ray.put(dup)

        # plain tasks + per-worker broadcast cache (ops/bcast.py)
        def flag_task(batch: pa.Table, *, ref) -> pa.Table:
            from .bcast import cached_get

            dup_set = cached_get(ref)
            cache: dict[str, int] = {}
            keep = []
            for t in batch.column(text_col).to_pylist():
                _, hs = _gram_positions(t, k, cache)
                keep.append(any(h in dup_set for h in hs))
            return batch.select([id_col]).filter(
                pa.array(keep, pa.bool_()))

        return ds.map_batches(flag_task, batch_format="pyarrow",
                              fn_kwargs={"ref": ref})

    marker = dup_ds.select_columns(["gh"]).repartition(
        num_partitions).materialize()
    rows = ds.map_batches(
        _gram_rows, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, text_col=text_col, k=k),
    )
    id_type2 = _arrow_id_type(ds, id_col)
    hits = safe_join(rows, marker, join_type="inner", on=("gh",),
                     num_partitions=num_partitions).map_batches(
        lambda t: (pa.table({id_col: pa.array([], id_type2)})
                   if t.num_columns == 0  # starved join partition
                   else t.select([id_col])),
        batch_format="pyarrow")
    # distributed distinct: Dataset.unique() returns a driver-side list,
    # so fold per-partition instead (one dispatch per partition)
    return partitioned_groups(
        hits, id_col,
        lambda g: g.drop_duplicates(subset=[id_col]),
        num_partitions=num_partitions,
    ).map_batches(_retype_to({id_col: _arrow_id_type(ds, id_col)}),
                  batch_format="pyarrow")
