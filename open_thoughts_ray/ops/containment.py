"""Substring-containment dedup: drop a doc that appears VERBATIM inside
another (longer) doc; among byte-identical texts keep the smallest id.

Large crawl corpora carry truncated/quoted copies of the same page; the
standard treatment (e.g. RefinedWeb-style exact-substring dedup) keeps
the most complete version.  Semantics here are exactly SQL's

    NOT EXISTS (SELECT 1 FROM t e WHERE e.id != g.id
                AND contains(e.text, g.text)
                AND (length(e.text) > length(g.text)
                     OR (length(e.text) = length(g.text)
                         AND e.id < g.id)))

so the survivor set hash-checks against a DuckDB oracle.  No union-find
is needed — "is contained in some other doc" is a per-row existential.

Candidate generation (recall 1): if g ⊆ e then EVERY char n-gram of g
occurs in e, in particular g's MINIMUM-HASH n-gram.  So the contained
side (probe) emits exactly ONE key — the min-hash of its distinct char
n-grams — while the container side (index) emits all its distinct
n-gram hashes.  A true containment pair always collides in the probe
doc's min-gram bucket; the min-hash choice spreads probes uniformly
instead of piling onto hot prefixes.  Docs shorter than ``n`` fall back
to one shared "short" bucket that every doc indexes into (exact; such
docs are pre-filter garbage in real corpora — documented cost
O(#short · N)).

Verification is C-speed ``substring in string`` on candidate pairs
only, distributed via pairverify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup_text import _auto_partitions, _drop_ids_filter, _h64

_SHORT_KEY = -(1 << 62) + 97


def _char_gram_hashes(text: str, n: int, cache: dict) -> np.ndarray:
    """Distinct char-n-gram hashes of ``text`` (uint64)."""
    grams = {text[i:i + n] for i in range(len(text) - n + 1)}
    hs = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        v = cache.get(g)
        if v is None:
            v = _h64(g)
            cache[g] = v
        hs[i] = v
    return hs


def containment_rows(batch: pa.Table, *, n: int, id_col: str,
                     text_col: str) -> pa.Table:
    """doc → (bkey, id, side) rows.  side 0 = container candidate (all
    distinct grams), side 1 = contained candidate (min gram only)."""
    ids = [str(v) for v in batch.column(id_col).to_pylist()]
    texts = batch.column(text_col).to_pylist()
    cache: dict[str, int] = {}
    keys: list[int] = []
    out_ids: list[str] = []
    sides: list[int] = []
    for doc_id, text in zip(ids, texts):
        if len(text) < n:
            # short probe; every doc below also indexes the short bucket
            keys.append(_SHORT_KEY)
            out_ids.append(doc_id)
            sides.append(1)
        else:
            hs = _char_gram_hashes(text, n, cache)
            signed = hs.view(np.int64)
            keys.extend(signed.tolist())
            out_ids.extend([doc_id] * len(signed))
            sides.extend([0] * len(signed))
            keys.append(int(signed[np.argmin(hs)]))
            out_ids.append(doc_id)
            sides.append(1)
        keys.append(_SHORT_KEY)
        out_ids.append(doc_id)
        sides.append(0)
    return pa.table({
        "bkey": pa.array(keys, pa.int64()),
        "id": pa.array(out_ids, pa.string()),
        "side": pa.array(sides, pa.int8()),
    })


def containment_partition_pairs(group: pd.DataFrame,
                                max_bucket: int = 4096) -> pa.Table:
    """(container, contained) DIRECTED candidate pairs over one hash
    partition: per bucket, index×probe cross pairs, deduped within the
    partition.  Column 'a' = container candidate, 'b' = contained."""
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
    if len(group) < 2:
        return empty
    keys = group["bkey"].to_numpy(dtype=np.int64)
    ids = group["id"].astype(str).to_numpy(dtype=object)
    sides = group["side"].to_numpy(dtype=np.int8)
    order = np.lexsort((sides, ids, keys))
    keys, ids, sides = keys[order], ids[order], sides[order]
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    seen: set = set()
    a_out, b_out = [], []
    for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
        bi, bs = ids[s:s + c], sides[s:s + c]
        idx = np.unique(bi[bs == 0])
        prb = np.unique(bi[bs == 1])
        if len(idx) == 0 or len(prb) == 0:
            continue
        if len(idx) * len(prb) > max_bucket * max_bucket:
            idx = idx[:max_bucket]  # safety valve; exactness documented
        for y in prb:
            for x in idx:
                if x == y:
                    continue
                p = (x, y)
                if p not in seen:
                    seen.add(p)
                    a_out.append(x)
                    b_out.append(y)
    if not a_out:
        return empty
    return pa.table({"a": pa.array(a_out, pa.string()),
                     "b": pa.array(b_out, pa.string())})


def containment_verify_kernel():
    """Directed drop rule on candidate pair (container a, contained b):
    True iff b's text occurs inside a's AND a is strictly longer, or the
    texts are equal-length (⇒ identical, given containment) with a's id
    numerically smaller — i.e. b is the row the SQL EXISTS drops."""

    def _lt(x: str, y: str) -> bool:
        try:
            return int(x) < int(y)
        except ValueError:
            return x < y

    def kernel(ids_a: list[str], ids_b: list[str],
               texts_a: list[str], texts_b: list[str]) -> np.ndarray:
        out = np.empty(len(ids_a), dtype=bool)
        for i, (xa, xb, a, b) in enumerate(zip(ids_a, ids_b,
                                               texts_a, texts_b)):
            out[i] = (b in a) and (len(a) > len(b) or
                                   (len(a) == len(b) and _lt(xa, xb)))
        return out

    return kernel


def containment_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                      n: int = 8, num_partitions: int | None = None,
                      max_bucket: int = 4096,
                      max_driver_drops: int = 2_000_000):
    """Drop docs contained verbatim in another doc (see module doc for
    the exact SQL-checkable rule).  Recall-1 min-gram candidates →
    distributed substring verification → drop-id set."""
    from .pairverify import anti_join_ids, verify_pairs_distributed

    num_partitions = _auto_partitions(num_partitions)
    rows = ds.select_columns([id_col, text_col]).map_batches(
        containment_rows, batch_format="pyarrow",
        fn_kwargs=dict(n=n, id_col=id_col, text_col=text_col),
    ).map_batches(
        lambda t: t.append_column(
            "part", pa.array(t.column("bkey").to_numpy(zero_copy_only=False)
                             % num_partitions, pa.int64())),
        batch_format="pyarrow",
    )
    pairs = rows.groupby("part", num_partitions=num_partitions).map_groups(
        containment_partition_pairs, batch_format="pandas",
        fn_kwargs={"max_bucket": max_bucket},
    ).materialize()
    if pairs.count() == 0:
        return ds
    # verified DIRECTED edges: the kernel applies the full drop rule
    # (containment + longer-or-equal-with-smaller-id), so edge column b
    # IS the dropped id — equal-text pairs verify in exactly one
    # direction and no union-find is needed
    edges = verify_pairs_distributed(
        pairs, ds, id_col, text_col, containment_verify_kernel(),
        num_partitions, with_ids=True,
    )
    drop_ds = edges.map_batches(
        lambda t: pa.table({"id": t.column("b")}),
        batch_format="pyarrow").materialize()
    n_drops = drop_ds.count()
    if n_drops == 0:
        return ds
    if n_drops <= max_driver_drops:
        drop = set(drop_ds.to_pandas()["id"])
        return _drop_ids_filter(ds, id_col, drop)
    return anti_join_ids(ds, id_col, drop_ds, num_partitions)
