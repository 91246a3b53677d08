"""Distributed dedup operators: exact keep-first + phash-banded near-dup.

The reference's dedup family re-expressed Ray-Data-first (SURVEY.md §2.8):

* exact dedup (`dedup_on_columns`, commons.py:344-371) →
  ``groupby(key).map_groups(keep first)`` with a deterministic winner
  (min order column), independent of arrival order.
* fuzzy / FAISS near-dup (open_thoughts/deduplicate.py:12-55,
  similarity_filtering_operator.py:42-205 — both order-dependent O(N²)) →
  deterministic banded-LSH collapse over the 64-bit phash:

  1. explode each row into ``bands`` (band_id, band_value) keys
     (equal-width bit slices; any pair within Hamming ≤ 64/bands·... —
     by pigeonhole, pairs with Hamming < bands must share ≥1 band; wider
     tolerance pairs are found when any band happens to agree),
  2. ``groupby(band_key)`` shuffle co-locates candidates,
  3. within a bucket, verify Hamming ≤ t over all pairs (buckets above
     ``max_bucket`` fall back to a sorted neighbor window — deterministic
     skew cap; hot-bucket salting analogue),
  4. union-find over the verified edge list → canonical = min image_id.

  Scale notes: the edge list is O(#near-dups), orders of magnitude
  smaller than the input; it is collected to the driver here.  At 10^12
  rows replace step 4 with iterative min-label propagation
  (label_propagation below implements it with pure Dataset ops) and size
  ``bands`` so expected bucket size stays O(100).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..common.hashing import int64_to_uint64
from .joinsafe import safe_join

BAND_BITS = {1: 64, 2: 32, 4: 16, 8: 8}


def band_explode_batch(batch: pa.Table, bands: int, id_col: str = "image_id",
                       phash_col: str = "phash") -> pa.Table:
    """Explode rows → (band_key, id, phash_u64) candidate rows.

    band_key packs (band_id, band_value) into one int64:
    ``band_id * 2^width + value`` — a single groupby key.
    """
    width = BAND_BITS[bands]
    ids = batch.column(id_col)
    ph = int64_to_uint64(batch.column(phash_col).to_numpy(zero_copy_only=False))
    n = len(ph)
    mask = np.uint64((1 << width) - 1)
    keys = np.empty(n * bands, dtype=np.int64)
    for b in range(bands):
        vals = (ph >> np.uint64(b * width)) & mask
        keys[b * n : (b + 1) * n] = (np.int64(b) << np.int64(width)) | vals.astype(np.int64)
    out_ids = pa.concat_arrays([ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * bands)
    ph_i64 = np.tile(ph.view(np.int64), bands)
    return pa.table(
        {
            "band_key": pa.array(keys, pa.int64()),
            "id": out_ids,
            "phash": pa.array(ph_i64, pa.int64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def bucket_pairs(group: pd.DataFrame, hamming_max: int, max_bucket: int = 512,
                 window: int = 64) -> pa.Table:
    """Verified near-dup edges within one band bucket (deterministic).

    Returns an explicit-schema Arrow table so empty groups don't produce
    null-typed columns."""
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    if len(group) < 2:
        return empty
    ph = group["phash"].to_numpy(dtype=np.int64).view(np.uint64)
    ids = group["id"].to_numpy(dtype=object)
    order = np.lexsort((ids, ph))
    ph, ids = ph[order], ids[order]
    n = len(ph)
    edges_a, edges_b = [], []
    if n <= max_bucket:
        # all pairs, vectorized per anchor row
        for i in range(n - 1):
            d = _popcount64(np.bitwise_xor(ph[i + 1 :], ph[i]))
            hits = np.nonzero(d <= hamming_max)[0]
            for j in hits:
                edges_a.append(ids[i])
                edges_b.append(ids[i + 1 + j])
    else:
        for i in range(n - 1):
            hi = min(n, i + 1 + window)
            d = _popcount64(np.bitwise_xor(ph[i + 1 : hi], ph[i]))
            hits = np.nonzero(d <= hamming_max)[0]
            for j in hits:
                edges_a.append(ids[i])
                edges_b.append(ids[i + 1 + j])
    if not edges_a:
        return empty
    return pa.table({"a": pa.array([str(x) for x in edges_a], pa.string()),
                     "b": pa.array([str(x) for x in edges_b], pa.string())})


def union_find_canonical(edges_a: list, edges_b: list) -> dict:
    """Driver-side union-find → {member_id: canonical_min_id}; only nodes
    that belong to a ≥2 component appear."""
    parent: dict = {}

    def find(x):
        p = parent.setdefault(x, x)
        while p != parent[p]:
            parent[p] = parent[parent[p]]
            p = parent[p]
        parent[x] = p
        return p

    for a, b in zip(edges_a, edges_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def partition_pairs(group: pd.DataFrame, hamming_max: int,
                    max_bucket: int = 512, window: int = 64,
                    bands: int = 4) -> pa.Table:
    """Pair-finding over a whole hash partition of band rows.

    One partition holds MANY band buckets (part = band_key % P), so bucket
    boundaries are found vectorized with np.unique and only buckets with
    ≥2 members pay any per-bucket Python cost — crucial when nearly every
    bucket is a singleton (the common case).

    Every detecting band emits the pair.  (An earlier "emit only from the
    lowest agreeing band" optimization silently LOST edges when the lowest
    band's bucket was oversized and the pair fell outside its neighbor
    window there — the lowest band's bucket size is not knowable from a
    different partition, so no local suppression is safe.)  Duplicate
    edges across bands are ≤ bands× on true dup pairs only; union-find /
    label propagation absorb them, and the local per-bucket emit below is
    already unique within a band."""
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    n = len(group)
    if n < 2:
        return empty
    keys = group["band_key"].to_numpy(dtype=np.int64)
    ph = group["phash"].to_numpy(dtype=np.int64).view(np.uint64)
    ids = group["id"].to_numpy(dtype=object)
    order = np.lexsort((ids, ph, keys))
    keys, ph, ids = keys[order], ph[order], ids[order]
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    a_out: list = []
    b_out: list = []

    def emit(i: int, lo: int, hi_: int, bp, bi) -> None:
        d = _popcount64(np.bitwise_xor(bp[lo:hi_], bp[i]))
        for j in np.nonzero(d <= hamming_max)[0]:
            a_out.append(bi[i])
            b_out.append(bi[lo + j])

    for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
        bp = ph[s : s + c]
        bi = ids[s : s + c]
        m = int(c)
        if m <= max_bucket:
            for i in range(m - 1):
                emit(i, i + 1, m, bp, bi)
        else:
            for i in range(m - 1):
                emit(i, i + 1, min(m, i + 1 + window), bp, bi)
    if not a_out:
        return empty
    return pa.table({"a": pa.array([str(x) for x in a_out], pa.string()),
                     "b": pa.array([str(x) for x in b_out], pa.string())})


def near_dup_edges(kept, bands: int, hamming_max: int,
                   max_bucket: int = 512, window: int = 64,
                   num_partitions: int = 64):
    """Dataset[(image_id, phash)] → verified edge Dataset[a,b] via the
    banded shuffle.  ``kept`` should already be projected to the two
    columns.

    The shuffle key is ``part = band_key % P`` (P ≈ total cores), NOT the
    raw band_key: a groupby on the raw key creates millions of singleton
    groups whose per-group dispatch dominates; partition-level grouping
    keeps the same candidate set (band buckets never straddle partitions)
    with vectorized bucket detection inside each partition."""

    def add_part(t: pa.Table) -> pa.Table:
        part = t.column("band_key").to_numpy(zero_copy_only=False) % num_partitions
        return t.append_column("part", pa.array(part.astype(np.int64), pa.int64()))

    exploded = kept.map_batches(
        band_explode_batch, batch_format="pyarrow",
        fn_kwargs={"bands": bands},
    ).map_batches(add_part, batch_format="pyarrow")
    # num_partitions caps the hash-shuffle fan-out (Ray's default 200
    # aggregator partitions are pure fixed cost at P ≈ cores)
    return exploded.groupby("part", num_partitions=num_partitions).map_groups(
        partition_pairs, batch_format="pandas",
        fn_kwargs={"hamming_max": hamming_max, "max_bucket": max_bucket,
                   "window": window, "bands": bands},
    )


def near_dup_canonical_map(kept, bands: int, hamming_max: int,
                           max_bucket: int = 512, window: int = 64,
                           num_partitions: int = 64, edges=None) -> dict:
    """{image_id: canonical} for every dup-component member, via driver
    union-find over the O(#dups) edge list.  The flagship switches to
    edges_to_labels() (distributed label propagation) above an edge-count
    threshold — see pipeline.dedup_stage."""
    if edges is None:
        edges = near_dup_edges(kept, bands, hamming_max, max_bucket, window,
                               num_partitions)
    edf = edges.to_pandas()
    if edf.empty or "a" not in edf.columns:  # no candidates at all
        return {}
    return union_find_canonical(edf["a"].tolist(), edf["b"].tolist())


def edges_to_labels(edges, num_partitions: int = 16):
    """Edge Dataset[a,b] → Dataset[id,label] restricted to demoted
    members (label < id), ready for a join against the full table.
    Fully distributed: node extraction, propagation, and the final
    filter are all Dataset ops."""
    nodes = edges.map_batches(
        lambda t: pa.table({"id": pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()])}),
        batch_format="pyarrow",
    )
    labels = label_propagation(nodes, edges, num_partitions=num_partitions)
    import pyarrow.compute as pc

    return labels.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("label"), t.column("id"))),
        batch_format="pyarrow",
    )


def _labels_checksum(labels) -> int:
    """Order-independent 64-bit checksum of a Dataset[id,label] — the only
    value that ever reaches the driver in label_propagation (8 bytes)."""
    import zlib

    def chk(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_pylist()
        lbl = t.column("label").to_pylist()
        s = sum(zlib.crc32(f"{i}\x00{l}".encode()) for i, l in zip(ids, lbl))
        return pa.table({"chk": pa.array([s], pa.int64())})

    out = labels.map_batches(chk, batch_format="pyarrow").sum("chk")
    return int(out or 0)


def label_propagation(nodes, edges, max_iters: int = 20,
                      num_partitions: int = 16):
    """Distributed connected components via min-label propagation — the
    scale path replacing driver union-find at 10^12 rows.

    nodes: Dataset[id:string]; edges: Dataset[a,b].  Per round: one hash
    join (current labels onto edge endpoints) + one groupby-min — both
    distributed shuffles over the O(#dups)-sized dup graph — followed by
    a POINTER-DOUBLING pass (label := label's label), so convergence
    takes ≈ log2(diameter) rounds instead of diameter rounds: chain
    components of diameter 2^20 converge inside the default max_iters
    (ADVICE r2: plain one-hop propagation under-converged on chains
    longer than max_iters and silently returned extra survivors).  The
    only driver-side state is an 8-byte change checksum per round.
    Raises RuntimeError if the checksum is still moving after
    ``max_iters`` rounds — never returns under-converged labels.
    Returns Dataset[id, label] with label = min id of the component.
    """
    # canonical unique node set → initial label = own id.  The trailing
    # repartition after every groupby matters: Ray's hash-shuffle
    # aggregator emits schema-LESS empty blocks for untouched partitions,
    # and a zero-field block poisons the next join's right side
    # (pyarrow: "No match for FieldRef").  Repartition rebuilds blocks as
    # slices of typed tables.
    _typed_empty = pa.table({"id": pa.array([], pa.string()),
                             "label": pa.array([], pa.string())})

    def _init_label(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty aggregator block
            return _typed_empty
        return pa.table({"id": t.column("id"), "label": t.column("id")})

    labels = (
        nodes.groupby("id").count()
        .map_batches(_init_label, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    # The edge table needs the SAME typed-empty repartition treatment as
    # labels: upstream groupby/map_groups emits schema-LESS empty blocks
    # for untouched partitions (r4 driver gate: at num_cpus=32 one such
    # block reached the join's LEFT side and pyarrow threw "No match for
    # FieldRef.Name(nbr)").  Guard the map (in case an empty block IS
    # handed to the fn) and repartition so every block is a slice of a
    # typed table before it feeds a join.
    _typed_empty_sym = pa.table({"id": pa.array([], pa.string()),
                                 "nbr": pa.array([], pa.string())})

    def _symmetrize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty aggregator block
            return _typed_empty_sym
        return pa.table(
            {"id": pa.concat_arrays([t.column("a").combine_chunks(), t.column("b").combine_chunks()]),
             "nbr": pa.concat_arrays([t.column("b").combine_chunks(), t.column("a").combine_chunks()])}
        )

    sym = (
        edges.map_batches(_symmetrize, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    if sym.count() == 0:
        return labels
    prev_chk = _labels_checksum(labels)
    for it in range(max_iters):
        nbr_labels = labels.map_batches(
            lambda t: pa.table({"nbr": t.column("id"), "cand": t.column("label")}),
            batch_format="pyarrow",
        )
        cand = safe_join(
            sym, nbr_labels, join_type="inner", on=("nbr",),
            num_partitions=num_partitions,
            left_schema=pa.schema([("id", pa.string()),
                                   ("nbr", pa.string())]),
            right_schema=pa.schema([("nbr", pa.string()),
                                    ("cand", pa.string())]),
        ).map_batches(
            lambda t: (pa.table({"id": pa.array([], pa.string()),
                                 "cand": pa.array([], pa.string())})
                       if t.num_columns == 0  # starved join partition
                       else t.select(["id", "cand"])),
            batch_format="pyarrow")
        self_cand = labels.map_batches(
            lambda t: pa.table({"id": t.column("id"), "cand": t.column("label")}),
            batch_format="pyarrow",
        )
        mins = cand.union(self_cand).groupby("id").min("cand")

        def _relabel(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:  # schema-less empty aggregator block
                return _typed_empty
            return pa.table({"id": t.column("id"),
                             "label": t.column(t.schema.names[-1])})

        labels = mins.map_batches(
            _relabel, batch_format="pyarrow").repartition(num_partitions)
        if it >= 3:
            # pointer doubling: label := label(label), so rounds ≈
            # log2(diameter) once engaged.  Gated behind round 3: phash /
            # LSH dup components are star-like and converge in 2-3 plain
            # rounds — paying the extra join every round doubles the
            # common-case fixed cost for nothing; long chains (the
            # ADVICE case) hit the gate and still finish ≪ max_iters.
            # A label is always itself a node id, so the self-join
            # resolves; left_outer + coalesce guards the missing case.
            lbl_of = labels.map_batches(
                lambda t: pa.table({"label": t.column("id"),
                                    "label2": t.column("label")}),
                batch_format="pyarrow",
            )
            labels = (
                safe_join(labels, lbl_of, join_type="left_outer",
                          on=("label",), num_partitions=num_partitions,
                          left_schema=pa.schema([("id", pa.string()),
                                                 ("label", pa.string())]),
                          right_schema=pa.schema([("label", pa.string()),
                                                  ("label2", pa.string())]))
                .map_batches(
                    lambda t: (_typed_empty if t.num_columns == 0
                               else pa.table({
                                   "id": t.column("id"),
                                   "label": pc.coalesce(
                                       t.column("label2"),
                                       t.column("label")),
                               })),
                    batch_format="pyarrow",
                )
                .repartition(num_partitions)
            )
        labels = labels.materialize()
        chk = _labels_checksum(labels)
        if chk == prev_chk:
            break
        prev_chk = chk
    else:
        raise RuntimeError(
            f"label_propagation did not converge in {max_iters} rounds "
            "(checksum still changing) — refusing to return "
            "under-converged component labels")
    return labels


# ----------------------------------------------------------------- exact
def add_hash_column(batch: pa.Table, cols: list[str], out: str = "_key_hash") -> pa.Table:
    """Stable content hash over ``cols`` (reference: xxhash32 over joined
    values, group_by_operator.py:99-104) — vectorized via zlib.crc32."""
    import zlib

    parts = [batch.column(c).to_pylist() for c in cols]
    h = [zlib.crc32("|".join(str(v) for v in row).encode()) for row in zip(*parts)]
    return batch.append_column(out, pa.array(np.asarray(h, dtype=np.int64), pa.int64()))


def exact_dedup(ds, key_cols: list[str], order_col: str,
                num_partitions: int = 64):
    """Keep-first exact dedup: deterministic winner = min(order_col) per
    key group (commons.py:344-371 semantics, made order-independent).

    Shuffle key is ``_key_hash % P`` (partition-level), NOT the raw
    content hash: a near-unique hash makes almost every group a
    singleton, and groupby(raw).map_groups pays one Python/pandas
    dispatch per row.  Hash-partitioning co-locates every row of a key,
    so one vectorized pandas drop-duplicates per PARTITION gives the
    same result with P dispatches total (same trick as
    near_dup_canonical_map's partition_pairs)."""
    hashed = ds.map_batches(
        add_hash_column, batch_format="pyarrow", fn_kwargs={"cols": key_cols}
    ).map_batches(
        lambda t: t.append_column(
            "_part",
            pa.array(t.column("_key_hash").to_numpy(zero_copy_only=False)
                     % num_partitions, pa.int64()),
        ),
        batch_format="pyarrow",
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([order_col], kind="mergesort")
            .drop_duplicates(subset=key_cols, keep="first")
        )

    return (
        hashed.groupby("_part")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["_key_hash", "_part"])
    )


def dedup_keep_best(ds, key_cols: list[str], best_cols: list[str],
                    ascending: list[bool] | None = None,
                    num_partitions: int = 64):
    """Keep-BEST exact dedup: per key group the winner is the row with
    the greatest ``best_cols`` tuple (``ascending`` flips per column;
    default all-descending, i.e. max wins; append the id ascending for a
    deterministic tie-break).  SQL ``row_number() OVER (PARTITION BY key
    ORDER BY ...) = 1`` semantics — the "keep the highest-quality
    representative per duplicate cluster" rule a curation pipeline runs
    instead of keep-first (exact_dedup).  Same partition-level plan:
    one ``_key_hash % P`` shuffle, one vectorized pandas pass per
    PARTITION — no per-singleton-group dispatch."""
    if ascending is None:
        ascending = [False] * len(best_cols)
    hashed = ds.map_batches(
        add_hash_column, batch_format="pyarrow", fn_kwargs={"cols": key_cols}
    ).map_batches(
        lambda t: t.append_column(
            "_part",
            pa.array(t.column("_key_hash").to_numpy(zero_copy_only=False)
                     % num_partitions, pa.int64()),
        ),
        batch_format="pyarrow",
    )

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(list(best_cols), ascending=list(ascending),
                          kind="mergesort")
            .drop_duplicates(subset=key_cols, keep="first")
        )

    return (
        hashed.groupby("_part")
        .map_groups(keep_best, batch_format="pandas")
        .drop_columns(["_key_hash", "_part"])
    )


def bow_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                          out: str = "bow_fp") -> pa.Table:
    """md5 of the doc's SORTED token multiset ("bag-of-words
    fingerprint") — catches token-shuffled near-dups that exact text
    dedup misses, while staying an EXACT key (SQL:
    ``md5(array_to_string(list_sort(string_split(text, ' ')), ' '))``)."""
    import hashlib

    fps = [
        hashlib.md5(" ".join(sorted((t or "").split(" "))).encode("utf-8"))
        .hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column(out, pa.array(fps, pa.string()))


def near_dup_keep_best(ds, id_col: str = "image_id",
                       phash_col: str = "phash",
                       quality_col: str = "quality",
                       bands: int = 2, hamming_max: int = 3,
                       max_bucket: int = 512, window: int = 64,
                       num_partitions: int = 64,
                       max_driver_edges: int = 2_000_000):
    """Near-dup collapse keeping the BEST member of every phash
    component — "keep the largest / sharpest version of each image"
    (winner = max ``quality_col``, ties → lexicographic-min id), where
    the flagship's reference-parity rule keeps the min id.

    Scale plan mirrors dedup_stage: the banded shuffle and the component
    labels only ever carry (id, phash/quality) THIN projections; the
    full table is never shuffled — survivors come from a drop-id filter
    (broadcast set below ``max_driver_edges``, distributed
    label-propagation + per-component argmax + anti-join above it)."""
    import pyarrow.compute as pc

    from .dedup_text import _drop_ids_filter
    from .pairverify import anti_join_ids

    def thin(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if col.type != pa.string():
            col = col.cast(pa.string())
        return pa.table({"image_id": col, "phash": t.column(phash_col),
                         "q": t.column(quality_col)})

    small = ds.map_batches(thin, batch_format="pyarrow").materialize()
    edges = near_dup_edges(
        small.select_columns(["image_id", "phash"]), bands, hamming_max,
        max_bucket, window, num_partitions).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ds

    def losers_from(members: pd.DataFrame) -> set:
        """members: (id, label, q) → every member except each label's
        (max q, min id) winner."""
        members = members.sort_values(["q", "id"], ascending=[False, True],
                                      kind="mergesort")
        winners = members.drop_duplicates(subset=["label"], keep="first")
        return set(members["id"]) - set(winners["id"])

    if n_edges <= max_driver_edges:
        edf = edges.to_pandas()  # bounded: O(#dups)
        canon = union_find_canonical(edf["a"].tolist(), edf["b"].tolist())
        member_ids = set(canon)
        qdf = (
            small.map_batches(
                lambda t: t.filter(pc.is_in(
                    t.column("image_id"),
                    value_set=pa.array(list(member_ids), pa.string()))),
                batch_format="pyarrow",
            ).select_columns(["image_id", "q"]).to_pandas()
        )  # bounded: O(#component members)
        qdf = qdf.rename(columns={"image_id": "id"})
        qdf["label"] = [canon[i] for i in qdf["id"]]
        drop = losers_from(qdf)
        return _drop_ids_filter(ds, id_col, drop)

    # distributed: full membership labels → join quality → per-label
    # argmax inside map_groups emits the LOSERS → anti-join
    nodes = edges.map_batches(
        lambda t: pa.table({"id": pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()])}),
        batch_format="pyarrow",
    )
    labels = label_propagation(nodes, edges,
                               num_partitions=num_partitions).materialize()
    keyed = small.map_batches(
        lambda t: pa.table({"id": t.column("image_id"), "q": t.column("q")}),
        batch_format="pyarrow",
    )
    joined = safe_join(
        labels, keyed, join_type="inner", on=("id",),
        num_partitions=num_partitions,
        left_schema=pa.schema([("id", pa.string()),
                               ("label", pa.string())]),
        right_schema=pa.schema([("id", pa.string()),
                                ("q", pa.float64())])).materialize()

    def emit_losers(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "label" not in g.columns:
            return pd.DataFrame({"id": pd.Series([], dtype=object)})
        # PARTITION-level: one dispatch per partition, not per
        # component — sort (label, q desc, id) once, winners are the
        # first row of each label segment, everything else drops
        g = g.sort_values(["label", "q", "id"],
                          ascending=[True, False, True], kind="mergesort")
        lbl = g["label"].to_numpy(dtype=object)
        first = np.concatenate([[True], lbl[1:] != lbl[:-1]])
        return pd.DataFrame({"id": g["id"].to_numpy(dtype=object)[~first]})

    def _key_by_label(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # starved join partition (zero-field)
            return pa.table({"id": pa.array([], pa.string()),
                             "label": pa.array([], pa.string()),
                             "q": pa.array([], pa.float64()),
                             "_part": pa.array([], pa.int64())})
        return t.append_column(
            "_part", pa.array(np.asarray(
                [zlib.crc32(str(v).encode()) % num_partitions
                 for v in t.column("label").to_pylist()], np.int64),
                pa.int64()))

    keyed_part = joined.map_batches(_key_by_label, batch_format="pyarrow")
    drop_ds = keyed_part.groupby("_part").map_groups(emit_losers,
                                                     batch_format="pandas")
    return anti_join_ids(ds, id_col, drop_ds, num_partitions)


def delta_ingest_dedup(new_ds, seen_ds, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_partitions: int | None = None,
                       prefix_tokens: int | None = None):
    """Incremental-ingest dedup: keep only NEW rows whose content
    fingerprint (md5 of ``text_col``) does not already exist in the
    ingested corpus — the day-N+1 crawl pattern (dedup the delta against
    state, never re-scan history against itself).

    Both sides reduce to thin fingerprint projections; the membership
    test is one hash anti-join (pairverify.anti_join_ids), so the only
    shuffle carries (fp, id) pairs and DISTINCT seen fingerprints —
    nothing text-sized moves.  At 10^12 rows the seen side is a
    pre-materialized fingerprint table updated per ingest batch.

    ``prefix_tokens`` switches the fingerprint from the full text to the
    first k tokens — the truncation-tolerant variant (a crawl re-fetch
    that appends a footer still matches its prior version)."""
    import hashlib

    from .dedup_text import _auto_partitions
    from .pairverify import anti_join_ids

    num_partitions = _auto_partitions(num_partitions)

    def add_fp(t: pa.Table) -> pa.Table:
        def fp(x: str | None) -> str:
            s = x or ""
            if prefix_tokens is not None:
                s = " ".join(s.split(" ")[:prefix_tokens])
            return hashlib.md5(s.encode("utf-8")).hexdigest()

        fps = [fp(x) for x in t.column(text_col).to_pylist()]
        return t.append_column("fp", pa.array(fps, pa.string()))

    seen_fps = seen_ds.select_columns([text_col]).map_batches(
        add_fp, batch_format="pyarrow",
    ).map_batches(lambda t: pa.table({"id": t.column("fp")}),
                  batch_format="pyarrow")
    keyed = new_ds.map_batches(add_fp, batch_format="pyarrow")
    return anti_join_ids(keyed, "fp", seen_fps, num_partitions)


def fingerprint_components(ds, id_col: str = "doc_id",
                           text_col: str = "text", prefix_n: int = 3,
                           suffix_n: int = 3,
                           num_partitions: int | None = None):
    """Connected components over the 'shares a prefix OR suffix
    fingerprint' document graph — Dataset[(id, component)] with
    component = min id, computed END-TO-END by the distributed
    label-propagation machinery (the 10^12-row path), so the driver
    gate hash-checks the component engine itself (the DuckDB oracle
    replays connectivity with a recursive transitive closure — fine at
    oracle scale, exponential nonsense at ours).

    Docs sharing a fingerprint are chained (sorted consecutive pairs),
    not all-paired — connectivity-equivalent with O(members) edges per
    bucket.  Ids travel as ZERO-PADDED strings so the propagation's
    lexicographic min equals numeric min."""
    import hashlib

    from .dedup_text import _auto_partitions

    num_partitions = _auto_partitions(num_partitions)

    def pad(v) -> str:
        return f"{int(v):012d}"

    def fp_rows(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, x in zip(t.column(id_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            toks = (x or "").split(" ")
            pre = hashlib.md5(" ".join(toks[:prefix_n]).encode()).hexdigest()
            suf = hashlib.md5(" ".join(toks[-suffix_n:]).encode()).hexdigest()
            for fp in {pre, suf}:  # dedup identical pre/suf
                ids.append(pad(i))
                fps.append(fp)
        return pa.table({"fp": pa.array(fps, pa.string()),
                         "id": pa.array(ids, pa.string())})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow").map_batches(
        lambda t: t.append_column(
            "part", pa.array(np.asarray(
                [zlib.crc32(v.encode()) % num_partitions
                 for v in t.column("fp").to_pylist()], np.int64),
                pa.int64())),
        batch_format="pyarrow",
    )

    def chain_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if len(g) < 2:
            return empty
        g = g.drop_duplicates(["fp", "id"]).sort_values(
            ["fp", "id"], kind="mergesort")
        fps = g["fp"].to_numpy(dtype=object)
        ids = g["id"].to_numpy(dtype=object)
        same = fps[1:] == fps[:-1]
        if not same.any():
            return empty
        return pa.table({"a": pa.array(list(ids[:-1][same]), pa.string()),
                         "b": pa.array(list(ids[1:][same]), pa.string())})

    edges = rows.groupby("part").map_groups(chain_pairs,
                                            batch_format="pandas")
    nodes = ds.map_batches(
        lambda t: pa.table({"id": pa.array(
            [pad(v) for v in t.column(id_col).to_pylist()], pa.string())}),
        batch_format="pyarrow",
    )
    labels = label_propagation(nodes, edges, num_partitions=num_partitions)
    return labels.map_batches(
        lambda t: pa.table({
            id_col: pa.array([int(v) for v in t.column("id").to_pylist()],
                             pa.int64()),
            "component": pa.array(
                [int(v) for v in t.column("label").to_pylist()], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None):
    """Corpus snapshot diff — the audit every iterative curation loop
    runs between pipeline versions: one row of (n_added, n_removed,
    n_changed, n_unchanged).  Both sides reduce to (id, md5(text))
    fingerprints; ONE full-outer hash join classifies every id; counts
    fold as int partials.  Nothing text-sized shuffles and nothing
    row-sized reaches the driver."""
    import hashlib

    from .dedup_text import _auto_partitions

    num_partitions = _auto_partitions(num_partitions)

    def fp(tag: str):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column(id_col)
            if ids.type != pa.string():
                ids = ids.cast(pa.string())
            fps = [hashlib.md5((x or "").encode()).hexdigest()
                   for x in t.column(text_col).to_pylist()]
            return pa.table({"id": ids,
                             f"fp_{tag}": pa.array(fps, pa.string())})

        return f

    old_fp = old_ds.map_batches(fp("old"), batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    new_fp = new_ds.map_batches(fp("new"), batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    joined = safe_join(
        old_fp, new_fp, join_type="full_outer", on=("id",),
        num_partitions=num_partitions,
        left_schema=pa.schema([("id", pa.string()),
                               ("fp_old", pa.string())]),
        right_schema=pa.schema([("id", pa.string()),
                                ("fp_new", pa.string())]))

    def classify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # starved full_outer join partition
            z = pa.array([0], pa.int64())
            return pa.table({"n_added": z, "n_removed": z,
                             "n_changed": z, "n_unchanged": z})
        o = t.column("fp_old")
        n = t.column("fp_new")
        o_null = pc.is_null(o)
        n_null = pc.is_null(n)
        added = pc.and_(o_null, pc.invert(n_null))
        removed = pc.and_(pc.invert(o_null), n_null)
        both = pc.and_(pc.invert(o_null), pc.invert(n_null))
        same = pc.and_(both, pc.equal(o, n))
        changed = pc.and_(both, pc.invert(pc.fill_null(pc.equal(o, n),
                                                       False)))

        def c(m):
            return int(pc.sum(m.cast(pa.int64())).as_py() or 0)

        return pa.table({
            "n_added": pa.array([c(added)], pa.int64()),
            "n_removed": pa.array([c(removed)], pa.int64()),
            "n_changed": pa.array([c(changed)], pa.int64()),
            "n_unchanged": pa.array([c(pc.fill_null(same, False))],
                                    pa.int64()),
        })

    sums = joined.map_batches(classify, batch_format="pyarrow") \
        .sum(["n_added", "n_removed", "n_changed", "n_unchanged"])
    return pa.table({k: pa.array([int(sums[f"sum({k})"] or 0)], pa.int64())
                     for k in ("n_added", "n_removed", "n_changed",
                               "n_unchanged")})
