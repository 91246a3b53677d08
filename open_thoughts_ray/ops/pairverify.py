"""Distributed candidate-pair verification + id-set anti-join helpers.

The LSH dedup family (minhash / fuzzy / n-gram Jaccard) generates
candidate pairs with a banded shuffle, then must verify each pair with
an exact kernel.  Round 2 verified on the driver (collect pairs +
candidate texts) — correct at bench scale but a driver-side
materialization on adversarial duplicate fractions (VERDICT r2 #2,
#candidates = O(N) on a 99%-dup crawl shard).  This module is the scale
path shared by the whole family:

* ``verify_pairs_distributed`` — join the candidate texts onto both pair
  endpoints (two hash-partitioned joins over the O(#candidates) pair
  set, never the full table) and run the verify kernel per batch inside
  the cluster.  Returns the verified edge Dataset; nothing pair-sized
  reaches the driver.
* ``anti_join_ids`` — drop rows whose id appears in a (potentially
  large) id Dataset: one hash join keyed on the id, marker-null filter.
  The distributed complement of dedup_text._drop_ids_filter's broadcast
  set.

Reference semantics: open_thoughts/deduplicate.py:12-55 (verify =
fuzz.ratio), _A1_Source/utils.py:91-195 (verify = n-gram overlap) — the
re-expression replaces their O(N²) pools with candidate joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joinsafe import safe_join


def retype_empty(schema: dict[str, "pa.DataType"]):
    """map_batches fn factory: pass typed blocks through untouched,
    rewrite ZERO-FIELD blocks to a typed empty with ``schema``.

    Ray's sort/aggregate shuffles emit schema-LESS blocks for empty hash
    partitions; a trailing ``repartition`` usually rebuilds them as
    typed slices, but when a repartition output slot is assembled ONLY
    from such empties the block stays zero-field and poisons any
    downstream join's Concat aggregator (observed as a rare
    ArrowInvalid inside HashShuffleAggregator.finalize).  This guard is
    deterministic where the repartition is probabilistic."""

    def fix(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({k: pa.array([], v) for k, v in schema.items()})
        return t

    return fix


def _string_keyed(ds, id_col: str, text_col: str, key_name: str):
    """Project ds → Dataset[(key_name:string, __text:string)]."""

    def prep(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if col.type != pa.string():
            col = col.cast(pa.string())
        return pa.table({key_name: col, f"__text_{key_name}": t.column(text_col)})

    return ds.select_columns([id_col, text_col]).map_batches(
        prep, batch_format="pyarrow")


def verify_pairs_distributed(pairs, ds, id_col: str, text_col: str,
                             kernel, num_partitions: int = 32,
                             with_ids: bool = False,
                             max_broadcast_ids: int = 2_000_000):
    """pairs: Dataset[a:string, b:string] (candidate pairs, may contain
    duplicates across bands/partitions — deduped here); ds: the source
    table.  ``kernel(texts_a, texts_b) -> np.ndarray[bool]`` runs per
    partition on the workers (``with_ids=True`` → the kernel is called
    as ``kernel(ids_a, ids_b, texts_a, texts_b)`` for asymmetric rules
    that need an id tie-break, e.g. containment keep-first).
    Returns the verified edge Dataset[a, b].

    Cost: two candidate-sized partition-merge shuffles + one kernel
    pass — no driver-side pair or text collection, and NO Arrow
    Dataset.join: Ray's join aggregator builds a ZERO-FIELD table for
    any hash partition that received no rows on one side, and Arrow's
    join then fails with "No match for FieldRef" whenever the other
    side of that partition is non-empty.  Corpus-sized inputs populate
    every partition by volume; candidate sets are sparse, so the join
    path crashes exactly when candidates are few.  The partition-merge
    (hash(key) % P route + in-partition pandas merge) degrades to an
    empty output instead — and removes the two-JoinOperator
    deadlock/materialize workaround the join path needed.
    """
    import ray.data as rd

    # dedupe (a, b) — the same pair arrives once per detecting band.
    # Sort-path dedupe (hash(a#b) % P route + per-partition
    # drop_duplicates): Ray's HASH aggregate pays a 1.3-1.9 s
    # aggregator-pool spawn per operator (BASELINE.md "Negative
    # result"), which dominated small candidate sets; the sort shuffle
    # is ~0.2 s at the same sizes and scale-equivalent (one pass,
    # partition-local dedupe after exact key routing).
    def _pair_part(t: pa.Table) -> pa.Table:
        import zlib as _z

        if t.num_columns == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "_part": pa.array([], pa.int64())})
        part = pa.array(
            [_z.crc32(f"{x}#{y}".encode()) % num_partitions
             for x, y in zip(t.column("a").to_pylist(),
                             t.column("b").to_pylist())], pa.int64())
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "_part": part})

    def _dedupe(g):
        if g.empty or "a" not in g.columns:
            import pandas as _pd

            return _pd.DataFrame({"a": _pd.Series([], dtype=object),
                                  "b": _pd.Series([], dtype=object)})
        return g.drop_duplicates(subset=["a", "b"])[["a", "b"]]

    pairs = pairs.map_batches(_pair_part, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("_part").map_groups(_dedupe, batch_format="pandas") \
        .map_batches(retype_empty({"a": pa.string(), "b": pa.string()}),
                     batch_format="pyarrow").materialize()
    empty_edges = pa.table({"a": pa.array([], pa.string()),
                            "b": pa.array([], pa.string())})
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(empty_edges)

    # candidate-id prefilter: when the candidate set is small relative
    # to the corpus, only rows that are PAIR ENDPOINTS need to ship
    # their payload through the routing shuffle.  The id set is
    # ≤ 2·n_pairs strings on the driver (bounded by the same
    # max_driver-style threshold the dedup family uses); above it the
    # full thin (id, text) projection routes as before.
    cand_ref = None
    if n_pairs <= max_broadcast_ids // 2:
        import ray as _ray

        pdf = pairs.to_pandas()  # n_pairs rows, already deduped
        cand_ref = _ray.put(set(pdf["a"]).union(pdf["b"]))

    try:
        payload_type = ds.schema().base_schema.field(text_col).type
    except AttributeError:
        # pandas-lineage datasets expose PandasBlockSchema (no Arrow
        # fields); their object/text columns arrive as Arrow strings
        payload_type = pa.string()

    def _part(vals):
        import zlib

        return pa.array([zlib.crc32(str(v).encode()) % num_partitions
                         for v in vals], pa.int64())

    # shuffle 1: route pair ENDPOINTS and source payloads by id
    def endpoint_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "pa_": pa.array([], pa.string()),
                             "pb_": pa.array([], pa.string()),
                             "side": pa.array([], pa.int8()),
                             "payload": pa.array([], payload_type),
                             "part": pa.array([], pa.int64())})
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        key = a + b
        return pa.table({
            "key": pa.array(key, pa.string()),
            "pa_": pa.array(a + a, pa.string()),
            "pb_": pa.array(b + b, pa.string()),
            "side": pa.array([0] * len(a) + [1] * len(b), pa.int8()),
            "payload": pa.nulls(2 * len(a), payload_type),
            "part": _part(key),
        })

    def source_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if ids.type != pa.string():
            ids = ids.cast(pa.string())
        key = ids.to_pylist()
        payload = t.column(text_col)
        if payload.type != payload_type:
            payload = payload.cast(payload_type)
        return pa.table({
            "key": pa.array(key, pa.string()),
            "pa_": pa.nulls(len(key), pa.string()),
            "pb_": pa.nulls(len(key), pa.string()),
            "side": pa.array([2] * len(key), pa.int8()),
            "payload": payload,
            "part": _part(key),
        })

    src = ds.select_columns([id_col, text_col])
    if cand_ref is not None:
        def only_candidates(t: pa.Table, *, ref=cand_ref) -> pa.Table:
            from .bcast import cached_get

            cand = cached_get(ref)
            ids = t.column(id_col)
            if ids.type != pa.string():
                ids = ids.cast(pa.string())
            m = [v in cand for v in ids.to_pylist()]
            return t.filter(pa.array(m, pa.bool_()))

        src = src.map_batches(only_candidates, batch_format="pyarrow")
    routed = pairs.map_batches(endpoint_rows, batch_format="pyarrow").union(
        src.map_batches(source_rows, batch_format="pyarrow"))

    def attach_payload(df):
        import zlib

        import pandas as _pd

        if df.empty or "side" not in df.columns:
            # column-less empty shuffle partition — mirror finish()'s
            # guard (ADVICE r4)
            return _pd.DataFrame({"pa_": _pd.Series([], dtype=object),
                                  "pb_": _pd.Series([], dtype=object),
                                  "side": _pd.Series([], dtype="int8"),
                                  "payload": _pd.Series([], dtype=object),
                                  "part": _pd.Series([], dtype="int64")})
        src = df[df["side"] == 2]
        ep = df[df["side"] != 2]
        pay = dict(zip(src["key"], src["payload"]))
        got = ep[ep["key"].isin(pay.keys())].copy()  # inner semantics
        out = got[["pa_", "pb_", "side"]].copy()
        out["payload"] = got["key"].map(pay)
        # re-key by the PAIR for shuffle 2
        out["part"] = np.asarray(
            [zlib.crc32(str(v).encode()) % num_partitions
             for v in got["pa_"]], dtype=np.int64)
        return out

    halves = routed.groupby("part", num_partitions=num_partitions) \
        .map_groups(lambda g: attach_payload(g.drop(columns=["part"])
                                             if "part" in g.columns else g),
                    batch_format="pandas")

    # shuffle 2: reunite the two endpoint rows of each pair, run kernel
    def finish(df):
        import pandas as pd

        out_empty = pd.DataFrame({"a": pd.Series([], dtype=object),
                                  "b": pd.Series([], dtype=object)})
        if df.empty or "side" not in df.columns:
            return out_empty
        da = df[df["side"] == 0][["pa_", "pb_", "payload"]].rename(
            columns={"payload": "__ta"})
        db = df[df["side"] == 1][["pa_", "pb_", "payload"]].rename(
            columns={"payload": "__tb"})
        j = da.merge(db, on=["pa_", "pb_"])
        if j.empty:
            return out_empty
        if with_ids:
            mask = kernel(j["pa_"].tolist(), j["pb_"].tolist(),
                          j["__ta"].tolist(), j["__tb"].tolist())
        else:
            mask = kernel(j["__ta"].tolist(), j["__tb"].tolist())
        kept = j[np.asarray(mask, dtype=bool)]
        return pd.DataFrame({"a": kept["pa_"].to_numpy(),
                             "b": kept["pb_"].to_numpy()})

    edges = halves.groupby("part", num_partitions=num_partitions) \
        .map_groups(lambda g: finish(g.drop(columns=["part"])
                                     if "part" in g.columns else g),
                    batch_format="pandas")
    return edges.map_batches(
        retype_empty({"a": pa.string(), "b": pa.string()}),
        batch_format="pyarrow")


def anti_join_ids(ds, id_col: str, drop_ids,
                  num_partitions: int | None = None):
    """ds minus rows whose str(id) appears in ``drop_ids``
    (Dataset[id:string]) — hash-join anti-join for drop sets too large
    to broadcast.  One shuffle of ds + one of the id set.
    ``num_partitions`` defaults adaptive (≈ live CPUs) — a fixed count
    far above the session's cores can deadlock the join's aggregator
    reservation on small sessions."""
    from .dedup_text import _auto_partitions

    num_partitions = _auto_partitions(num_partitions)

    def mark(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty aggregator block
            return pa.table({"__drop_key": pa.array([], pa.string()),
                             "__dropped": pa.array([], pa.bool_())})
        return pa.table({"__drop_key": t.column("id"),
                         "__dropped": pa.array([True] * t.num_rows,
                                               pa.bool_())})

    marker = drop_ids.groupby("id").count().map_batches(
        mark, batch_format="pyarrow",
    ).repartition(num_partitions).materialize()
    if marker.count() == 0:
        return ds  # empty groupby output is schema-less → would poison
                   # the join; nothing to drop anyway

    def add_key(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if col.type != pa.string():
            col = col.cast(pa.string())
        return t.append_column("__drop_key", col)

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    joined = safe_join(
        keyed, marker, join_type="left_outer", on=("__drop_key",),
        num_partitions=num_partitions,
        right_schema=pa.schema([("__drop_key", pa.string()),
                                ("__dropped", pa.bool_())]))
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("__dropped")))
        .drop_columns(["__drop_key", "__dropped"]),
        batch_format="pyarrow",
    )
