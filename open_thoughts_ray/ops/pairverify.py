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
                             with_ids: bool = False):
    """pairs: Dataset[a:string, b:string] (candidate pairs, may contain
    duplicates across bands/partitions — deduped here); ds: the source
    table.  ``kernel(texts_a, texts_b) -> np.ndarray[bool]`` runs per
    batch on the workers (``with_ids=True`` → the kernel is called as
    ``kernel(ids_a, ids_b, texts_a, texts_b)`` for asymmetric rules
    that need an id tie-break, e.g. containment keep-first).
    Returns the verified edge Dataset[a, b].

    Cost: two hash joins sized by #candidates (the pair set), one
    kernel map — no driver-side pair or text collection.
    """
    # dedupe (a, b) — the same pair arrives once per detecting band.
    # Each join MATERIALIZES before the next: two JoinOperators in one
    # streaming graph deadlock on hash-shuffle aggregator reservations
    # at small CPU counts (reproduced at num_cpus=8), and the
    # intermediates here are pair-sized (O(#candidates)), so the
    # materialization is bounded, never table-sized.
    import ray.data as rd

    # trailing repartition + retype guard: the hash aggregator emits
    # schema-LESS blocks for partitions that received no rows, and a
    # zero-field block poisons the join ("No match for FieldRef" /
    # ArrowInvalid in the join's Concat); repartition rebuilds blocks as
    # typed slices and retype_empty deterministically fixes any slot
    # assembled only from empties
    pairs = pairs.groupby(["a", "b"]).count().select_columns(["a", "b"]) \
        .repartition(num_partitions).map_batches(
            retype_empty({"a": pa.string(), "b": pa.string()}),
            batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        # Ray's hash aggregator emits schema-LESS blocks for an empty
        # groupby, and a zero-field block poisons the join ("No match
        # for FieldRef") — return a typed empty edge set instead
        return rd.from_arrow(pa.table({"a": pa.array([], pa.string()),
                                       "b": pa.array([], pa.string())}))
    ta = _string_keyed(ds, id_col, text_col, "a")
    tb = _string_keyed(ds, id_col, text_col, "b")
    joined = pairs.join(ta, join_type="inner", on=("a",),
                        num_partitions=num_partitions).materialize()
    joined = joined.join(tb, join_type="inner", on=("b",),
                         num_partitions=num_partitions)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        if with_ids:
            mask = kernel(t.column("a").to_pylist(),
                          t.column("b").to_pylist(),
                          t.column("__text_a").to_pylist(),
                          t.column("__text_b").to_pylist())
        else:
            mask = kernel(t.column("__text_a").to_pylist(),
                          t.column("__text_b").to_pylist())
        kept = t.filter(pa.array(np.asarray(mask, dtype=bool)))
        return pa.table({"a": kept.column("a"), "b": kept.column("b")})

    return joined.map_batches(verify, batch_format="pyarrow")


def anti_join_ids(ds, id_col: str, drop_ids, num_partitions: int = 32):
    """ds minus rows whose str(id) appears in ``drop_ids``
    (Dataset[id:string]) — hash-join anti-join for drop sets too large
    to broadcast.  One shuffle of ds + one of the id set."""
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
    joined = keyed.join(marker, join_type="left_outer", on=("__drop_key",),
                        num_partitions=num_partitions)
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("__dropped")))
        .drop_columns(["__drop_key", "__dropped"]),
        batch_format="pyarrow",
    )
