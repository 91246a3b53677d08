"""safe_join — a defensive wrapper around ``Dataset.join`` for the
empty-first-block hazard in Ray 2.49's hash-shuffle join.

Mechanism of the bug (ray/data/_internal/execution/operators/
hash_shuffle.py): ``_shuffle_block`` early-returns on a 0-row input
block WITHOUT sending the typed empty shards that broadcast the schema
to aggregators, yet the one-shot ``should_broadcast_schemas`` flag is
consumed by the first SUBMITTED block per input side.  If that first
block is empty (schema-less from an upstream groupby aggregator, or
even a typed 0-row block), every join partition that receives no
later nonempty shard finalizes a zero-column table and pyarrow acero
throws ``ArrowInvalid: No match … for key field reference FieldRef``.
Which block goes first is streaming-order nondeterministic — the
failure appears/disappears with ``num_cpus`` (r4 driver gate:
``components_documents`` crashed at 32 CPUs, passed at 8).

``safe_join`` removes both triggers:

* both sides are materialized (the joined sides in this engine are
  thin keyed tables — ids / hashes / labels — so pinning them in the
  object store is cheap relative to the join shuffle itself) and
  repartitioned to ``min(num_partitions, row_count)`` so EVERY block
  the shuffle sees carries at least one row;
* a side with zero rows never reaches ``Dataset.join`` at all: the
  degenerate join is computed as a streaming ``map_batches`` over the
  nonempty side, per-batch pyarrow-joined against the driver-held
  typed empty table of the other side (exact semantics for inner /
  left_outer / right_outer / full_outer, vectorized, no shuffle).

When an empty side is also schema-LESS (``ds.schema() is None``), the
caller supplies ``left_schema`` / ``right_schema`` fallbacks — every
call site in this engine builds its join inputs via ``map_batches``
with statically known output columns, so the typed fallback is one
line at the call site.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["safe_join"]

_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left_outer": "left outer",
    "right_outer": "right outer",
    "full_outer": "full outer",
}


def _empty_table(ds, schema: pa.Schema | None) -> pa.Table:
    """Typed empty table for a (possibly schema-less) empty Dataset.
    The caller-provided ``schema`` hint wins over the inferred one:
    Ray's schema of an empty dataset can degrade fields to null type,
    which pyarrow's join rejects for non-key fields."""
    if schema is not None:
        return schema.empty_table()
    s = None
    try:
        s = ds.schema(fetch_if_missing=True)
    except Exception:
        s = None
    if s is not None:
        try:
            arrow_schema = s.base_schema  # ray Schema wrapper
        except AttributeError:
            arrow_schema = s
        if (isinstance(arrow_schema, pa.Schema) and len(arrow_schema) > 0
                and not any(pa.types.is_null(f.type) for f in arrow_schema)):
            return arrow_schema.empty_table()
    raise ValueError(
        "safe_join: side is empty AND schema-less; pass left_schema/"
        "right_schema so the degenerate join output is typed")


def _degenerate(nonempty, empty_tbl: pa.Table, *, empty_side: str,
                join_type: str, on: tuple, right_on: tuple) -> "ray.data.Dataset":
    """Join where one side has zero rows: stream the nonempty side and
    pyarrow-join each batch against the driver-held typed empty table.
    Output blocks are typed and (for outer joins) nonempty, so any
    downstream join sees healthy blocks too."""
    verb = _ARROW_JOIN_TYPE[join_type]

    if empty_side == "right":
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:  # schema-less upstream block
                return pa.table({})
            return batch.join(empty_tbl, keys=list(on),
                              right_keys=list(right_on), join_type=verb)
    else:
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:
                return pa.table({})
            return empty_tbl.join(batch, keys=list(on),
                                  right_keys=list(right_on), join_type=verb)

    return nonempty.map_batches(fn, batch_format="pyarrow")


def safe_join(left, right, *, join_type: str = "inner", on: tuple,
              right_on: tuple | None = None, num_partitions: int = 16,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Drop-in replacement for ``left.join(right, ...)`` that is immune
    to the Ray 2.49 empty-first-block schema-broadcast bug (see module
    docstring).  ``on``/``right_on`` mirror ``Dataset.join``.
    """
    import ray

    right_on = right_on or on
    # Clamp the aggregator fan-out to the session's CPUs: a JoinOperator
    # with num_partitions far above available cores can deadlock its
    # aggregator-pool reservation on small sessions (the same adaptive-
    # partitions convention as the dedup family).  At cluster scale the
    # caller's value is unchanged.
    try:
        cpus = int(ray.cluster_resources().get("CPU", num_partitions))
        num_partitions = max(1, min(num_partitions, cpus))
    except Exception:
        pass
    left = left.materialize()
    right = right.materialize()
    ln, rn = left.count(), right.count()

    if ln == 0 and rn == 0:
        lt = _empty_table(left, left_schema)
        rt = _empty_table(right, right_schema)
        return ray.data.from_arrow(
            lt.join(rt, keys=list(on), right_keys=list(right_on),
                    join_type=_ARROW_JOIN_TYPE[join_type]))
    if rn == 0:
        if join_type == "inner" or join_type == "right_outer":
            # result is empty but must carry the combined schema
            rt = _empty_table(right, right_schema)
            lt = _empty_table(left, left_schema)
            return ray.data.from_arrow(
                lt.join(rt, keys=list(on), right_keys=list(right_on),
                        join_type=_ARROW_JOIN_TYPE[join_type]))
        return _degenerate(left, _empty_table(right, right_schema),
                           empty_side="right", join_type=join_type,
                           on=on, right_on=right_on)
    if ln == 0:
        if join_type == "inner" or join_type == "left_outer":
            lt = _empty_table(left, left_schema)
            rt = _empty_table(right, right_schema)
            return ray.data.from_arrow(
                lt.join(rt, keys=list(on), right_keys=list(right_on),
                        join_type=_ARROW_JOIN_TYPE[join_type]))
        return _degenerate(right, _empty_table(left, left_schema),
                           empty_side="left", join_type=join_type,
                           on=on, right_on=right_on)

    # Both sides nonempty: every block the join shuffle sees must carry
    # >= 1 row, else the one-shot schema broadcast can be consumed by a
    # row-less block.  Metadata-only check first (zero data movement on
    # the common all-nonempty case); only a side that actually contains
    # an empty block pays the repartition (concat + even split, so with
    # k <= rows each output block is nonempty and typed).
    if _has_empty_block(left):
        left = left.repartition(min(num_partitions, ln))
    if _has_empty_block(right):
        right = right.repartition(min(num_partitions, rn))
    return left.join(right, join_type=join_type, on=tuple(on),
                     right_on=tuple(right_on),
                     num_partitions=num_partitions)


def _has_empty_block(mat_ds) -> bool:
    """Metadata-only scan of a materialized dataset for 0-row blocks
    (the trigger of the schema-broadcast bug).  Conservative: unknown
    row counts report True."""
    try:
        for bundle in mat_ds.iter_internal_ref_bundles():
            for meta in bundle.metadata:
                if meta.num_rows is None or meta.num_rows == 0:
                    return True
        return False
    except Exception:
        return True
