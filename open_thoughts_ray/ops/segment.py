"""Partition-level segment-walk machinery — the shared kernel behind the
grouped-analytics ops.

At crawl scale a per-key ``groupby(key).map_groups(pandas_fn)`` pays one
pandas DataFrame construction + Python dispatch PER KEY (millions of
dispatches for per-user analytics).  The fix, invented for
``funnel_counts`` (ops/temporal.py) and the boilerplate reassembly pass
(ops/boilerplate.py), is:

1. ONE keyed shuffle on ``hash(key) % P`` (P ≈ cluster CPUs) — co-locates
   every row of a key without a per-key group object;
2. each partition sorts ONCE and walks key SEGMENTS with vectorized
   numpy / C-level-pandas kernels — P Python dispatches total.

Reference parity: this replaces the reference's per-shard
``Dataset.map``/xxhash partitioning (engine/operators/group_by_operator.py:99-104)
with an explicitly bounded-dispatch plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup_text import _auto_partitions


def partition_key_array(col: pa.ChunkedArray | pa.Array,
                        num_partitions: int) -> np.ndarray:
    """int64 partition ids for a key column: ``v % P`` for integer keys,
    ``crc32(str(v)) % P`` otherwise (the boilerplate.add_doc_part helper,
    promoted here so every grouped op accepts string ids — ADVICE r3)."""
    if pa.types.is_integer(col.type):
        return (col.to_numpy(zero_copy_only=False).astype(np.int64)
                % num_partitions)
    import zlib

    return np.asarray(
        [zlib.crc32(str(v).encode()) % num_partitions for v in col.to_pylist()],
        np.int64,
    )


def add_part(t: pa.Table, key_col: str, num_partitions: int,
             part_col: str = "_part") -> pa.Table:
    part = partition_key_array(t.column(key_col), num_partitions)
    # drop pandas metadata inherited from parquet: pyarrow.Schema with
    # a b'pandas' entry is UNhashable (hash raises on the nested dict),
    # so every shuffle-reduce that unifies such schemas logs "Failed to
    # hash the schemas" from the workers and loses the set() early-exit
    return t.replace_schema_metadata(None).append_column(
        part_col, pa.array(part, pa.int64()))


def partitioned_groups(ds, key_col: str, per_partition, *,
                       num_partitions: int | None = None,
                       cols: list[str] | None = None,
                       batch_format: str = "pandas"):
    """``groupby(hash(key) % P).map_groups(per_partition)`` — the bounded
    dispatch plan.  ``per_partition`` receives one pandas DataFrame (or
    pyarrow Table) per partition WITHOUT the ``_part`` column and must
    handle multiple keys per call (sort + segment-walk).  ``cols``
    projects the shuffle payload first (always pass the thin set)."""
    num_partitions = _auto_partitions(num_partitions)
    if cols is not None:
        ds = ds.select_columns(cols)

    def tag(t: pa.Table) -> pa.Table:
        return add_part(t, key_col, num_partitions)

    if batch_format == "pandas":
        def run(g):
            return per_partition(g.drop(columns=["_part"]))
    else:
        def run(g):
            return per_partition(g.drop_columns(["_part"]))

    # batch_size bundles tiny upstream blocks (filter residue, 64-way
    # split reads) into ~64k-row blocks BEFORE the sort shuffle — each
    # sort-submitted block pays a fixed per-block cost, so 128 blocks of
    # ~300 rows cost more than the sort itself.  Scale-neutral: blocks
    # already >= 64k rows keep one-task-per-block granularity (Ray only
    # bundles UP to batch_size; the output buffer re-merges splits to
    # the target block size).
    return ds.map_batches(tag, batch_format="pyarrow",
                          batch_size=65536).groupby(
        "_part").map_groups(run, batch_format=batch_format)


def segment_bounds(sorted_keys: np.ndarray) -> np.ndarray:
    """Boundary indices of equal-key runs in an already-sorted array:
    ``bounds[i]:bounds[i+1]`` is one key's segment (first and last entry
    are 0 and len)."""
    if len(sorted_keys) == 0:
        return np.zeros(1, dtype=np.int64)
    return np.flatnonzero(np.concatenate(
        [[True], sorted_keys[1:] != sorted_keys[:-1], [True]])).astype(np.int64)
