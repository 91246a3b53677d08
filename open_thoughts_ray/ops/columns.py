"""Column-level scalar/array operators (the remaining commons.py items,
SURVEY.md §2.2 / §2.9) — each a vectorized ``map_batches`` body.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def strip_column(ds, column: str):
    """commons.py:518-521 — whitespace-strip a string column."""
    def f(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(column)
        return t.set_column(i, column, pc.utf8_trim_whitespace(t.column(column)))

    return ds.map_batches(f, batch_format="pyarrow")


def concatenate_columns(ds, columns: list[str], out: str, sep: str = " "):
    """commons.py:760-788 — string-concat several columns into one."""
    def f(t: pa.Table) -> pa.Table:
        arrs = [t.column(c).cast(pa.string()) for c in columns]
        joined = pc.binary_join_element_wise(*arrs, sep)
        return t.append_column(out, joined)

    return ds.map_batches(f, batch_format="pyarrow")


def list_to_string(ds, column: str, out: str | None = None, sep: str = " "):
    """commons.py:744-757 — join a list<string> column into one string."""
    out = out or column

    def f(t: pa.Table) -> pa.Table:
        vals = [sep.join(v or []) for v in t.column(column).to_pylist()]
        arr = pa.array(vals, pa.string())
        if out == column:
            return t.set_column(t.schema.get_field_index(column), column, arr)
        return t.append_column(out, arr)

    return ds.map_batches(f, batch_format="pyarrow")


def extract_list_index(ds, column: str, index: int, out: str):
    """commons.py:800-812 — element-at-index from a list column (null
    when out of range)."""
    def f(t: pa.Table) -> pa.Table:
        vals = [
            (v[index] if v is not None and -len(v) <= index < len(v) else None)
            for v in t.column(column).to_pylist()
        ]
        return t.append_column(out, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow")


def select_rows_regex(ds, column: str, pattern: str):
    """commons.py:606-611 — keep rows whose column matches the regex
    (Python ``re.search`` semantics, applied vectorized per batch)."""
    rx = re.compile(pattern)

    def f(t: pa.Table) -> pa.Table:
        mask = np.asarray(
            [bool(rx.search(v)) if v is not None else False
             for v in t.column(column).to_pylist()],
            dtype=bool,
        )
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def upsample_rows(ds, target_rows: int, current_rows: int | None = None,
                  seed: int = 42):
    """commons.py:131-142 upsample_dataset — repeat the dataset to reach
    ``target_rows``: whole copies via per-batch concat + a deterministic
    hash-sampled remainder (no driver materialization)."""
    n = current_rows if current_rows is not None else ds.count()
    if n == 0 or target_rows <= n:
        return ds.limit(target_rows)
    whole, rem = divmod(target_rows, n)

    def rep(t: pa.Table) -> pa.Table:
        return pa.concat_tables([t] * whole)

    out = ds.map_batches(rep, batch_format="pyarrow")
    if rem:
        out = out.union(ds.random_shuffle(seed=seed).limit(rem))
    return out


def hash_split_batch(batch: pa.Table, id_col: str = "doc_id",
                     train_pct: int = 80, val_pct: int = 10) -> pa.Table:
    """Deterministic train/val/test assignment by content hash — the
    split step every training-data assembly ends with.  bucket =
    int(md5(id)[:8], 16) % 100; split boundaries at train_pct and
    train_pct+val_pct.  Stable under any partitioning / reordering
    (pure function of the id), reproducible in SQL via DuckDB md5.
    """
    import hashlib

    ids = batch.column(id_col).to_pylist()
    buckets = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
               for i in ids]
    hi = train_pct + val_pct
    split = ["train" if b < train_pct else ("val" if b < hi else "test")
             for b in buckets]
    batch = batch.append_column("bucket", pa.array(buckets, pa.int64()))
    return batch.append_column("split", pa.array(split, pa.string()))


def weighted_bernoulli_sample_batch(batch: pa.Table, id_col: str,
                                    weight_col: str, scale: float,
                                    out: str | None = None) -> pa.Table:
    """Deterministic weighted downsampling: keep a row iff
    u(id) < weight/scale, where u(id) = int(md5(id)[:8], 16) / 2³² is a
    content-addressed uniform in [0, 1) — the quality-weighted mixture
    sampler (upweight long/high-score docs) that is stable under any
    partitioning and replayable in SQL (DuckDB md5).  Weights above
    ``scale`` always keep.  Pure map; no shuffle, no RNG state."""
    import hashlib

    ids = batch.column(id_col).to_pylist()
    w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
    u = np.asarray([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    for i in ids], dtype=np.float64) / 4294967296.0
    keep = u < (w / float(scale))
    if out is not None:
        return batch.append_column(out, pa.array(keep))
    return batch.filter(pa.array(keep))


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out: str = "norm_text") -> pa.Table:
    """CCNet-style text normalization: lowercase, strip everything but
    [a-z0-9 ], collapse whitespace runs, trim — the canonical form fed
    to dedup/fingerprint stages so near-dups differing only in case or
    punctuation collide.  Vectorized Arrow compute kernels end-to-end
    (no Python per row); replayable in SQL as
    trim(regexp_replace(regexp_replace(lower(t),'[^a-z0-9 ]',' ','g'),
    ' +',' ','g'))."""
    col = pc.utf8_lower(batch.column(text_col))
    col = pc.replace_substring_regex(col, "[^a-z0-9 ]", " ")
    col = pc.replace_substring_regex(col, " +", " ")
    col = pc.utf8_trim(col, " ")
    return batch.append_column(out, col)
