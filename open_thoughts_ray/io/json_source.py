"""JSON / JSONL source with projection + truncate — the reference's
json_source / local_json_source operators
(engine/operators/json_source_operator.py:41-216, 229-289) on Ray Data.

* a path may be a single file or a directory (every ``.json`` /
  ``.jsonl`` / ``.jsonl.gz`` / ``.jsonl.zst[d]`` inside, sorted — the
  reference globs the dir the same way),
* per-file parallelism is native (Ray reads one task per file — the
  local_json_source "one shard per file" behavior),
* compressed files decompress through Arrow's stream codecs
  (``arrow_open_stream_args``), no temp files,
* ``columns`` projects AFTER the read (JSON has no column pruning at the
  decoder), ``limit`` truncates globally in file order, ``source_tag``
  adds the constant provenance column (hf_source's ``source`` column).
"""

from __future__ import annotations

import os

_EXTS = (".json", ".jsonl", ".jsonl.gz", ".jsonl.zst", ".jsonl.zstd",
         ".json.gz", ".json.zst", ".json.zstd")


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(_EXTS)
        )
        if not out:
            raise FileNotFoundError(f"no JSON files under {path}")
        return out
    return [path]


def read_json_source(path: str, columns: list[str] | None = None,
                     limit: int | None = None, source_tag: str | None = None):
    import ray.data as rd

    paths = _expand(path)
    comp = None
    if all(p.endswith((".gz",)) for p in paths):
        comp = "gzip"
    elif all(p.endswith((".zst", ".zstd")) for p in paths):
        comp = "zstd"
    kwargs = {}
    if comp:
        kwargs["arrow_open_stream_args"] = {"compression": comp}
    ds = rd.read_json(paths, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    if limit:
        ds = ds.limit(int(limit))
    if source_tag is not None:
        from ..ops.relational import add_constant_columns

        ds = add_constant_columns(ds, {"source": source_tag})
    return ds


def with_backoff(fn, max_retries: int = 7, base_s: float = 0.5,
                 retryable=(OSError,), sleep=None, seed: int = 0):
    """Run ``fn()`` with bounded exponential backoff + full jitter — the
    reference's transient-error loop around shard downloads
    (dclm_refinedweb_source_operator.py:166-188: SlowDown → sleep
    2^attempt, up to 7 retries) for any storage backend.  ``retryable``
    scopes which exceptions are transient; anything else propagates
    immediately.  Deterministic given ``seed`` (full jitter drawn from a
    seeded generator so tests replay exactly)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    if sleep is None:
        import time as _time

        sleep = _time.sleep
    attempt = 0
    while True:
        try:
            return fn()
        except retryable:
            if attempt >= max_retries:
                raise
            sleep(float(base_s * (2 ** attempt) * rng.uniform(0.5, 1.0)))
            attempt += 1


def read_sharded_jsonl_resilient(path: str | list[str],
                                 num_shards: int | None = None,
                                 seed: int = 314,
                                 columns: list[str] | None = None,
                                 max_retries: int = 7,
                                 backoff_base_s: float = 0.5,
                                 shard_path_col: str | None = None,
                                 _fault_hook=None):
    """Seeded shard sample + per-shard jsonl parse with transient-error
    backoff INSIDE the read task — the full dclm_refinedweb_source
    plan (sample N shards with a fixed seed; each shard download/parse
    survives ``max_retries`` transient failures with exponential
    backoff) on a local/posix filesystem.  One Ray task per shard
    (``from_items(paths).flat_map``-shaped via map_batches with
    batch_size=1), so shard reads parallelize and a poisoned shard only
    retries itself.

    ``_fault_hook(path, attempt)`` is a test seam: called before every
    open attempt, it may raise OSError to simulate transient storage
    errors (the S3 SlowDown analog — no network in this sandbox)."""
    import pyarrow.json as pj
    import ray.data as rd

    paths = _expand(path) if isinstance(path, str) else sorted(path)
    if num_shards is not None:
        paths = sample_shard_paths(paths, num_shards, seed)

    def read_shard(batch: "pa.Table") -> "pa.Table":  # noqa: F821
        import pyarrow as pa

        out = []
        for p in batch.column("path").to_pylist():
            attempts = {"n": 0}

            def attempt_read(p=p, attempts=attempts):
                k = attempts["n"]
                attempts["n"] += 1  # count the attempt BEFORE it can fail
                if _fault_hook is not None:
                    _fault_hook(p, k)
                if p.endswith((".gz",)):
                    import gzip

                    with gzip.open(p, "rb") as f:
                        return pj.read_json(f)
                if p.endswith((".zst", ".zstd")):
                    with pa.input_stream(p, compression="zstd") as f:
                        return pj.read_json(f)
                return pj.read_json(p)

            import zlib

            t = with_backoff(attempt_read, max_retries=max_retries,
                             base_s=backoff_base_s,
                             seed=zlib.crc32(p.encode()))
            if columns:
                t = t.select(columns)
            if shard_path_col:
                t = t.append_column(
                    shard_path_col, pa.array([p] * t.num_rows, pa.string()))
            out.append(t)
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="default")

    import pyarrow as pa

    path_ds = rd.from_arrow(pa.table({"path": pa.array(paths, pa.string())}))
    # one task per shard: batch_size=1 over a repartitioned path list
    return path_ds.repartition(max(1, len(paths))).map_batches(
        read_shard, batch_format="pyarrow", batch_size=None)


def sample_shard_paths(paths: list[str], num_shards: int, seed: int = 314) -> list[str]:
    """Seeded random shard sample — the dclm_refinedweb_source pattern
    (dclm_refinedweb_source_operator.py:104-121: choose N shard files
    from the listing with a fixed seed; retries on read are Ray task
    retries).  Returns a deterministic selection, order-stable."""
    import numpy as np

    paths = sorted(paths)
    if num_shards >= len(paths):
        return paths
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(paths), size=num_shards, replace=False)
    return [paths[i] for i in sorted(idx)]
