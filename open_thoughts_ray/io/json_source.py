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
