"""Lance-style fragment-per-partition table layout (Parquet physical).

The sandbox has no ``pylance``, so "Lance table" here is the storage
*abstraction* (SURVEY.md §7.0): a directory of immutable fragment files
plus a JSON manifest listing them — the same fragment/manifest shape Lance
uses, with Parquet as the physical format (swap the read/write calls for
``lance`` when the wheel is available).  Fragments are the unit of
parallelism (one Ray Data block each) and of checkpoint/resume lineage.

Replaces the reference's ``save_to_disk`` Arrow shard cache + SUCCESS_FLAG
scheme (open_thoughts_3/dcft/data_strategies/synthetic_data_manager.py:1058-1129).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "manifest.json"


def fragment_name(frag_id: int) -> str:
    return f"frag-{frag_id:05d}.parquet"


def write_fragment(out_dir: str, frag_id: int, table: pa.Table) -> dict:
    """Atomically write one fragment (temp file + rename)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, fragment_name(frag_id))
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return {"id": frag_id, "path": fragment_name(frag_id), "rows": table.num_rows}


def write_manifest(out_dir: str, fragments: list[dict], meta: dict | None = None) -> None:
    doc = {"version": 1, "fragments": sorted(fragments, key=lambda f: f["id"])}
    if meta:
        doc["meta"] = meta
    fd, tmp = tempfile.mkstemp(dir=out_dir)
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def read_manifest(table_dir: str) -> dict:
    with open(os.path.join(table_dir, MANIFEST)) as f:
        return json.load(f)


def fragment_paths(table_dir: str) -> list[str]:
    man = read_manifest(table_dir)
    return [os.path.join(table_dir, f["path"]) for f in man["fragments"]]


def table_exists(table_dir: str) -> bool:
    return os.path.exists(os.path.join(table_dir, MANIFEST))


def num_rows(table_dir: str) -> int:
    return sum(f["rows"] for f in read_manifest(table_dir)["fragments"])


def read_dataset(table_dir: str, columns: list[str] | None = None, paths: list[str] | None = None):
    """Open the table as a ``ray.data.Dataset`` (column-pruned at the read,
    one block per fragment)."""
    import ray.data as rd

    return rd.read_parquet(paths if paths is not None else fragment_paths(table_dir),
                           columns=columns)
