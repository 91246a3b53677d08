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


def write_fragment(out_dir: str, frag_id: int, table: pa.Table,
                   stats: bool = True) -> dict:
    """Atomically write one fragment (temp file + rename).  With
    ``stats`` (default), the returned manifest entry carries per-column
    min/max/null-count zone maps so readers can prune whole fragments
    from the manifest alone — at 10^12-row scale a filtered read must
    skip fragments BEFORE any file is opened (Lance/Iceberg manifest
    stats; parquet row-group stats only help after the footer fetch)."""
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
    ent = {"id": frag_id, "path": fragment_name(frag_id),
           "rows": table.num_rows}
    if stats:
        ent["stats"] = zone_stats(table)
    return ent


#: zone-map columns: orderable primitives whose min/max JSON-serialize
_ZONE_TYPES = (pa.types.is_integer, pa.types.is_floating,
               pa.types.is_boolean, pa.types.is_string,
               pa.types.is_large_string)


def zone_stats(table: pa.Table) -> dict:
    """Per-column ``{min, max, nulls}`` for orderable primitive columns
    (binary/list/struct payloads are skipped — nothing sane to prune
    on).  All-null or empty columns record ``min = max = None``."""
    import pyarrow.compute as pc

    out: dict = {}
    for name, col in zip(table.column_names, table.columns):
        if not any(p(col.type) for p in _ZONE_TYPES):
            continue
        nulls = col.null_count
        if table.num_rows == 0 or nulls == table.num_rows:
            out[name] = {"min": None, "max": None, "nulls": int(nulls)}
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if isinstance(lo, float) and (lo != lo):  # all-NaN float column
            lo = hi = None
        out[name] = {"min": lo, "max": hi, "nulls": int(nulls)}
    return out


#: predicate ops understood by the pruner, as (col, op, literal) triples
_PRUNE_OPS = {"==", "<", "<=", ">", ">="}


def _maybe_match(st: dict | None, col: str, op: str, val) -> bool:
    """Conservative zone test: True unless the fragment PROVABLY holds
    no matching row.  Missing stats / unknown column → True (never
    prune blindly)."""
    if not st or col not in st:
        return True
    lo, hi = st[col]["min"], st[col]["max"]
    if lo is None or hi is None:
        # all-null (or unknown) column values: no non-null comparison
        # can match, but only if the stats entry is authoritative
        return st[col]["nulls"] == 0
    if op == "==":
        return lo <= val <= hi
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    raise ValueError(f"unknown prune op {op!r} (use one of {_PRUNE_OPS})")


def prune_fragments(table_dir: str,
                    conjuncts: list[tuple]) -> tuple[list[str], int]:
    """Manifest-level fragment pruning: keep fragments whose zone maps
    might satisfy ALL ``(col, op, literal)`` conjuncts.  Returns
    ``(kept_paths, n_pruned)``.  Fragments written without stats are
    always kept (correctness over savings)."""
    for c in conjuncts:
        if len(c) != 3 or c[1] not in _PRUNE_OPS:
            raise ValueError(f"bad conjunct {c!r}")
    man = read_manifest(table_dir)
    kept, pruned = [], 0
    for f in man["fragments"]:
        st = f.get("stats")
        if all(_maybe_match(st, col, op, val) for col, op, val in conjuncts):
            kept.append(os.path.join(table_dir, f["path"]))
        else:
            pruned += 1
    return kept, pruned


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


def read_dataset(table_dir: str, columns: list[str] | None = None,
                 paths: list[str] | None = None,
                 filter_conjuncts: list[tuple] | None = None):
    """Open the table as a ``ray.data.Dataset`` (column-pruned at the
    read, one block per fragment).  ``filter_conjuncts`` — a list of
    ``(col, op, literal)`` with op in ``== < <= > >=`` — prunes whole
    fragments from the manifest zone maps, then pushes the residual
    row filter into the parquet scan (both sides of the Lance
    "stats first, then row filter" read path); rows satisfy the AND
    of all conjuncts."""
    import ray.data as rd

    if filter_conjuncts:
        if paths is not None:
            raise ValueError("pass either paths or filter_conjuncts")
        paths, _ = prune_fragments(table_dir, filter_conjuncts)
        if not paths:
            # empty but correctly-typed dataset: read the schema from
            # any fragment, take zero rows
            any_frag = fragment_paths(table_dir)
            if not any_frag:
                return rd.from_items([])
            return rd.read_parquet(any_frag[:1], columns=columns).limit(0)
        import pyarrow.dataset as pads

        expr = None
        for col, op, val in filter_conjuncts:
            f = pads.field(col)
            e = {"==": f == val, "<": f < val, "<=": f <= val,
                 ">": f > val, ">=": f >= val}[op]
            expr = e if expr is None else (expr & e)
        return rd.read_parquet(paths, columns=columns, filter=expr)
    return rd.read_parquet(paths if paths is not None else fragment_paths(table_dir),
                           columns=columns)
