"""Per-operator content-addressed caching for YAML DAGs — the general
form of checkpoint.py's flagship resume, with the reference's semantics:
every operator's output is cached under a fingerprint folding its own
config, its input operators' fingerprints (the ancestor hash,
engine/dag.py:111-171), the source text of any user code it calls
(hashing_utils.py:16-262 call-graph hash, honest subset), and the
identity of source files it reads.  A rerun reuses every prefix whose
fingerprint is unchanged and recomputes only the edited suffix
(synthetic_data_manager.py:264-537 cache discipline: write to staging,
atomic rename, SUCCESS marker).

Scale notes: each cached operator materializes its output as partitioned
Parquet — that is the COST of operator-level resume (identical in the
reference, which save_to_disk's every shard).  Keep the streaming runner
(yaml_pipeline.run_pipeline) for one-shot runs; mark cheap projections
``no_cache: true`` so they fuse with their consumer instead of hitting
disk.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

DAGCACHE_CODE_VERSION = "1"

#: execution-tuning keys that cannot change operator OUTPUT — excluded
#: from fingerprints so retuning never invalidates caches (the same rule
#: as checkpoint.config_fingerprint)
_TUNING_KEYS = {"num_cpus", "num_gpus", "memory", "concurrency",
                "batch_size", "no_cache"}


def _source_files(typ: str, cfg: dict) -> list[str]:
    if typ == "parquet_source":
        p = cfg["path"]
        return sorted(glob.glob(os.path.join(p, "*.parquet"))) \
            if os.path.isdir(p) else [p]
    if typ == "json_source":
        p = cfg["path"]
        if os.path.isdir(p):
            out = []
            for ext in ("*.json", "*.jsonl", "*.jsonl.zst", "*.jsonl.zstd"):
                out.extend(glob.glob(os.path.join(p, ext)))
            return sorted(out)
        return [p]
    if typ == "lance_source":
        from .io import lance_table

        return sorted(lance_table.fragment_paths(cfg["path"]))
    return []


def _files_fingerprint(paths: list[str]) -> str:
    parts = [f"{os.path.basename(p)}:{os.path.getsize(p)}:"
             f"{int(os.path.getmtime(p) * 1000)}" for p in paths]
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


def _code_identity(typ: str, cfg: dict) -> str:
    """Source text of the user code an op calls: dotted-path functions
    and registered plugin handlers are hashed so editing them recomputes
    dependents; built-in ops ride the module version constant."""
    import inspect

    from . import yaml_pipeline as yp

    try:
        if typ in ("function", "map_batches_function"):
            fn = yp._resolve(cfg["function"])
            return hashlib.md5(inspect.getsource(fn).encode()).hexdigest()
        if typ in yp.YAML_OP_REGISTRY:
            h = yp.YAML_OP_REGISTRY[typ]
            return hashlib.md5(inspect.getsource(h).encode()).hexdigest()
    except (OSError, TypeError):  # builtins / C extensions: version only
        pass
    return DAGCACHE_CODE_VERSION


def op_fingerprint(typ: str, cfg: dict, input_fps: list[str]) -> str:
    payload = {
        "type": typ,
        "cfg": {k: v for k, v in sorted(cfg.items())
                if k not in _TUNING_KEYS},
        "inputs": list(input_fps),
        "code": _code_identity(typ, cfg),
        "version": DAGCACHE_CODE_VERSION,
        "files": _files_fingerprint(_source_files(typ, cfg)),
    }
    return hashlib.md5(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()


def run_pipeline_cached(doc: dict, cache_dir: str,
                        output_id: str | None = None,
                        registry_dir: str | None = None):
    """Execute a YAML doc with per-operator content-addressed caching.

    Returns ``(dataset, report)`` where report maps op id →
    ``"hit" | "computed" | "streamed"`` (``streamed`` = ``no_cache``
    ops, which chain lazily into their consumer and are never
    materialized).  Any op whose fingerprint (config + ancestors + code
    + source files) matches a completed cache entry is read back from
    Parquet instead of recomputed — editing one mid-DAG op recomputes
    only its suffix.  When ``registry_dir`` is set, the run is recorded
    in the run-metadata registry (registry.py) with per-operator
    fingerprint / status / rows / wall seconds.
    """
    import time as _time

    import pyarrow.parquet as pq
    import ray.data as rd

    from .yaml_pipeline import execute_op, expand_includes, parse_pipeline

    t_run = _time.time()
    doc = expand_includes(doc)
    ops = parse_pipeline(doc)
    os.makedirs(cache_dir, exist_ok=True)
    results: dict[str, object] = {}
    fps: dict[str, str] = {}
    report: dict[str, str] = {}
    stages: list[dict] = []
    for op in ops:
        cfg = dict(op.config)
        typ = cfg.pop("type")
        no_cache = bool(cfg.pop("no_cache", False)) or typ == "identity"
        fp = op_fingerprint(typ, cfg, [fps[i] for i in op.input_ids])
        fps[op.id] = fp
        t0 = _time.time()
        rows = None
        if no_cache:
            results[op.id] = execute_op(
                typ, cfg, [results[i] for i in op.input_ids])
            report[op.id] = "streamed"
        else:
            entry = os.path.join(cache_dir, fp)
            meta_path = os.path.join(entry, "meta.json")
            data_dir = os.path.join(entry, "data")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    rows = json.load(f).get("rows")
                results[op.id] = rd.read_parquet(data_dir)
                report[op.id] = "hit"
            else:
                out = execute_op(typ, cfg,
                                 [results[i] for i in op.input_ids])
                staging = entry + ".staging"
                if os.path.isdir(staging):
                    shutil.rmtree(staging)
                os.makedirs(staging)
                out.write_parquet(os.path.join(staging, "data"))
                rows = sum(
                    pq.read_metadata(p).num_rows
                    for p in glob.glob(os.path.join(staging, "data",
                                                    "*.parquet")))
                with open(os.path.join(staging, "meta.json"), "w") as f:
                    json.dump({"op_id": op.id, "type": typ,
                               "fingerprint": fp, "rows": rows}, f)
                if os.path.isdir(entry):
                    shutil.rmtree(entry)
                os.replace(staging, entry)
                # read back so downstream ops consume the persisted
                # artifact (identical bytes, and a crash later in the
                # DAG resumes here)
                results[op.id] = rd.read_parquet(data_dir)
                report[op.id] = "computed"
        stages.append({"op_id": op.id, "type": typ, "fingerprint": fp,
                       "status": report[op.id], "rows": rows,
                       "wall_s": round(_time.time() - t0, 3)})
    if registry_dir:
        from .registry import RunRegistry

        RunRegistry(registry_dir).record(
            "yaml_cached", stages,
            meta={"cache_dir": cache_dir, "n_ops": len(ops)},
            started_at=t_run)
    return results[output_id or ops[-1].id], report
