"""Thin YAML veneer over the operator library (SURVEY.md §2.11).

The reference's primary user surface is a YAML DAG of operators
(1,971 strategy files; grammar in
dcft/data_strategies/synthetic_data_manager.py:1197-1313: ``operators:
[{id, input_ids?, config: {type, ...}}]``, default input = previous
operator, default output = last).  Here the same grammar drives plain
``ray.data.Dataset`` transforms; the primary extension surface remains
Python functions (`function:` dotted paths resolve to
``Callable[[Dataset, ...], Dataset]`` exactly like
engine/operators/function_operator.py:194-206).

Example::

    operators:
      - id: docs
        config: {type: parquet_source, path: /data/documents.parquet,
                 columns: [doc_id, text]}
      - id: en_only
        config: {type: function,
                 function: my_pkg.filters.keep_english,
                 function_config: {min_conf: 0.8}}
      - id: out
        config: {type: limit, n: 1000}
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass


@dataclass
class OpSpec:
    id: str
    input_ids: list[str]
    config: dict


def parse_pipeline(doc: dict) -> list[OpSpec]:
    """Validate + default-wire the operator list (chain to the previous
    op when ``input_ids`` is omitted, like synthetic_data_manager's
    parser); raises on duplicate ids, unknown inputs, or cycles (the
    list order must already be topological, as in the reference)."""
    ops: list[OpSpec] = []
    seen: set[str] = set()
    prev: str | None = None
    for raw in doc["operators"]:
        oid = raw["id"]
        if oid in seen:
            raise ValueError(f"duplicate operator id {oid!r}")
        cfg = dict(raw["config"])
        is_source = cfg["type"].endswith("_source")
        inputs = raw.get("input_ids")
        if inputs is None:
            inputs = [] if is_source or prev is None else [prev]
        for i in inputs:
            if i not in seen:
                raise ValueError(f"operator {oid!r} input {i!r} not defined before it")
        ops.append(OpSpec(oid, list(inputs), cfg))
        seen.add(oid)
        prev = oid
    return ops


def _resolve(dotted: str):
    mod, _, name = dotted.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def run_pipeline(doc: dict, output_id: str | None = None):
    """Execute a parsed YAML doc → the output Dataset (lazy)."""
    import ray.data as rd

    from .ops import relational as R

    ops = parse_pipeline(doc)
    results: dict[str, object] = {}
    for op in ops:
        cfg = dict(op.config)
        typ = cfg.pop("type")
        ins = [results[i] for i in op.input_ids]
        if typ == "parquet_source":
            out = rd.read_parquet(cfg["path"], columns=cfg.get("columns"))
            if cfg.get("limit"):
                out = out.limit(int(cfg["limit"]))
        elif typ == "lance_source":
            from .io import lance_table

            out = lance_table.read_dataset(cfg["path"], columns=cfg.get("columns"))
        elif typ == "function":
            fn = _resolve(cfg["function"])
            out = fn(*ins, **cfg.get("function_config", {}))
        elif typ == "map_batches_function":
            fn = _resolve(cfg["function"])
            out = ins[0].map_batches(
                fn, batch_format=cfg.get("batch_format", "pyarrow"),
                fn_kwargs=cfg.get("function_config", {}),
            )
        elif typ == "select_columns":
            out = ins[0].select_columns(cfg["columns"])
        elif typ == "rename_columns":
            out = ins[0].rename_columns(cfg["mapping"])
        elif typ == "filter_in":
            out = R.filter_in(ins[0], cfg["column"], cfg["values"])
        elif typ == "limit":
            out = ins[0].limit(int(cfg["n"]))
        elif typ == "concatenate":
            out = R.union_all(ins)
        elif typ == "mix":
            out = R.mix(ins, seed=int(cfg.get("seed", 42)))
        elif typ == "repartition":
            out = ins[0].repartition(int(cfg["num_blocks"]))
        elif typ == "dedup_exact":
            from .ops.dedup import exact_dedup

            out = exact_dedup(ins[0], cfg["key_columns"], cfg["order_column"])
        elif typ == "quality_filter":
            from .pipeline import PipelineOptions, quality_filter_dataset

            out = quality_filter_dataset(ins[0], PipelineOptions())
        else:
            raise ValueError(f"unknown operator type {typ!r}")
        results[op.id] = out
    return results[output_id or ops[-1].id]


def run_pipeline_file(path: str, output_id: str | None = None):
    import yaml

    with open(path) as f:
        return run_pipeline(yaml.safe_load(f), output_id)
