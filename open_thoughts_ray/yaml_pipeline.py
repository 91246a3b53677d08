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
import os
from dataclasses import dataclass

import pyarrow.compute as pc


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


#: plugin surface: type name → handler(inputs: list[Dataset], cfg: dict)
#: → Dataset (the reference's register_operator, operator.py:156-219)
YAML_OP_REGISTRY: dict = {}


def register_yaml_op(name: str, handler) -> None:
    YAML_OP_REGISTRY[name] = handler


def _remote_args(cfg: dict) -> dict:
    """Per-op resource reservation from YAML (the reference's
    cpu_function/gpu_function/high_memory_function family,
    function_operator.py:456-600): ``num_cpus``, ``memory`` (GB),
    ``concurrency``, ``batch_size`` keys pass straight to map_batches."""
    out = {}
    if "num_cpus" in cfg:
        out["num_cpus"] = float(cfg["num_cpus"])
    if "num_gpus" in cfg:
        # gpu_function passthrough (function_operator.py:519-545): the
        # sandbox has no GPU, but configs carrying num_gpus must stay
        # portable — the kwarg reaches map_batches untouched
        out["num_gpus"] = float(cfg["num_gpus"])
    if "memory" in cfg:
        out["memory"] = float(cfg["memory"]) * 1e9
    if "concurrency" in cfg:
        c = cfg["concurrency"]
        out["concurrency"] = tuple(c) if isinstance(c, list) else int(c)
    if "batch_size" in cfg:
        out["batch_size"] = int(cfg["batch_size"])
    return out


#: reference type-name vocabulary → this grammar's canonical type.  The
#: resource-function family differs only in the _remote_args it carries
#: (function_operator.py:456-600); `merge` is the reference's
#: function-with-multiple-inputs (merge_operator.py:19-30 — function +
#: input_dataset_map), which `function` already is here; shard/truncate
#: are renames; dclm_refinedweb_source maps onto the resilient sharded
#: jsonl source (same num_shards/seed surface).
_TYPE_ALIASES = {
    "cpu_function": "function",
    "gpu_function": "function",
    "high_memory_function": "function",
    "generic_resource_function": "function",
    "async_function": "function",
    "merge": "function",
    "local_json_source": "json_source",
    "dclm_refinedweb_source": "sharded_jsonl_source",
    "completions_tacc": "completions",
    "index_flat_ip_similarity_filtering": "similarity_filtering",
    "remove_columns": "drop_columns",
}


def _yaml_conjuncts(spec) -> list[tuple] | None:
    """YAML ``filter:`` → zone-map conjuncts.  Accepts a list of
    ``{column, op, value}`` maps or 3-element lists; ops are the
    prune-safe set (== < <= > >=).  None/empty → no pushdown."""
    if not spec:
        return None
    out = []
    for c in spec:
        if isinstance(c, dict):
            out.append((c["column"], c.get("op", "=="), c["value"]))
        else:
            col, op, val = c
            out.append((col, op, val))
    return out


def execute_op(typ: str, cfg: dict, ins: list):
    """Run ONE operator: type + config + input Datasets → output Dataset.
    Shared by the streaming runner (run_pipeline) and the cached runner
    (dagcache.run_pipeline_cached)."""
    import ray.data as rd

    from .ops import relational as R

    typ = _TYPE_ALIASES.get(typ, typ)
    if True:
        if typ == "identity":
            # pass-through seam used by load_preexisting expansion: keeps
            # the including op's id addressable without rewiring consumers
            out = ins[0]
        elif typ == "parquet_source":
            out = rd.read_parquet(cfg["path"], columns=cfg.get("columns"))
            if cfg.get("limit"):
                out = out.limit(int(cfg["limit"]))
        elif typ == "lance_source":
            from .io import lance_table

            out = lance_table.read_dataset(
                cfg["path"], columns=cfg.get("columns"),
                filter_conjuncts=_yaml_conjuncts(cfg.get("filter")))
        elif typ == "hf_source":
            # reference hf_source (hf_source_operator.py): load + project
            # + truncate + constant provenance column.  No network here:
            # ``dataset`` / ``path`` must point at a LOCAL Lance-style or
            # parquet table (the documented swap seam for hub loading).
            from .io import lance_table

            path = cfg.get("path") or cfg["dataset"]
            conj = _yaml_conjuncts(cfg.get("filter"))
            if os.path.isdir(path) and os.path.exists(
                    os.path.join(path, "manifest.json")):
                out = lance_table.read_dataset(path,
                                               columns=cfg.get("columns"),
                                               filter_conjuncts=conj)
            elif conj:
                import pyarrow.dataset as _pads

                expr = None
                for col, op, val in conj:
                    f = _pads.field(col)
                    e = {"==": f == val, "<": f < val, "<=": f <= val,
                         ">": f > val, ">=": f >= val}[op]
                    expr = e if expr is None else (expr & e)
                out = rd.read_parquet(path, columns=cfg.get("columns"),
                                      filter=expr)
            else:
                out = rd.read_parquet(path, columns=cfg.get("columns"))
            if cfg.get("limit") or cfg.get("num_truncate"):
                out = out.limit(int(cfg.get("limit",
                                            cfg.get("num_truncate"))))
            if cfg.get("source_tag") is not None:
                out = R.add_constant_columns(
                    out, {"source": cfg["source_tag"]})
        elif typ == "fasttext":
            # reference fasttext_operator.py:32-44 surface: score each
            # row's input_column with a fastText-style classifier, then
            # just_add_scores / threshold filter / global top-percentage.
            # The model is the deterministic builtin langid stand-in
            # (hf_repo_id download is the documented swap seam).
            import ray as _ray

            from .models import artifacts
            from .ops.langid import LangIdScorer

            ra = _remote_args(cfg)
            text_column = cfg.get("input_column", "text")
            bin_source = cfg.get("fasttext_path")
            if cfg.get("hf_repo_id") is not None:
                raise NotImplementedError(
                    "hf_repo_id model download is the documented network "
                    "swap seam (fasttext_operator.py:163-176); pass a "
                    "local .bin via fasttext_path instead")
            if bin_source is not None:
                # real fastText .bin (e.g. lid.176.bin) through the fcntl
                # node cache — ship the PATH, each actor/worker loads once
                model_ref = None
            else:
                model_ref = _ray.put(artifacts.get_artifact_bytes("langid"))
            if ra.get("concurrency") is not None or ra.get("num_gpus"):
                # explicit pool config (e.g. GPU stage) → actor pool
                scored = ins[0].map_batches(
                    LangIdScorer, batch_format="pyarrow",
                    batch_size=ra.get("batch_size", 500),
                    concurrency=ra.get("concurrency", 2),
                    num_cpus=ra.get("num_cpus", 1),
                    num_gpus=ra.get("num_gpus", 0),
                    fn_constructor_kwargs={
                        "model_ref": model_ref,
                        "text_column": text_column,
                        "bin_source": bin_source,
                    },
                )
            else:
                # default: plain tasks + per-worker model cache — fills
                # every core with no pool sizing, and composes: two
                # chained FIXED pools over-reserve a small cluster and
                # deadlock the streaming executor (tests/test_align.py
                # found this with gate→align; same for fasttext→embed)
                from .ops.bcast import cached_build, cached_build_local

                def _score(batch, *, _ref=model_ref, _col=text_column,
                           _bin=bin_source):
                    if _bin is not None:
                        scorer = cached_build_local(
                            f"langid-bin:{_col}:{_bin}",
                            lambda _k: LangIdScorer(bin_source=_bin,
                                                    text_column=_col))
                    else:
                        scorer = cached_build(
                            _ref,
                            lambda b: LangIdScorer(model_bytes=b,
                                                   text_column=_col),
                            tag=f"langid:{_col}")
                    return scorer(batch)

                scored = ins[0].map_batches(
                    _score, batch_format="pyarrow",
                    batch_size=ra.get("batch_size", 500))
            target = cfg.get("target_label")
            if cfg.get("just_add_scores") or target is None:
                out = scored
            elif cfg.get("top_percentage_ranking") is not None:
                # GLOBAL quantile, not per-shard (the reference's
                # per-shard percentile bug, fasttext_operator.py:148-152,
                # fixed with the two-pass global threshold)
                frac = float(cfg["top_percentage_ranking"])
                matched = scored.map_batches(
                    lambda t, lbl=target: t.filter(
                        pc.equal(t.column("lang"), lbl)),
                    batch_format="pyarrow")
                out, _thr = R.global_quantile_threshold(
                    matched, "lang_conf", 1.0 - frac, keep="ge")
            else:
                thr = float(cfg.get("filter_threshold", 0.5))
                out = scored.map_batches(
                    lambda t, lbl=target, th=thr: t.filter(
                        pc.and_(pc.equal(t.column("lang"), lbl),
                                pc.greater_equal(t.column("lang_conf"),
                                                 th))),
                    batch_format="pyarrow")
        elif typ == "train_fasttext":
            # reference train_fasttext_operator.py: fit on positive +
            # negative inputs, emit the model artifact.  Output is a
            # 1-row Dataset carrying path + md5 so the DAG stays a
            # Dataset graph; the bytes land at ``output_path``.
            import hashlib as _hashlib

            from .ops.embed import train_text_classifier

            blob = train_text_classifier(
                ins[0], ins[1],
                text_column=cfg.get("input_column", "text"))
            out_path = cfg["output_path"]
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "wb") as f:
                f.write(blob)
            out = rd.from_items([{
                "model_path": out_path,
                "model_md5": _hashlib.md5(blob).hexdigest(),
                "n_bytes": len(blob),
            }])
        elif typ == "train_arpa":
            # KenLM-style workflow: fit a modified-Kneser-Ney n-gram LM
            # from the input corpus (distributed exact counts) and write
            # the ARPA interchange file; output is a 1-row artifact
            # Dataset like train_fasttext's.
            import hashlib as _hashlib

            from .models.arpa import ArpaLM, count_ngrams_distributed

            counts = count_ngrams_distributed(
                ins[0], cfg.get("input_column", "text"),
                int(cfg.get("order", 2)))
            text = ArpaLM.from_counts(counts,
                                      int(cfg.get("order", 2))).to_arpa()
            out_path = cfg["output_path"]
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "w") as f:
                f.write(text)
            out = rd.from_items([{
                "model_path": out_path,
                "model_md5": _hashlib.md5(text.encode()).hexdigest(),
                "n_bytes": len(text),
            }])
        elif typ == "arpa_perplexity":
            # score input_column with an ARPA backoff LM loaded from
            # ``arpa_path`` (one parse per worker via the module cache);
            # optional ``ppl_max`` keep-filter — the KenLM quality-filter
            # shape with the real interchange format.
            from .ops.bcast import cached_build_local

            arpa_path = cfg["arpa_path"]
            col = cfg.get("input_column", "text")
            out_col = cfg.get("output_column", "arpa_ppl")

            def _ppl(batch, *, _p=arpa_path, _c=col, _o=out_col):
                import pyarrow as pa

                from .models.arpa import ArpaLM

                lm = cached_build_local(
                    f"arpa:{_p}",
                    lambda _k: ArpaLM.read_arpa(open(_p).read()))
                return batch.append_column(
                    _o, pa.array(lm.perplexity_batch(
                        batch.column(_c).to_pylist()), pa.float32()))

            ra = _remote_args(cfg)
            out = ins[0].map_batches(_ppl, batch_format="pyarrow",
                                     batch_size=ra.get("batch_size", 512))
            if cfg.get("ppl_max") is not None:
                mx = float(cfg["ppl_max"])
                out = out.map_batches(
                    lambda t, _m=mx, _o=out_col: t.filter(
                        pc.less_equal(t.column(_o), _m)),
                    batch_format="pyarrow")
        elif typ == "embedding":
            from .ops.embed import embed_dataset

            ra = _remote_args(cfg)
            out = embed_dataset(
                ins[0], text_column=cfg.get("input_column", "text"),
                concurrency=ra.get("concurrency"),  # None → task layout
                batch_size=ra.get("batch_size", 1024),
                # real pretrained word vectors (word2vec .vec / GloVe
                # text file) instead of the hashed stand-in; mirrors the
                # reference's model_name seam
                # (embedding_operator.py:106-128)
                vec_path=cfg.get("vec_path"))
        elif typ == "similarity_filtering":
            # reference similarity_filtering_operator.py:93-114
            # (first-seen-wins FAISS filter) — the deterministic cosine
            # equivalent; exact below max_exact_rows, LSH above
            from .ops.similarity import cosine_dedup_earlier

            out = cosine_dedup_earlier(
                ins[0], float(cfg.get("similarity_threshold", 0.95)),
                id_col=cfg.get("id_column", "vec_id"),
                emb_col=cfg.get("embedding_column", "embedding"))
        elif typ == "function":
            fn = _resolve(cfg["function"])
            out = fn(*ins, **cfg.get("function_config", {}))
        elif typ == "map_batches_function":
            fn = _resolve(cfg["function"])
            out = ins[0].map_batches(
                fn, batch_format=cfg.get("batch_format", "pyarrow"),
                fn_kwargs=cfg.get("function_config", {}),
                **_remote_args(cfg),
            )
        elif typ == "json_source":
            from .io.json_source import read_json_source

            out = read_json_source(
                cfg["path"], columns=cfg.get("columns"),
                limit=cfg.get("limit"), source_tag=cfg.get("source_tag"),
            )
        elif typ == "sharded_jsonl_source":
            # the dclm_refinedweb_source grammar: seeded shard sample +
            # bounded in-task retry/backoff (num_shards/seed per the
            # reference YAMLs, e.g. webinstruct_stage_1_3.yaml:10-13)
            from .io.json_source import read_sharded_jsonl_resilient

            out = read_sharded_jsonl_resilient(
                cfg["path"],
                num_shards=cfg.get("num_shards"),
                seed=int(cfg.get("seed", 314)),
                columns=cfg.get("columns"),
                max_retries=int(cfg.get("max_retries", 7)),
                backoff_base_s=float(cfg.get("backoff_base_s", 0.5)),
                shard_path_col=cfg.get("shard_path_col"),
            )
        elif typ == "completions":
            from .llm import completions, shared_rate_limiter

            limiter = None
            if cfg.get("requests_per_min") or cfg.get("tokens_per_min"):
                rpm = float(cfg.get("requests_per_min", 1e9))
                tpm = float(cfg.get("tokens_per_min", 1e12))
                # default limiter name encodes the rates: two completions
                # ops with DIFFERENT budgets get different actors instead
                # of the second silently reusing the first's limits
                # (ADVICE r2); name them identically via ``limiter_name``
                # to deliberately share one budget.
                default_name = f"otr_completions_limiter_{rpm:g}_{tpm:g}"
                limiter = shared_rate_limiter(
                    requests_per_min=rpm, tokens_per_min=tpm,
                    name=cfg.get("limiter_name", default_name),
                )
            ra = _remote_args(cfg)
            out = completions(
                ins[0], cfg["map"], cfg.get("map_config", {}),
                backend=cfg.get("backend", "mock"),
                backend_kwargs=cfg.get("backend_config"),
                limiter=limiter,
                concurrency=ra.get("concurrency", 4),
                batch_size=ra.get("batch_size", 256),
                num_cpus=ra.get("num_cpus", 0.5),
                max_retries=int(cfg.get("max_retries", 3)),
                on_parse_error=cfg.get("on_parse_error", "raise"),
                cache_dir=cfg.get("cache_dir"),
            )
        elif typ == "select_columns":
            out = ins[0].select_columns(cfg["columns"])
        elif typ == "rename_columns":
            out = ins[0].rename_columns(cfg["mapping"])
        elif typ == "filter_in":
            out = R.filter_in(ins[0], cfg["column"], cfg["values"])
        elif typ == "limit" or typ == "truncate":
            # reference truncate_operator.py:27 names the key num_truncate
            out = ins[0].limit(int(cfg.get("n", cfg.get("num_truncate", 0))))
        elif typ == "drop_columns":
            out = ins[0].drop_columns(cfg["columns"])
        elif typ == "concatenate":
            out = R.union_all(ins)
        elif typ == "mix":
            out = R.mix(ins, seed=int(cfg.get("seed", 42)))
        elif typ == "repartition" or typ == "shard":
            # reference shard_operator.py:31 names the key num_shards
            out = ins[0].repartition(
                int(cfg.get("num_blocks", cfg.get("num_shards", 0))))
        elif typ == "dedup_exact":
            from .ops.dedup import exact_dedup

            out = exact_dedup(ins[0], cfg["key_columns"], cfg["order_column"])
        elif typ == "dedup_minhash":
            from .ops.dedup_text import minhash_lsh_dedup

            out = minhash_lsh_dedup(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                threshold=float(cfg.get("threshold", 0.7)),
                k=int(cfg.get("num_hashes", 64)),
                bands=int(cfg.get("bands", 16)),
                shingle_n=int(cfg.get("shingle_n", 3)),
            )
        elif typ == "dedup_simhash":
            from .ops.dedup_text import simhash_dedup

            out = simhash_dedup(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                hamming_max=int(cfg.get("hamming_max", 3)),
            )
        elif typ == "dedup_ngram_jaccard":
            from .ops.dedup_text import ngram_jaccard_dedup

            out = ngram_jaccard_dedup(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                n=int(cfg.get("ngram_n", 3)),
                threshold=float(cfg.get("threshold", 0.8)),
            )
        elif typ == "dedup_fuzzy":
            from .ops.fuzzy import fuzzy_dedup

            out = fuzzy_dedup(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                ratio_threshold=float(cfg.get("ratio_threshold", 90.0)),
            )
        elif typ == "bm25_topk":
            from .ops.retrieval import bm25_topk

            out = bm25_topk(
                ins[0], {int(k): v for k, v in cfg["queries"].items()},
                k=int(cfg.get("k", 10)),
                id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"))
        elif typ == "hybrid_rrf_topk":
            from .ops.retrieval import hybrid_rrf_topk

            out = hybrid_rrf_topk(
                ins[0], {int(k): v for k, v in cfg["queries"].items()},
                k=int(cfg.get("k", 10)),
                id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"))
        elif typ == "rerank_token_f1":
            from .ops.retrieval import token_f1_rerank

            # inputs: [corpus, candidates]
            out = token_f1_rerank(
                ins[0], ins[1],
                {int(k): v for k, v in cfg["queries"].items()},
                k=int(cfg.get("k", 5)),
                id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"))
        elif typ == "boilerplate_removal":
            from .ops.boilerplate import remove_boilerplate_lines

            out = remove_boilerplate_lines(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                line_tokens=cfg.get("line_tokens", 6),
                min_df=int(cfg.get("min_df", 2)),
            )
        elif typ == "dedup_lines_within_doc":
            from .ops.boilerplate import dedup_lines_within_doc

            out = dedup_lines_within_doc(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                line_tokens=cfg.get("line_tokens", 6),
            )
        elif typ == "zscore":
            out = R.zscore_column(ins[0], cfg["column"],
                                  cfg.get("output_column"))
        elif typ == "minmax_normalize":
            out = R.minmax_normalize_column(ins[0], cfg["column"],
                                            cfg.get("output_column"))
        elif typ == "robust_scale":
            out = R.robust_scale_column(ins[0], cfg["column"],
                                        cfg.get("output_column"))
        elif typ == "tfidf_top_terms":
            from .ops.retrieval import tfidf_top_terms

            out = tfidf_top_terms(
                ins[0], id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("text_column", "text"),
                k=int(cfg.get("k", 3)),
            )
        elif typ == "decontaminate":
            from .ops.decontaminate import decontaminate

            out = decontaminate(
                ins[0], cfg["benchmark_texts"],
                text_column=cfg.get("text_column", "text"),
                ngram_n=int(cfg.get("ngram_n", 8)),
                overlap_threshold=float(cfg.get("overlap_threshold", 0.5)),
                mode=cfg.get("mode", "drop"),
            )
        elif typ == "quality_filter":
            from .pipeline import PipelineOptions, quality_filter_dataset

            out = quality_filter_dataset(ins[0], PipelineOptions())
        elif typ == "sessionize":
            from .ops.temporal import sessionize

            out = sessionize(ins[0], key=cfg["key"], ts_col=cfg["ts_column"],
                             gap_s=int(cfg["gap_s"]))
        elif typ == "asof_join":
            from .ops.temporal import asof_join

            # inputs: [left, right]
            out = asof_join(ins[0], ins[1], key=cfg["key"],
                            ts=cfg["ts_column"],
                            right_value_cols=cfg["right_value_columns"])
        elif typ == "interval_join":
            from .ops.temporal import interval_join

            out = interval_join(
                ins[0], ins[1], left_ts=cfg["left_ts"],
                right_ts=cfg["right_ts"],
                lower_us=int(cfg["lower_us"]), upper_us=int(cfg["upper_us"]),
                left_cols=cfg["left_columns"],
                right_cols=cfg["right_columns"],
                hot_bucket_rows=cfg.get("hot_bucket_rows", 1_000_000),
                salt_factor=int(cfg.get("salt_factor", 8)))
        elif typ == "rolling_sum":
            from .ops.temporal import rolling_sum_per_key

            out = rolling_sum_per_key(
                ins[0], key=cfg["key"], ts_col=cfg["ts_column"],
                order_col=cfg["order_column"], value_col=cfg["value_column"],
                window_rows=int(cfg["window_rows"]),
                out_col=cfg.get("output_column", "rolling_sum"))
        elif typ == "majority_vote":
            from .ops.consensus import majority_vote

            out = majority_vote(ins[0], cfg["group_column"],
                                cfg["value_column"],
                                out_col=cfg.get("output_column"))
        elif typ == "top_n_per_group":
            out = R.top_n_per_group(
                ins[0], cfg["group_column"], cfg["order_columns"],
                n=int(cfg.get("n", 1)),
                descending=bool(cfg.get("descending", True)))
        elif typ == "bottom_k":
            out = R.bottom_k_by(ins[0], cfg["order_columns"],
                                int(cfg["k"]))
        elif typ == "grouped_quantile":
            out = R.grouped_quantile(ins[0], cfg["group_column"],
                                     cfg["value_column"], float(cfg["q"]),
                                     out_col=cfg.get("output_column"))
        elif typ == "grouped_ntile":
            out = R.grouped_ntile(ins[0], cfg["group_column"],
                                  cfg["order_columns"], int(cfg["n"]),
                                  out_col=cfg.get("output_column", "tile"))
        elif typ == "image_resize":
            from .ops.multimodal import ImageResizer

            ra = _remote_args(cfg)
            resizer = ImageResizer(target=int(cfg.get("target", 32)))
            # byte-sized batches: payloads, not rows, bound memory
            out = ins[0].map_batches(
                resizer.__call__, batch_format="pyarrow",
                batch_size=ra.get("batch_size", 64))
        elif typ == "image_features":
            from .ops.multimodal import ImageFeatureExtractor

            ra = _remote_args(cfg)
            fx = ImageFeatureExtractor()
            out = ins[0].map_batches(
                fx.__call__, batch_format="pyarrow",
                batch_size=ra.get("batch_size", 64))
        elif typ == "audio_energy_gate":
            from .ops.audio import energy_gate

            out = energy_gate(
                ins[0], min_rms=float(cfg.get("min_rms", 0.01)),
                min_duration_s=float(cfg.get("min_duration_s", 0.2)),
                bytes_col=cfg.get("bytes_column", "bytes"))
        elif typ == "audio_features":
            from .ops.audio import AudioFeatureStage

            ra = _remote_args(cfg)
            st = AudioFeatureStage(
                frame_ms=int(cfg.get("frame_ms", 25)),
                n_bands=int(cfg.get("n_bands", 8)),
                bytes_col=cfg.get("bytes_column", "bytes"))
            out = ins[0].map_batches(
                st.__call__, batch_format="pyarrow",
                batch_size=ra.get("batch_size", 64))
        elif typ == "video_frame_sample":
            from .ops.video import frame_sample

            out = frame_sample(
                ins[0], every_n=int(cfg.get("every_n", 10)),
                id_col=cfg.get("id_column", "video_id"),
                bytes_col=cfg.get("bytes_column", "bytes"))
        elif typ == "video_scene_cuts":
            from .ops.video import scene_cut_stage

            out = scene_cut_stage(
                ins[0], threshold=float(cfg.get("threshold", 30.0)),
                id_col=cfg.get("id_column", "video_id"),
                bytes_col=cfg.get("bytes_column", "bytes"))
        elif typ == "tree_search":
            from .llm.tree_search import tree_search

            out = tree_search(
                ins[0],
                prompt_col=cfg.get("prompt_column", "instruction"),
                id_col=cfg.get("id_column", "doc_id"),
                beam_width=int(cfg.get("beam_width", 3)),
                beam_depth=int(cfg.get("beam_depth", 2)),
                node_budget=cfg.get("node_budget"),
                backend=cfg.get("backend", "mock"))
        elif typ == "dedup_delta_minhash":
            from .ops.dedup_text import delta_neardup_ingest

            # inputs: [new_shard, seen_corpus]
            out = delta_neardup_ingest(
                ins[0], ins[1],
                id_col=cfg.get("id_column", "doc_id"),
                text_col=cfg.get("input_column", "text"),
                threshold=float(cfg.get("threshold", 0.7)),
                hasher=cfg.get("hasher", "crc"))
        elif typ == "kcenter_select":
            from .ops.diversity import kcenter_select_dataset

            out = kcenter_select_dataset(
                ins[0], k=int(cfg["k"]),
                id_col=cfg.get("id_column", "vec_id"),
                emb_col=cfg.get("embedding_column", "embedding"),
                sample_frac=cfg.get("sample_frac"))
        elif typ == "image_search":
            from .ops.align import image_search

            out = image_search(
                ins[0], {int(k): v for k, v in cfg["queries"].items()},
                k=int(cfg.get("k", 5)),
                id_col=cfg.get("id_column", "image_id"))
        elif typ == "token_budget_select":
            from .ops.packing import token_budget_select

            out = token_budget_select(
                ins[0], cfg["group_column"], cfg["order_column"],
                cfg["tokens_column"], budget=int(cfg["budget"]),
                id_col=cfg["id_column"],
                ascending=bool(cfg.get("ascending", False)))
        elif typ == "distill_quality_filter":
            from .distill import distilled_quality_filter

            out, _model = distilled_quality_filter(
                ins[0],
                keep_threshold=float(cfg.get("keep_threshold", 0.5)),
                text_col=cfg.get("input_column", "text"),
                id_col=cfg.get("id_column", "doc_id"),
                sample_frac=float(cfg.get("sample_frac", 0.05)),
                score_threshold=float(cfg.get("score_threshold", 50.0)),
                backend=cfg.get("backend", "mock"),
                backend_kwargs=cfg.get("backend_kwargs"),
                cache_dir=cfg.get("cache_dir"))
        elif typ == "image_geometry_gate":
            import functools

            from .ops.multimodal import geometry_gate_batch

            kw = {k: cfg[k] for k in
                  ("min_side", "min_pixels", "max_aspect", "mode")
                  if k in cfg}
            # metadata-only (w/h columns) — payload bytes never read
            out = ins[0].map_batches(
                functools.partial(geometry_gate_batch, **kw),
                batch_format="pyarrow")
        elif typ == "near_dup_images":
            from .ops.dedup import near_dup_keep_best

            out = near_dup_keep_best(
                ins[0], id_col=cfg.get("id_column", "image_id"),
                phash_col=cfg.get("phash_column", "phash"),
                quality_col=cfg.get("quality_column", "quality"),
                bands=int(cfg.get("bands", 2)),
                hamming_max=int(cfg.get("hamming_max", 3)),
                num_partitions=int(cfg.get("num_partitions", 64)))
        elif typ == "image_quality_gate":
            from .ops.multimodal import ImageQualityGate

            ra = _remote_args(cfg)
            # stateless gate → plain tasks (fills every core, nothing
            # to cache per actor; chained fixed pools can over-reserve
            # a small cluster)
            gate = ImageQualityGate(**{
                k: cfg[k] for k in
                ("min_sharpness", "min_contrast", "max_clip_frac", "mode")
                if k in cfg})
            out = ins[0].map_batches(
                gate.__call__, batch_format="pyarrow",
                batch_size=ra.get("batch_size", 256))
        elif typ == "image_caption_alignment":
            from .ops.align import align_filter, align_score

            if cfg.get("mode", "annotate") == "filter":
                out = align_filter(
                    ins[0], min_score=float(cfg["min_score"]),
                    caption_col=cfg.get("caption_column", "caption"))
            else:
                out = align_score(
                    ins[0], caption_col=cfg.get("caption_column", "caption"),
                    out=cfg.get("output_column", "align_score"))
        elif typ in YAML_OP_REGISTRY:
            out = YAML_OP_REGISTRY[typ](ins, cfg)
        else:
            raise ValueError(f"unknown operator type {typ!r}")
        return out


def run_pipeline(doc: dict, output_id: str | None = None):
    """Execute a parsed YAML doc → the output Dataset (lazy, streaming;
    for resumable per-operator caching use dagcache.run_pipeline_cached).

    Branch points (an op consumed by ≥2 downstream ops) are
    ``materialize()``d: a lazy Dataset re-executes its whole lineage per
    consumer, which would duplicate upstream actor pools in one
    streaming graph (over-reserving the cluster) and re-run
    side-effecting stages like LLM completions once per branch.  The
    reference persists EVERY operator output
    (synthetic_data_manager.py:264-537); pinning only the shared
    prefixes keeps everything else streaming."""
    doc = expand_includes(doc)
    ops = parse_pipeline(doc)
    from collections import Counter

    fanout = Counter(i for op in ops for i in op.input_ids)
    results: dict[str, object] = {}
    for op in ops:
        cfg = dict(op.config)
        typ = cfg.pop("type")
        out = execute_op(typ, cfg, [results[i] for i in op.input_ids])
        if fanout[op.id] > 1 and hasattr(out, "materialize"):
            out = out.materialize()
        results[op.id] = out
    return results[output_id or ops[-1].id]


def expand_includes(doc: dict, base_dir: str = ".") -> dict:
    """Splice ``load_preexisting`` ops: each ``{type: load_preexisting,
    path: other.yaml, output_id?}`` inlines the referenced strategy file
    as a namespaced sub-DAG and becomes an ``identity`` op reading the
    sub-DAG's output — the reference's sub-DAG composition with id
    rewiring and shared-sub-DAG dedup
    (dcft/data_strategies/synthetic_data_manager.py:1228-1307).  Two
    includes of byte-identical files share ONE sub-DAG (content-hash
    namespace), like the reference's duplicate-subtree elision."""
    import copy
    import hashlib
    import os

    import yaml

    out_ops: list[dict] = []
    spliced: dict[str, str] = {}  # content hash -> namespaced output id
    for raw in doc["operators"]:
        cfg = raw.get("config", {})
        if cfg.get("type") != "load_preexisting":
            out_ops.append(copy.deepcopy(raw))
            continue
        path = os.path.join(base_dir, cfg["path"])
        with open(path) as f:
            text = f.read()
        h = hashlib.md5(text.encode()).hexdigest()[:10]
        ns = f"_sub_{h}"
        if h not in spliced:
            sub = expand_includes(yaml.safe_load(text),
                                  base_dir=os.path.dirname(path))
            # resolve the sub-DAG's default chaining HERE (relative to
            # its own op order), then namespace every id
            prev = None
            for sop in sub["operators"]:
                sop = copy.deepcopy(sop)
                scfg = sop["config"]
                is_source = scfg["type"].endswith("_source")
                inputs = sop.get("input_ids")
                if inputs is None:
                    inputs = [] if is_source or prev is None else [prev]
                prev = sop["id"]
                sop["input_ids"] = [f"{ns}/{i}" for i in inputs]
                sop["id"] = f"{ns}/{sop['id']}"
                out_ops.append(sop)
            sub_out = cfg.get("output_id") or sub["operators"][-1]["id"]
            spliced[h] = f"{ns}/{sub_out}"
        out_ops.append({"id": raw["id"],
                        "input_ids": [spliced[h]],
                        "config": {"type": "identity"}})
    return dict(doc, operators=out_ops)


def run_pipeline_file(path: str, output_id: str | None = None):
    import os

    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    return run_pipeline(expand_includes(doc, base_dir=os.path.dirname(path)),
                        output_id)
