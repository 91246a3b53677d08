"""``ray job submit`` entrypoint: ``python -m open_thoughts_ray …``.

The reference submits pipelines to a cluster through
``JobSubmissionClient`` + runtime_env (synthetic_data_manager.py:596-737);
the Ray-Data-native equivalent is a plain module CLI handed to
``ray job submit``, e.g. on a running cluster::

    ray job submit --working-dir . -- \
        python -m open_thoughts_ray flagship \
            --table /data/images --out /data/decisions --cpus 256

    ray job submit --working-dir . -- \
        python -m open_thoughts_ray yaml examples/webdoc_curation.yaml \
            --format input_path=/data/corpus.jsonl --out /data/curated

Inside a submitted job ``ray.init()`` auto-connects to the hosting
cluster; standalone the guarded init below starts a local session.  The
CLI owns the session only when IT created it (never in tests where a
session fixture is active).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    """Guarded init: a submitted job / test session is already
    connected; standalone runs get a local one.  Returns True if we
    created the session (and therefore must shut it down)."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(ignore_reinit_error=True)
    return True


def _cmd_flagship(args) -> dict:
    from .pipeline import PipelineOptions, run_checkpointed

    opts = PipelineOptions.for_cluster(args.cpus)
    decisions_dir, metrics = run_checkpointed(
        args.table, args.out, opts, chunk_fragments=args.chunk_fragments
    )
    return {"decisions_dir": decisions_dir, **metrics}


def _cmd_yaml(args) -> dict:
    import yaml

    from .yaml_pipeline import run_pipeline

    with open(args.config) as f:
        text = f.read()
    for kv in args.format:
        # literal {key} replacement (str.format would trip on YAML
        # flow-style braces elsewhere in the document)
        key, val = kv.split("=", 1)
        text = text.replace("{" + key + "}", val)
    doc = yaml.safe_load(text)
    report = None
    if args.cache_dir:
        from .dagcache import run_pipeline_cached

        ds, report = run_pipeline_cached(
            doc, args.cache_dir, args.output_id,
            registry_dir=args.registry)
    else:
        ds = run_pipeline(doc, args.output_id)
    out: dict = {"rows": ds.count()}
    if report is not None:
        out["cache"] = report
    if args.out:
        if args.partition_by:
            # one directory per key value → a failed downstream run can
            # skip finished partitions (resumable-output layout)
            ds.write_parquet(args.out, partition_cols=[args.partition_by])
        else:
            ds.write_parquet(args.out)
        out["out"] = args.out
    return out


def _cmd_build_index(args) -> dict:
    from .ops.minhash_index import build_minhash_index

    import ray.data as rd

    ds = rd.read_parquet(args.table, columns=[args.id_column,
                                              args.text_column])
    out = build_minhash_index(ds, args.out, id_col=args.id_column,
                              text_col=args.text_column, k=args.k,
                              shingle_n=args.shingle_n,
                              hasher=args.hasher)
    return {"index_dir": out}


def _cmd_ingest(args) -> dict:
    from .ops.minhash_index import delta_neardup_vs_index

    import ray.data as rd

    new_ds = rd.read_parquet(args.delta)
    # survivors persist FIRST, the index append is the last idempotent
    # step (ADVICE r4: eager append + crash before --out write = a
    # retry finds each survivor's own signature and drops the delta)
    kept, commit = delta_neardup_vs_index(
        new_ds, args.index, id_col=args.id_column,
        text_col=args.text_column, bands=args.bands,
        threshold=args.threshold,
        update_index=not args.no_index_update,
        return_commit=True)
    kept = kept.materialize()
    out: dict = {"rows_kept": kept.count()}
    if args.out:
        # count from the kept dataset, not a re-read: write_parquet
        # APPENDs in Ray 2.49, so a re-run output dir would otherwise
        # mix older files into the count (ADVICE r4)
        kept.write_parquet(args.out)
        out["out"] = args.out
    commit()
    return out


def _cmd_build_exact_index(args) -> dict:
    from .ops.bloom_index import build_bloom_index

    import ray.data as rd

    ds = rd.read_parquet(args.table, columns=[args.text_column])
    out = build_bloom_index(ds, args.out, text_col=args.text_column,
                            n_parts=args.n_parts,
                            bits_per_key=args.bits_per_key,
                            prefix_tokens=args.prefix_tokens)
    return {"index_dir": out}


def _cmd_ingest_exact(args) -> dict:
    from .ops.bloom_index import delta_exact_dedup_vs_index

    import ray.data as rd

    new_ds = rd.read_parquet(args.delta)
    # same commit discipline as the MinHash ingest: survivors persist
    # FIRST, the index append is the last idempotent step
    kept, commit = delta_exact_dedup_vs_index(
        new_ds, args.index, id_col=args.id_column,
        text_col=args.text_column,
        update_index=not args.no_index_update,
        return_commit=True)
    kept = kept.materialize()
    out: dict = {"rows_kept": kept.count()}
    if args.out:
        kept.write_parquet(args.out)
        out["out"] = args.out
    commit()
    return out


def _cmd_runs(args) -> dict:
    from .registry import RunRegistry

    reg = RunRegistry(args.registry)
    table = reg.stage_table()
    if len(table):
        print(table.to_string(index=False), file=sys.stderr)
    return {"registry": reg.path, "n_runs": len(reg.runs()),
            "n_stage_rows": int(len(table))}


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="python -m open_thoughts_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="checkpointed image+caption quality filter")
    f.add_argument("--table", required=True, help="input Lance-layout table dir")
    f.add_argument("--out", required=True, help="output/checkpoint dir")
    f.add_argument("--cpus", type=int, default=32,
                   help="cluster CPU total used to size pools/partitions")
    f.add_argument("--chunk-fragments", type=int, default=16)
    f.set_defaults(fn=_cmd_flagship)

    y = sub.add_parser("yaml", help="run a YAML strategy DAG")
    y.add_argument("config")
    y.add_argument("--out", default=None, help="write result parquet here")
    y.add_argument("--output-id", default=None,
                   help="operator id to emit (default: last)")
    y.add_argument("--format", nargs="*", default=[], metavar="KEY=VALUE",
                   help="str.format substitutions applied to the YAML text")
    y.add_argument("--cache-dir", default=None,
                   help="per-operator content-addressed cache dir "
                        "(resumable reruns skip unchanged operators)")
    y.add_argument("--registry", default=None,
                   help="run-metadata registry dir (records per-operator "
                        "fingerprint/rows/wall time; see the runs command)")
    y.add_argument("--partition-by", default=None,
                   help="hive-partition the output parquet by this column "
                        "(one directory per value - resumable layout)")
    y.set_defaults(fn=_cmd_yaml)

    bi = sub.add_parser("build-index",
                        help="persist the MinHash signature index for a "
                             "corpus (incremental near-dup ingest)")
    bi.add_argument("--table", required=True, help="corpus parquet path/dir")
    bi.add_argument("--out", required=True, help="index output dir")
    bi.add_argument("--id-column", default="doc_id")
    bi.add_argument("--text-column", default="text")
    bi.add_argument("--k", type=int, default=64)
    bi.add_argument("--shingle-n", type=int, default=3)
    bi.add_argument("--hasher", default="crc", choices=["crc", "md5"])
    bi.set_defaults(fn=_cmd_build_index)

    ig = sub.add_parser("ingest",
                        help="vet a new parquet shard against a MinHash "
                             "index; keep non-duplicates, append their "
                             "signatures")
    ig.add_argument("--delta", required=True, help="new shard parquet")
    ig.add_argument("--index", required=True, help="index dir (build-index)")
    ig.add_argument("--out", default=None, help="write survivors here")
    ig.add_argument("--id-column", default="doc_id")
    ig.add_argument("--text-column", default="text")
    ig.add_argument("--bands", type=int, default=16)
    ig.add_argument("--threshold", type=float, default=0.7)
    ig.add_argument("--no-index-update", action="store_true",
                    help="vet only; do not append survivors' signatures")
    ig.set_defaults(fn=_cmd_ingest)

    bei = sub.add_parser("build-exact-index",
                         help="persist the Bloom + hash-partition exact-"
                              "dedup index for a corpus")
    bei.add_argument("--table", required=True, help="corpus parquet path/dir")
    bei.add_argument("--out", required=True, help="index output dir")
    bei.add_argument("--text-column", default="text")
    bei.add_argument("--n-parts", type=int, default=16)
    bei.add_argument("--bits-per-key", type=int, default=12)
    bei.add_argument("--prefix-tokens", type=int, default=None)
    bei.set_defaults(fn=_cmd_build_exact_index)

    ige = sub.add_parser("ingest-exact",
                         help="vet a new parquet shard against the exact "
                              "Bloom index; keep unseen rows, append "
                              "their fingerprints")
    ige.add_argument("--delta", required=True, help="new shard parquet")
    ige.add_argument("--index", required=True,
                     help="index dir (build-exact-index)")
    ige.add_argument("--out", default=None, help="write survivors here")
    ige.add_argument("--id-column", default="doc_id")
    ige.add_argument("--text-column", default="text")
    ige.add_argument("--no-index-update", action="store_true",
                     help="vet only; do not append survivors' hashes")
    ige.set_defaults(fn=_cmd_ingest_exact)

    r = sub.add_parser("runs", help="list recorded runs (per-operator "
                                    "fingerprint, cache status, rows, wall s)")
    r.add_argument("--registry", default=None,
                   help="registry dir (default $OTR_REGISTRY_DIR or /tmp/otr_runs)")
    r.set_defaults(fn=_cmd_runs)

    args = p.parse_args(argv)
    owns = _ensure_ray()
    try:
        result = args.fn(args)
    finally:
        if owns:
            import ray

            ray.shutdown()
    print(json.dumps(result, default=str))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
