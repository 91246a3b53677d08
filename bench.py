"""Benchmark runner (driver contract: prints ONE JSON line).

Headline: the flagship image+caption quality-filter pipeline
(checkpointed scale path) over a deterministically generated bench table
(cached under /tmp so both scaling runs see identical input).  Also times
a representative set of the SQL-checked queries over $GRAFT_SF_DIR.

    python bench.py              # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh processes at 8 and 32 CPUs on the
                                 # same input → throughputs + efficiency

Scaling evidence per BASELINE.json north_rule: no multi-node cluster in
this sandbox, so N vs 4N nodes is evidenced by N vs 4N CPUs in fresh
``ray.init`` processes (same input, page cache pre-warmed).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time

BENCH_TABLE = os.environ.get("OTR_BENCH_TABLE", "/tmp/otr_bench_images")
BENCH_N = int(os.environ.get("OTR_BENCH_N", "500000"))
BENCH_PARTS = int(os.environ.get("OTR_BENCH_PARTS", "256"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_SUBSET = [
    "q1_pricing_summary",
    "grouped_count_having",
    "top_k_events",
    "exact_dedup_documents",
    "broadcast_join_orders_customers",
    "hash_join_lineitem_orders",
    "window_events_hourly",
    "quality_stats_documents",
    "embedding_cosine_dedup",
    "ann_topk_embeddings",
    "minhash_dedup_documents",
    "simhash_dedup_documents",
    "llm_annotate_documents",
    "bm25_topk_documents",
    "chunk_documents",
    "boilerplate_removal_documents",
    "tfidf_top_terms_documents",
    "rrf_hybrid_topk_documents",
    # r4: grouped-analytics family after the partition-level
    # segment-walk rewrite (one pandas dispatch per partition, not per
    # key — VERDICT r3 #1)
    "sessionize_events",
    "asof_join_events",
    # r4 additions: token-budget quota (window-cumsum segment walk) and
    # the teacher→classifier distillation loop (sample-scored teacher +
    # full-corpus classifier scoring in plain tasks)
    "token_budget_select_documents",
    "distill_quality_documents",
    # persisted-index incremental near-dup ingest (build + vet)
    "delta_neardup_indexed_documents",
]


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _ensure_inputs():
    """Generate the bench table (cached) + warm artifacts + page cache."""
    from open_thoughts_ray.fixtures.images import build_images_table
    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.models.artifacts import get_artifact_bytes

    get_artifact_bytes("langid")
    get_artifact_bytes("lm")
    # thumbnail-sized payloads for the bench table: keeps the workload
    # CPU-bound (model scoring + rules) rather than saturating the single
    # host's memory bandwidth with pixel traffic; the correctness fixture
    # (tests) keeps the full 16-128px range
    build_images_table(BENCH_TABLE, n_rows=BENCH_N, n_parts=BENCH_PARTS, seed=42,
                       use_ray=True, with_meta=False, side_range=(16, 64))
    # warm the OS page cache so we measure compute+shuffle, not cold disk
    for p in lance_table.fragment_paths(BENCH_TABLE):
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    # warm the Ray worker pool: a fresh process pays ~5 s of python
    # worker forks + module imports on its FIRST pipeline (measured
    # 5.6 s cold vs 0.9 s warm at 16 CPUs on a 1k-row table) — a fixed
    # cost independent of data size (0.003 % at 100 TB, 23 % of the
    # 16-CPU level at bench scale) that would otherwise masquerade as
    # poor scaling.  Both scaling levels get the identical warmup.
    from open_thoughts_ray.pipeline import PipelineOptions, run_checkpointed

    warm_table = "/tmp/otr_warmup_table"
    build_images_table(warm_table, n_rows=1000, n_parts=2, seed=3,
                       with_meta=False, side_range=(16, 32))
    warm_out = "/tmp/otr_warmup_out"
    shutil.rmtree(warm_out, ignore_errors=True)
    run_checkpointed(warm_table, warm_out,
                     PipelineOptions.for_cluster(NUM_CPUS),
                     chunk_fragments=2)


def run_flagship(num_cpus: int) -> dict:
    from open_thoughts_ray.pipeline import PipelineOptions, run_checkpointed

    out_dir = f"/tmp/otr_bench_out_{num_cpus}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    opts = PipelineOptions.for_cluster(num_cpus)
    t0 = time.time()
    # single chunk for the throughput number: chunked resume is exercised
    # by tests/test_checkpoint.py; per-chunk actor-pool restarts would
    # only measure startup overhead here
    _decisions_dir, metrics = run_checkpointed(
        BENCH_TABLE, out_dir, opts, chunk_fragments=BENCH_PARTS
    )
    dt = time.time() - t0
    return {"sec": dt, "images_per_sec": BENCH_N / dt, "rows": metrics["rows"],
            "kept": metrics["kept"]}


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as E

    qs = E.queries()
    out = {}
    for name in QUERY_SUBSET:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def main_single() -> dict:
    _init_ray(NUM_CPUS)
    _ensure_inputs()
    flagship = run_flagship(NUM_CPUS)
    queries = {} if os.environ.get("OTR_BENCH_FLAGSHIP_ONLY") else run_queries(SF_DIR)
    doc = {
        "metric": "flagship quality-filter wall time (sec) over "
                  f"{BENCH_N} synthesized image+caption rows",
        "value": round(flagship["sec"], 2),
        "unit": "sec",
        "images_per_sec": round(flagship["images_per_sec"], 1),
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_rows": BENCH_N,
    }
    import ray

    ray.shutdown()
    return doc


def _subprocess_run(num_cpus: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus), OTR_BENCH_FLAGSHIP_ONLY="1")
    cmd = [sys.executable, os.path.abspath(__file__)]
    if shutil.which("taskset"):
        # pin the whole Ray session to num_cpus PHYSICAL cores: scheduler
        # tokens alone don't confine fractional-CPU actor pools, which
        # would let the small-cluster run borrow idle cores and corrupt
        # the scaling-efficiency measurement
        cmd = ["taskset", "-c", f"0-{num_cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn_throughput(n: int, iters: int = 30_000_000) -> float:
    """Aggregate machine throughput (loop-iterations/sec) of n identical
    single-core busy loops RIGHT NOW — a per-window probe.  Measured
    immediately before each scaling level runs, it attributes host-load
    drift to the window it happened in (the end-of-run ceiling can't:
    the host may have been idle for one level and contended for the
    other)."""
    ps = [
        subprocess.Popen([sys.executable, "-c",
                          f"x=0\nfor i in range({iters}): x+=i"])
        for _ in range(n)
    ]
    t0 = time.time()
    for p in ps:
        p.wait()
    return n * iters / (time.time() - t0)


def _machine_ceiling(lo: int, hi: int) -> float:
    """This VM's own strong-scaling limit: aggregate throughput ratio of
    n identical single-core pure-Python busy loops at n=lo vs n=hi.
    On ideal hardware this is 1.0; on this sandbox's shared vCPUs it
    measures ~0.75 for 8→32 — no pipeline can scale better than the
    machine it runs on, so BASELINE.md reports efficiency both raw and
    normalized by this ceiling."""

    def burn_n(n: int) -> float:
        ps = [
            subprocess.Popen([sys.executable, "-c",
                              "x=0\nfor i in range(40_000_000): x+=i"])
            for _ in range(n)
        ]
        t0 = time.time()
        for p in ps:
            p.wait()
        return time.time() - t0

    t_lo, t_hi = burn_n(lo), burn_n(hi)
    return ((hi / t_hi) / (lo / t_lo)) / (hi / lo)


def main_scaling() -> dict:
    # Scaling mode uses a larger input than the plain bench (unless the
    # caller pinned OTR_BENCH_N): the fixed shuffle/launch overheads
    # (~10 s) must be amortized for the efficiency measurement to
    # reflect the pipeline rather than constant costs.
    global BENCH_N, BENCH_PARTS
    if "OTR_BENCH_N" not in os.environ:
        BENCH_N, BENCH_PARTS = 2_000_000, 512
        os.environ["OTR_BENCH_N"] = str(BENCH_N)
        os.environ["OTR_BENCH_PARTS"] = str(BENCH_PARTS)
    # generate the shared input once (also warms /tmp artifact cache)
    _init_ray(NUM_CPUS)
    _ensure_inputs()
    import ray

    ray.shutdown()
    lo, hi = (int(x) for x in os.environ.get("OTR_SCALING_LEVELS", "4,16").split(","))
    reps = int(os.environ.get("OTR_SCALING_REPS", "2"))
    # the sandbox host is time-shared: repeat each level and take the min
    # (least-interference estimate), interleaving levels to balance drift
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        m_lo = _burn_throughput(lo)
        r = _subprocess_run(lo)
        r["machine_thr"] = m_lo
        runs_lo.append(r)
        m_hi = _burn_throughput(hi)
        r = _subprocess_run(hi)
        r["machine_thr"] = m_hi
        runs_hi.append(r)
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # window-matched normalization: ideal scaling equals what the machine
    # itself gave between the two runs' own windows
    machine_ratio = r_hi["machine_thr"] / r_lo["machine_thr"]
    eff_windowed = (r_lo["value"] / r_hi["value"]) / machine_ratio \
        if machine_ratio > 0 else float("nan")
    ceiling = _machine_ceiling(lo, hi)
    return {
        "metric": f"flagship scaling {lo}→{hi} CPUs "
                  "(fresh ray.init processes pinned with taskset, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"images_per_sec_{lo}": r_lo["images_per_sec"],
        f"images_per_sec_{hi}": r_hi["images_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "machine_pure_cpu_ceiling": round(ceiling, 3),
        "efficiency_vs_machine_ceiling": round(eff / ceiling, 3),
        "machine_window_ratio": round(machine_ratio / (hi / lo), 3),
        "efficiency_windowed": round(eff_windowed, 3),
        "bench_rows": BENCH_N,
    }


if __name__ == "__main__":
    result = main_scaling() if "--scaling" in sys.argv else main_single()
    print(json.dumps(result))
