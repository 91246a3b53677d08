"""Generalized golden-fixture generator for the rows-only gate queries.

Extends the flagship pattern (scripts/gen_golden_flagship.py, VERDICT r4
#4) to every ``queries()`` entry that lacks an ``oracle_sql()`` twin:
each candidate runs in TWO fresh subprocesses — ``ray.init(num_cpus=8)``
and ``ray.init(num_cpus=32)`` — on the driver's sf0.01 input, and only
if the canonicalized outputs are **bit-exact identical across
parallelism** is the result frozen as
``open_thoughts_ray/fixtures/golden_gate/<name>.parquet`` for
``oracle_sql()`` to replay via DuckDB ``read_parquet``.  Queries whose
output moves with parallelism (e.g. merge-order-dependent sketches)
stay rows-only — freezing them would hand the driver a flaky gate.

The fixtures are regression oracles, not independent re-derivations:
they certify "same rows, same values as the audited run committed at
<sha>", pinned to the driver's sf0.01 tables.  Independent semantic
evidence lives in pytest (serial parity, recall bounds, rule
reproduction — see each query's docstring).

Usage:
  python scripts/gen_golden.py                  # generate all candidates
  python scripts/gen_golden.py name [name ...]  # subset
  python scripts/gen_golden.py --check          # recompute + diff (exit 1 on drift)
  python scripts/gen_golden.py --run-one NAME NCPUS OUT   # internal
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "open_thoughts_ray", "fixtures",
                          "golden_gate")
SF_DIR = os.environ.get("OTR_GOLDEN_SF", "/root/testdata/sf0.01")

# Every rows-only gate query is a candidate; the 8-vs-32 stability gate
# decides which actually freeze.
CANDIDATES = [
    "fuzzy_dedup_documents",
    "ann_topk_ivf_embeddings",
    "approx_top_tokens_documents",
    "semantic_dedup_embeddings",
    "image_caption_alignment",
    "kcenter_select_embeddings",
    "distill_quality_documents",
    "image_search_corpus",
    "tree_search_documents",
    "arpa_ppl_documents",
    "video_scene_cuts_documents",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, row-sorted, index-reset — the driver's compare
    shape (scripts/check_queries.py:canon)."""
    df = df[sorted(df.columns)].copy()
    sort_keys = [c for c in df.columns
                 if not df[c].map(lambda v: isinstance(v, (list, np.ndarray)),
                                  na_action="ignore").any()]
    return df.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)


def run_one(name: str, ncpus: int, out: str) -> None:
    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    import importlib

    import pyarrow as pa

    m = importlib.import_module("__ray_entry__")
    res = m.queries()[name](SF_DIR)
    if isinstance(res, pd.DataFrame):
        df = res
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res.to_pandas()
    canon(df).to_parquet(out, index=False)
    ray.shutdown()


def bit_equal(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"schema {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            ok = ((av == bv) | (np.isnan(av.astype(float))
                                & np.isnan(bv.astype(float)))).all()
        else:
            ok = (av == bv).all()
        if not ok:
            n = int((av != bv).sum())
            return f"col {c}: {n} value diffs"
    return ""


def gen(names: list[str], check: bool) -> int:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rc = 0
    for name in names:
        outs = {}
        for ncpus in (8, 32):
            out = f"/tmp/otr_golden_{name}_{ncpus}.parquet"
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--run-one", name, str(ncpus), out]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=REPO, timeout=1200)
            if r.returncode != 0:
                print(f"{name:34s} FAIL at {ncpus} cpus:\n{r.stderr[-2000:]}")
                rc = 1
                outs = None
                break
            outs[ncpus] = pd.read_parquet(out)
        if not outs:
            continue
        diff = bit_equal(outs[8], outs[32])
        if diff:
            print(f"{name:34s} UNSTABLE across parallelism ({diff}) — "
                  "stays rows-only")
            continue
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        if check:
            if not os.path.exists(path):
                print(f"{name:34s} stable but no committed golden")
                rc = 1
                continue
            old = pd.read_parquet(path)
            diff = bit_equal(old, outs[32])
            print(f"{name:34s} {'OK' if not diff else 'DRIFT: ' + diff}"
                  f"  ({len(outs[32])} rows)")
            rc = rc or (1 if diff else 0)
        else:
            outs[32].to_parquet(path, index=False)
            print(f"{name:34s} STABLE -> {os.path.relpath(path, REPO)}"
                  f"  ({len(outs[32])} rows)")
    return rc


def main() -> int:
    argv = sys.argv[1:]
    if argv[:1] == ["--run-one"]:
        run_one(argv[1], int(argv[2]), argv[3])
        return 0
    check = "--check" in argv
    names = [a for a in argv if not a.startswith("--")] or CANDIDATES
    return gen(names, check)


if __name__ == "__main__":
    raise SystemExit(main())
