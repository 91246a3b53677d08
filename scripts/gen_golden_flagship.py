"""Generate the checked-in golden decisions table for the flagship
quality-filter pipeline (VERDICT r4 #4: give the driver gate a
hash-checkable oracle instead of a permanent ``no_oracle`` slot).

The flagship's 2000-row entry table is fully deterministic
(fixtures/images.build_images_table, seed=42) and every output column
is row-local or produced by the bit-reproducible dedup machinery, so
the decisions are identical at any parallelism.  This script runs the
pipeline once and freezes the result as a single parquet file that
``__ray_entry__.oracle_sql()['flagship_quality_filter']`` replays via
DuckDB ``read_parquet`` — making the driver compare a true
row/schema/value-hash regression gate on the flagship.

Usage: python scripts/gen_golden_flagship.py [--check]
  --check: recompute and compare against the committed fixture
           instead of overwriting it (exit 1 on drift).
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "open_thoughts_ray", "fixtures",
                      "golden_flagship.parquet")


def compute() -> pd.DataFrame:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, REPO)
    import importlib

    m = importlib.import_module("__ray_entry__")
    df = m.entry().to_pandas()
    return df.sort_values("image_id", kind="mergesort").reset_index(drop=True)


def main() -> int:
    df = compute()
    if "--check" in sys.argv:
        old = pd.read_parquet(GOLDEN)
        same = old.equals(df)
        print("golden match:", same)
        return 0 if same else 1
    df.to_parquet(GOLDEN, index=False)
    print(f"wrote {len(df)} rows -> {GOLDEN}")
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
