"""Local replica of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry at a given sf and compare against
``oracle_sql()`` via DuckDB (row count + schema + order-insensitive
values).  Usage: python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import logging
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, orc: pd.DataFrame) -> str:
    if len(mine) != len(orc):
        return f"ROWS {len(mine)} vs {len(orc)}"
    if sorted(mine.columns) != sorted(orc.columns):
        return f"SCHEMA {sorted(mine.columns)} vs {sorted(orc.columns)}"
    a, b = canon(mine), canon(orc)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0,
                               equal_nan=True):
                bad = (av.astype(float) != bv.astype(float)).sum()
                return f"VALUES col {c}: {bad} mismatches"
        elif not (av == bv).all():
            bad = (av != bv).sum()
            return f"VALUES col {c}: {bad} mismatches"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ncpu = int(os.environ.get("OTR_CHECK_CPUS", "8"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:34s} FAIL ray: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            try:
                orc = con.execute(sqls[name]).df()
            except Exception as ex:  # noqa: BLE001
                print(f"{name:34s} FAIL sql: {ex}")
                failures += 1
                continue
            verdict = compare(name, mine, orc)
        else:
            verdict = f"rows-only ({len(mine)} rows)"
        status = verdict if verdict.startswith(("OK", "rows-only")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            failures += 1
        print(f"{name:34s} {status}   [{dt:.1f}s]")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
