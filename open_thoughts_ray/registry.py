"""Run-metadata registry — the queryable analogue of the reference's
Postgres catalog rows per operator hash
(dcft/data_strategies/synthetic_data_manager.py:818-980), kept
engine-local: one JSONL record per run (append-only, fsync'd), one row
per operator with its content fingerprint, cache status, output rows and
wall seconds.  Query with ``python -m open_thoughts_ray runs`` or any
DuckDB/pandas read of ``runs.jsonl``."""

from __future__ import annotations

import json
import os
import time
import uuid

DEFAULT_DIR = os.environ.get("OTR_REGISTRY_DIR", "/tmp/otr_runs")


class RunRegistry:
    def __init__(self, root: str | None = None):
        self.root = root or DEFAULT_DIR
        os.makedirs(self.root, exist_ok=True)
        self.path = os.path.join(self.root, "runs.jsonl")

    def record(self, kind: str, stages: list[dict], meta: dict | None = None,
               started_at: float | None = None) -> str:
        run_id = uuid.uuid4().hex[:12]
        rec = {
            "run_id": run_id,
            "kind": kind,
            "started_at": started_at,
            "recorded_at": time.time(),
            "stages": stages,
            "meta": meta or {},
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return run_id

    def runs(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def stage_table(self):
        """Flattened (run_id, kind, op_id, fingerprint, status, rows,
        wall_s) pandas frame — the catalog view."""
        import pandas as pd

        rows = []
        for r in self.runs():
            for s in r["stages"]:
                rows.append({"run_id": r["run_id"], "kind": r["kind"],
                             "recorded_at": r["recorded_at"], **s})
        return pd.DataFrame(rows)
