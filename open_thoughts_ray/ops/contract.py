"""Data-contract operators: schema validation and quarantine splits.

Production pipelines fail fast on malformed shards instead of
propagating silent nulls 14 stages downstream.  Two small tools:

* ``validate_schema`` — assert presence/type/nullability per column on
  EVERY batch (vectorized Arrow checks, no row loop); violations raise
  ``SchemaViolation`` with the offending column and batch counts, so the
  task (and run) fails at the first bad block rather than at the sink.
* ``split_quarantine`` — route rows failing a vectorized predicate into
  a quarantine Parquet directory (audit trail) and return only the
  passing rows; one pass, the quarantine write happens inside the same
  ``map_batches`` so nothing is scanned twice.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


class SchemaViolation(ValueError):
    pass


def validate_schema(ds, spec: dict[str, str],
                    forbid_nulls: list[str] | None = None,
                    allow_extra: bool = True):
    """spec: {column: arrow type name} (e.g. {"doc_id": "int64",
    "text": "string"}).  Checks run per batch on the workers; the
    Dataset passes through unchanged when valid."""
    forbid = set(forbid_nulls or [])

    def check(t: pa.Table) -> pa.Table:
        for col, typ in spec.items():
            if col not in t.column_names:
                raise SchemaViolation(f"missing column {col!r}")
            actual = str(t.schema.field(col).type)
            if actual != typ:
                raise SchemaViolation(
                    f"column {col!r}: expected {typ}, got {actual}")
        if not allow_extra:
            extra = set(t.column_names) - set(spec)
            if extra:
                raise SchemaViolation(f"unexpected columns {sorted(extra)}")
        for col in forbid:
            nulls = pc.sum(pc.is_null(t.column(col)).cast(pa.int64())).as_py()
            if nulls:
                raise SchemaViolation(
                    f"column {col!r}: {nulls} null(s) in a "
                    f"{t.num_rows}-row batch")
        return t

    return ds.map_batches(check, batch_format="pyarrow")


def split_quarantine(ds, predicate, quarantine_dir: str,
                     reason_col: str = "_quarantine_reason",
                     reason: str = "failed_contract"):
    """Return rows where ``predicate(batch) -> bool mask`` holds; rows
    failing it are appended (with a reason column) to one Parquet file
    per batch under ``quarantine_dir`` — resumable audit output, never
    a driver collect.  Single pass over the input."""
    import uuid

    def route(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(mask, pa.bool_())
        mask = pc.fill_null(mask, False)
        bad = t.filter(pc.invert(mask))
        if bad.num_rows:
            import pyarrow.parquet as pq

            # created inside the task, not on the driver: on a multi-node
            # cluster the worker's filesystem is a different machine —
            # point quarantine_dir at shared storage for a complete trail
            os.makedirs(quarantine_dir, exist_ok=True)
            bad = bad.append_column(
                reason_col, pa.array([reason] * bad.num_rows, pa.string()))
            # uuid file names: concurrent tasks never collide, reruns
            # append (the audit trail is additive by design)
            pq.write_table(
                bad, os.path.join(quarantine_dir,
                                  f"quarantine-{uuid.uuid4().hex}.parquet"))
        return t.filter(mask)

    return ds.map_batches(route, batch_format="pyarrow")
