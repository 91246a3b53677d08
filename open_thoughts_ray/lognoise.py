"""Suppress exactly two cosmetic Ray-internal log records (VERDICT r3 #7).

Both records are emitted by Ray Data internals on conditions our
pipelines cannot avoid, carry no signal, and scare operators reading
production logs:

1. ``streaming_executor_state.py`` WARNING "Operator produced a RefBundle
   with a different schema ... new schema: ." — the SORT-based shuffle
   behind ``groupby(...).map_groups`` / ``aggregate`` emits a
   schema-LESS (zero-field) bundle for every hash partition that
   received no rows.  Our map fns already return TYPED empties and the
   join-poisoning variant of this problem is guarded with trailing
   ``repartition`` (see dedup.label_propagation / pairverify); the
   leftover is pure log noise on small inputs.  Only the empty-new-schema
   variant is filtered — a REAL schema mismatch (non-empty new schema)
   still logs.

   (We measured the structural alternative — Ray 2.49's HASH_SHUFFLE
   ``repartition(keys=...)``, whose aggregator drops empty partitions —
   and rejected it: each keyed shuffle spawns a fresh aggregator actor
   pool costing 1.3-1.9 s per operator at 4-32 CPUs vs 0.16-0.24 s for
   the sort path on the same input, a fixed cost that would also degrade
   the measured N→4N scaling efficiency.  See BASELINE.md round-4 notes.)

2. ``transform_pyarrow.py`` WARNING "Failed to hash the schemas (for
   deduplication): unhashable type: 'dict'" — ``read_parquet`` metadata
   inference calls ``set(schemas)`` and ``pyarrow.Schema.__hash__``
   raises on any schema carrying pandas metadata (every pandas-written
   parquet file); Ray catches it and warns, then unifies the schemas
   fine.  Upstream noise on every ``count()`` of a pandas-written file.

Installed from ``open_thoughts_ray/__init__`` so every entry point
(bench, driver, YAML CLI, tests) is covered.  Remove a filter with
``uninstall()``.
"""

from __future__ import annotations

import logging

_EMPTY_SCHEMA_MARKER = "new schema: . This may lead"
_REFBUNDLE_PREFIX = "Operator produced a RefBundle with a different schema"
_SCHEMA_HASH_PREFIX = "Failed to hash the schemas (for deduplication)"


class _RayDataNoiseFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        if record.levelno != logging.WARNING:
            return True
        msg = record.getMessage()
        if msg.startswith(_SCHEMA_HASH_PREFIX):
            return False
        if _REFBUNDLE_PREFIX in msg and _EMPTY_SCHEMA_MARKER in msg:
            return False
        return True


_FILTER = _RayDataNoiseFilter()
_TARGET_LOGGERS = (
    "ray.data._internal.execution.streaming_executor_state",
    "ray.data._internal.arrow_ops.transform_pyarrow",
)


def install() -> None:
    for name in _TARGET_LOGGERS:
        lg = logging.getLogger(name)
        if _FILTER not in lg.filters:
            lg.addFilter(_FILTER)


def uninstall() -> None:
    for name in _TARGET_LOGGERS:
        logging.getLogger(name).removeFilter(_FILTER)
