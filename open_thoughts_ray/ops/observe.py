"""Pipeline observability: named per-stage row counters.

``ds.stats()`` gives Ray's operator timings, but curation pipelines
also need SEMANTIC counters — rows entering/surviving each named stage,
drop totals per rule — surfaced while the run streams, not after.  A
single small named actor accumulates (stage, counter) -> int deltas
posted from ``map_batches`` tasks; the driver polls ``snapshot()``
whenever it likes.  One actor is plenty: updates are tiny dict deltas
per BATCH (not per row), amortized to ~one RPC per 10⁴-10⁶ rows.

The per-batch update is one synchronous sub-millisecond actor RPC per
batch (amortized over 10⁴+ rows), which makes ``snapshot()`` reads
deterministic once the pipeline has materialized — no in-flight deltas.
"""

from __future__ import annotations

import pyarrow as pa


def _get_counter_actor(name: str = "otr_stage_counters"):
    import ray

    @ray.remote(num_cpus=0)
    class _Counters:
        def __init__(self):
            self.counts: dict = {}

        def add(self, stage: str, counter: str, delta: int) -> None:
            key = (stage, counter)
            self.counts[key] = self.counts.get(key, 0) + int(delta)

        def snapshot(self) -> dict:
            return {f"{s}/{c}": v for (s, c), v in sorted(self.counts.items())}

        def reset(self) -> None:
            self.counts = {}

    # job-scoped (NOT detached): the actor dies with the driver job, so
    # pipelines sharing a long-lived cluster never read another run's
    # stale deltas and the process cannot leak (ADVICE r3).  Within one
    # job, call counters_reset() between pipelines sharing a name.
    return _Counters.options(name=name, get_if_exists=True).remote()


def counted(ds, stage: str, masks: dict | None = None,
            actor_name: str = "otr_stage_counters"):
    """Pass-through stage that counts rows (counter ``rows``) and any
    vectorized boolean ``masks`` ({counter_name: fn(batch) -> mask})
    into the shared counter actor.  Zero-copy: batches are returned
    untouched."""
    actor = _get_counter_actor(actor_name)
    mask_fns = dict(masks or {})

    def observe(t: pa.Table) -> pa.Table:
        import ray
        import pyarrow.compute as pc

        pending = [actor.add.remote(stage, "rows", t.num_rows)]
        for cname, fn in mask_fns.items():
            m = fn(t)
            if not isinstance(m, (pa.Array, pa.ChunkedArray)):
                m = pa.array(m, pa.bool_())
            n = pc.sum(pc.fill_null(m, False).cast(pa.int64())).as_py() or 0
            pending.append(actor.add.remote(stage, cname, int(n)))
        ray.get(pending)  # deterministic snapshot() after materialize
        return t

    return ds.map_batches(observe, batch_format="pyarrow")


def counters_snapshot(actor_name: str = "otr_stage_counters") -> dict:
    import ray

    return ray.get(_get_counter_actor(actor_name).snapshot.remote())


def counters_reset(actor_name: str = "otr_stage_counters") -> None:
    import ray

    ray.get(_get_counter_actor(actor_name).reset.remote())
