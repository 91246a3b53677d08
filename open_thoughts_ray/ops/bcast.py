"""Per-worker-process broadcast cache — actor-pool once-per-actor setup
semantics WITHOUT the actor pool.

Why: `map_batches(Cls, concurrency=(1, max))` autoscaling pools never
grow past `min` under load in this Ray version (one actor = one core no
matter the cluster) and pay ~1-2.5 s actor-spawn latency per query.  A
plain TASK pool fills every core with zero sizing knobs — the only
thing the actor bought was fetching the broadcast object once.  Ray
reuses worker processes across tasks, so a module-level cache keyed by
the ObjectRef gives the same fetch-once behavior: `ray.put` the object
on the driver, pass the REF through `fn_kwargs` (refs pickle fine), and
call `cached_get`/`cached_build` inside the task.

This is the pipeline.py `_MODEL_CACHE` pattern (score stage, r3)
promoted to a shared helper.  The cache is bounded by construction:
one entry per distinct broadcast object per worker process, and worker
processes die with the job.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_get(ref):
    """Fetch a `ray.put` object once per worker process (plasma get +
    deserialize on first use, dict hit afterwards)."""
    key = ref.hex()
    v = _CACHE.get(key)
    if v is None:
        import ray

        v = ray.get(ref)
        _CACHE[key] = v
    return v


def fixed_pool(want: int = 8, num_cpus: float = 1.0) -> int:
    """Fixed actor-pool size for stages whose per-actor state is
    genuinely EXPENSIVE (real model weights): autoscaling ``(1, max)``
    pools never grow past 1 actor in this Ray version, so pools must be
    fixed — but a fixed pool reserving every CPU token deadlocks the
    streaming executor, so cap at 3/4 of the live cluster.

    NOTE: the default layout for every built-in stage is now plain
    tasks + ``cached_get``/``cached_build`` (two CHAINED fixed pools
    can still over-reserve a small cluster and deadlock —
    tests/test_align.py found this with gate→align).  Use this sizer
    only for a stage a caller explicitly pins to an actor pool (real
    GPU weights), and never chain two sized this way."""
    import ray

    live = int(ray.cluster_resources().get("CPU", want)) \
        if ray.is_initialized() else want
    budget = max(1, int(live * 3 / 4 / max(num_cpus, 0.25)))
    return max(1, min(want, budget))


def cached_build(ref, build, tag: str = ""):
    """`build(ray.get(ref))` once per worker process — for call sites
    whose per-actor `__init__` DERIVED state from the broadcast bytes
    (compiled index, deserialized model).  `tag` disambiguates two
    different builders over the same ref."""
    key = (ref.hex(), tag)
    v = _CACHE.get(key)
    if v is None:
        import ray

        v = build(ray.get(ref))
        _CACHE[key] = v
    return v


def cached_build_local(key: str, build):
    """``build(key)`` once per worker process for NON-broadcast state —
    e.g. a model loaded from a node-cached file path, where the path
    string itself is the cache key (no object-store fetch involved)."""
    v = _CACHE.get(key)
    if v is None:
        v = build(key)
        _CACHE[key] = v
    return v
