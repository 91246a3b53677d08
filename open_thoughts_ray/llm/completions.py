"""The completions operator: LLM annotation as an actor-pool map_batches
stage (reference: engine/operators/completions_operator.py:220-300, its
curator actor + CompletionsMap plumbing re-expressed Ray-Data-first).

Shape:
* the map (prompt/parse plugin) and backend are built ONCE per actor in
  ``__init__`` from plain config dicts — no re-shipping per batch,
* each ``__call__`` builds prompts for the whole Arrow batch, draws the
  request budget from the SHARED rate-limiter actor in one acquire, and
  completes row-by-row with bounded retries,
* ``parse`` may return several rows (ListMap) → the output table fans
  out, or raise → the row is dropped / kept with an error column per
  ``on_parse_error``.

Parallelism: rows are independent; ``concurrency`` actors × batch_size
rows in flight, limited globally by the rate limiter — identical
resource shape to the perplexity scorer pool, so it schedules the same
way at cluster scale.
"""

from __future__ import annotations

import time

import pyarrow as pa

from .backend import build_backend
from .maps import build_map


class CompletionsActor:
    def __init__(self, map_kind: str, map_config: dict,
                 backend: str = "mock", backend_kwargs: dict | None = None,
                 limiter=None, max_retries: int = 3,
                 on_parse_error: str = "raise", retry_base_sleep: float = 0.05,
                 cache_dir: str | None = None):
        self.cmap = build_map(map_kind, map_config)
        self.backend = build_backend(backend, **(backend_kwargs or {}))
        self.limiter = limiter
        self.max_retries = int(max_retries)
        self.on_parse_error = on_parse_error
        self.retry_base_sleep = retry_base_sleep
        self.cache = None
        if cache_dir:
            from .cache import ResponseCache, backend_identity

            self.cache = ResponseCache(
                cache_dir, backend_identity(backend, backend_kwargs))

    def _complete_one(self, messages):
        last_err = None
        for attempt in range(self.max_retries + 1):
            try:
                return self.backend.complete(messages, self.cmap.response_format)
            except Exception as e:  # transient backend error → retry
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(self.retry_base_sleep * (2 ** attempt))
        raise RuntimeError(
            f"completions request failed after {self.max_retries} retries"
        ) from last_err

    def _responses(self, prompts: list):
        """One response per prompt, consulting the content-addressed
        cache first (reference data_syncer.py:12-231 semantics).  The
        rate limiter budget is drawn ONLY for actual backend calls —
        a fully-cached rerun spends zero requests."""
        from .backend import canonical_prompt

        n = len(prompts)
        responses: list = [None] * n
        miss_idx: list[int] = []
        keys: list = [None] * n
        if self.cache is not None:
            from .cache import _MISS

            for i, p in enumerate(prompts):
                keys[i] = self.cache.key(canonical_prompt(p),
                                         self.cmap.response_format)
                hit = self.cache.get(keys[i])
                if hit is _MISS:
                    miss_idx.append(i)
                else:
                    responses[i] = hit
        else:
            miss_idx = list(range(n))
        if miss_idx and self.limiter is not None:
            import ray

            n_tokens = sum(
                len(str(m)) // 4 for i in miss_idx
                for m in (prompts[i] if isinstance(prompts[i], list)
                          else [prompts[i]])
            )
            wait = ray.get(self.limiter.acquire.remote(len(miss_idx), n_tokens))
            if wait > 0:
                time.sleep(wait)
        for i in miss_idx:
            responses[i] = self._complete_one(prompts[i])
            if self.cache is not None:
                self.cache.put(keys[i], responses[i])
        return responses

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        prompts = [self.cmap.prompt(r) for r in rows]
        out_rows: list[dict] = []
        for row, response in zip(rows, self._responses(prompts)):
            try:
                parsed = self.cmap.parse(row, response)
            except Exception as e:
                if self.on_parse_error == "drop":
                    continue
                if self.on_parse_error == "keep":
                    out_rows.append({**row, "_parse_error": str(e)})
                    continue
                raise
            if isinstance(parsed, list):
                out_rows.extend(parsed)
            else:
                out_rows.append(parsed)
        if not out_rows:
            # empty fan-out: emit a zero-row table with the OUTPUT schema
            # (input columns + the map's declared output fields) so blocks
            # from fully-dropped batches match the other blocks' schema
            # (ADVICE r2: an input-schema empty block breaks downstream
            # select_columns/concat on the output column)
            empty = batch.slice(0, 0)
            type_map = {"string": pa.string(), "bool": pa.bool_(),
                        "float64": pa.float64(),
                        "list<string>": pa.list_(pa.string()),
                        "list<int64>": pa.list_(pa.int64())}
            for name, typ in self.cmap.output_fields().items():
                if name not in empty.column_names:
                    empty = empty.append_column(
                        name, pa.array([], type=type_map[typ]))
            return empty
        # unify keys across rows (pa.Table.from_pylist keeps only the
        # first row's keys; parse-error rows add columns mid-batch)
        keys: list[str] = []
        for r in out_rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        return pa.Table.from_pylist([{k: r.get(k) for k in keys}
                                     for r in out_rows])


def completions(ds, map_kind: str, map_config: dict, *,
                backend: str = "mock", backend_kwargs: dict | None = None,
                limiter=None, concurrency: int | tuple = 4,
                batch_size: int = 256, num_cpus: float = 0.5,
                max_retries: int = 3, on_parse_error: str = "raise",
                cache_dir: str | None = None):
    """Annotate ``ds`` through a CompletionsMap — the ``completions``
    YAML operator.  ``limiter`` is a shared RateLimiter actor handle
    (backend.shared_rate_limiter); pass None to run unthrottled.
    ``cache_dir`` enables the content-addressed response cache (a rerun
    over the same rows makes zero backend calls — llm/cache.py)."""
    return ds.map_batches(
        CompletionsActor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
        fn_constructor_kwargs=dict(
            map_kind=map_kind, map_config=map_config, backend=backend,
            backend_kwargs=backend_kwargs, limiter=limiter,
            max_retries=max_retries, on_parse_error=on_parse_error,
            cache_dir=cache_dir,
        ),
    )
