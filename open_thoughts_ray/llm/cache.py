"""Content-addressed completions response cache.

The reference persists every LLM response keyed by request and syncs the
store across runs (engine/data_syncer.py:12-231,
completions_operator.py:68-217) — at real API prices a resumed 1M-row
annotate MUST NOT re-pay for completed calls.  Re-expressed here as a
filesystem cache consulted inside the actor-pool workers:

* key = md5(canonical prompt ‖ response_format ‖ backend identity) —
  the full request identity; a changed template, map or backend misses.
* one JSON file per response, sharded by key prefix (256 dirs), written
  atomically (tmp + rename) so concurrent actors on shared storage never
  observe torn writes; last-writer-wins is safe because writes for one
  key are byte-identical (responses are deterministic given the request
  for mock backends, and for real backends the first response is simply
  kept).
* reads are lock-free; a miss after a concurrent write is only a wasted
  recompute, never corruption.

On a cluster, point ``cache_dir`` at a shared filesystem (the reference
syncs via GCS for the same reason).
"""

from __future__ import annotations

import hashlib
import json
import os

_MISS = object()


class ResponseCache:
    def __init__(self, cache_dir: str, backend_identity: str):
        self.dir = cache_dir
        self.backend_identity = backend_identity
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def key(self, canonical_prompt: str, response_format: str | None) -> str:
        payload = "\x00".join([canonical_prompt, str(response_format),
                               self.backend_identity])
        return hashlib.md5(payload.encode("utf-8")).hexdigest()

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key[:2], key + ".json")

    def get(self, key: str):
        try:
            with open(self._path(key)) as f:
                self.hits += 1
                return json.load(f)["response"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            self.misses += 1
            return _MISS

    def put(self, key: str, response) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"response": response}, f)
        os.replace(tmp, path)


def backend_identity(backend: str, backend_kwargs: dict | None) -> str:
    return backend + "|" + json.dumps(backend_kwargs or {}, sort_keys=True)
