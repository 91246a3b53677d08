"""Decontamination: remove rows matching an evaluation/benchmark set.

The reference's anti-join family (SURVEY.md §2.4):

* exact — open_thoughts/decontaminate.py:12-59: drop rows whose text
  equals a benchmark row (after normalization);
* fuzzy + n-gram — dcft/data_strategies/_A1_Source/utils.py:91-195
  (`decontaminate_fuzzy_w_ngram`): drop when token-n-gram overlap with
  any benchmark row exceeds a threshold;
* annotate-only variant (`fuzzy_match_table`, DeepSeekR1/utils.py:265-366)
  — mark matches instead of dropping.

Ray-Data-first shape: the benchmark side is SMALL (eval sets), so it is
broadcast once via ``ray.put`` (normalized-text set + inverted n-gram
index) and each batch filters locally — a broadcast anti-join, no
shuffle.  The n-gram inverted index makes the per-row check
O(row_ngrams) instead of O(|benchmark|).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(text: str) -> str:
    return " ".join(text.lower().split())


def _ngrams(tokens: list[str], n: int) -> set[tuple[str, ...]]:
    if len(tokens) < n:
        return {tuple(tokens)} if tokens else set()
    return {tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def build_benchmark_index(benchmark_texts: list[str], ngram_n: int = 8) -> dict:
    """Driver-side: normalized exact set + inverted n-gram → row ids."""
    exact = set()
    inv: dict[tuple, list[int]] = {}
    sizes = []
    for i, t in enumerate(benchmark_texts):
        norm = _normalize(t)
        exact.add(norm)
        grams = _ngrams(norm.split(), ngram_n)
        sizes.append(max(1, len(grams)))
        for g in grams:
            inv.setdefault(g, []).append(i)
    return {"exact": exact, "inv": inv, "sizes": sizes, "n": ngram_n}


class Decontaminator:
    """Actor-pool batch filter/annotator against a broadcast index.

    mode="drop"    → anti-join (rows matching the benchmark removed)
    mode="annotate"→ adds contaminated:bool + contamination_score:float
    A row matches when its text is an exact (normalized) benchmark match
    OR when, for some benchmark row, the fraction of that row's n-grams
    also present in the text ≥ ``overlap_threshold``.
    """

    def __init__(self, index_ref=None, index: dict | None = None,
                 text_column: str = "text", overlap_threshold: float = 0.5,
                 mode: str = "drop"):
        if index is None:
            import ray

            index = ray.get(index_ref)
        self.index = index
        self.text_column = text_column
        self.overlap_threshold = overlap_threshold
        self.mode = mode

    def _score(self, text: str) -> float:
        norm = _normalize(text)
        if norm in self.index["exact"]:
            return 1.0
        grams = _ngrams(norm.split(), self.index["n"])
        hits: dict[int, int] = {}
        inv = self.index["inv"]
        for g in grams:
            for i in inv.get(g, ()):  # inverted index: O(row grams)
                hits[i] = hits.get(i, 0) + 1
        if not hits:
            return 0.0
        sizes = self.index["sizes"]
        return max(c / sizes[i] for i, c in hits.items())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        scores = np.asarray([self._score(t or "") for t in texts], dtype=np.float64)
        contaminated = scores >= self.overlap_threshold
        if self.mode == "drop":
            return batch.filter(pa.array(~contaminated))
        batch = batch.append_column(
            "contaminated", pa.array(contaminated, pa.bool_())
        )
        return batch.append_column(
            "contamination_score", pa.array(scores, pa.float64())
        )


def decontaminate(ds, benchmark_texts: list[str], text_column: str = "text",
                  ngram_n: int = 8, overlap_threshold: float = 0.5,
                  mode: str = "drop"):
    """ds minus rows that match the benchmark set (broadcast anti-join).

    Plain tasks + per-worker broadcast cache (ops/bcast.py): the index
    is fetched and kept once per worker process — actor-pool setup
    semantics with full task-pool parallelism."""
    import ray

    index_ref = ray.put(build_benchmark_index(benchmark_texts, ngram_n))

    def task(batch: pa.Table, *, index_ref) -> pa.Table:
        from .bcast import cached_build

        d = cached_build(
            index_ref,
            lambda idx: Decontaminator(
                index=idx, text_column=text_column,
                overlap_threshold=overlap_threshold, mode=mode),
            tag=f"decon:{text_column}:{overlap_threshold}:{mode}")
        return d(batch)

    return ds.map_batches(task, batch_format="pyarrow", num_cpus=1,
                          fn_kwargs={"index_ref": index_ref})
