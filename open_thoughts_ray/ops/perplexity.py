"""Perplexity-scoring actor-pool stage (KenLM-style quality signal).

Same actor-pool shape as the langid stage: LM loaded once per actor from
a broadcast ref, batches scored in ``__call__``.  Cost is ∝ tokens, not
rows — the caption-length skew called out in the north rule — so the
pipeline uses a smaller ``batch_size`` here and lets Ray's streaming
executor balance batches across the pool (a length-aware repartition
helper lives in ops.relational.repartition_by_length for extreme skew).
"""

from __future__ import annotations

import pyarrow as pa


class PerplexityScorer:
    def __init__(self, model_ref=None, model_bytes: bytes | None = None,
                 text_column: str = "caption"):
        from ..models.ngram_lm import BigramLM

        if model_bytes is None:
            import ray

            model_bytes = ray.get(model_ref)
        self.lm = BigramLM.from_bytes(model_bytes)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ppl = self.lm.perplexity_batch(texts)
        return batch.append_column("ppl", pa.array(ppl, pa.float32()))
