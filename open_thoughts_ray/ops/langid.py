"""Language-ID actor-pool stage.

Ray-Data-idiomatic replacement for the reference's fastText operator
(open_thoughts_3/engine/operators/fasttext_operator.py:57-267): a callable
class handed to ``map_batches(LangIdScorer, concurrency=N, batch_size=B)``.
The model is deserialized ONCE per actor in ``__init__`` from a broadcast
``ray.put`` ref (no fcntl-locked node cache needed), and each ``__call__``
scores a whole Arrow batch vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class LangIdScorer:
    def __init__(self, model_ref=None, model_bytes: bytes | None = None,
                 text_column: str = "caption", bin_source: str | None = None):
        """``bin_source`` loads a real fastText ``.bin`` (e.g. lid.176.bin)
        through the fcntl node cache — the reference's real-model path
        (fasttext_operator.py:193-281); otherwise the builtin deterministic
        stand-in deserializes from the broadcast ``model_ref`` bytes."""
        if bin_source is not None:
            from ..models.fasttext_bin import load_bin_cached

            self._ft = load_bin_cached(bin_source)
            self.model = None
        else:
            from ..models.fasttext_like import HashedNgramClassifier

            if model_bytes is None:
                import ray

                model_bytes = ray.get(model_ref)
            self.model = HashedNgramClassifier.from_bytes(model_bytes)
            self._ft = None
        self.text_column = text_column

    def _predict(self, texts: list[str]) -> tuple[list[str], np.ndarray]:
        if self.model is not None:
            return self.model.predict_batch(texts)
        labs, probs = self._ft.predict_batch(texts, k=1)
        labels = [
            (top[0][len("__label__"):] if top[0].startswith("__label__") else top[0])
            if top else "und"
            for top in labs
        ]
        confs = np.asarray(
            [p[0] if len(p) else 0.0 for p in probs], dtype=np.float32)
        return labels, confs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        labels, confs = self._predict(texts)
        batch = batch.append_column("lang", pa.array(labels, pa.string()))
        return batch.append_column(
            "lang_conf", pa.array(np.asarray(confs, dtype=np.float32), pa.float32())
        )
