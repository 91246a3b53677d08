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
                 text_column: str = "caption"):
        from ..models.fasttext_like import HashedNgramClassifier

        if model_bytes is None:
            import ray

            model_bytes = ray.get(model_ref)
        self.model = HashedNgramClassifier.from_bytes(model_bytes)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        labels, confs = self.model.predict_batch(texts)
        batch = batch.append_column("lang", pa.array(labels, pa.string()))
        return batch.append_column(
            "lang_conf", pa.array(np.asarray(confs, dtype=np.float32), pa.float32())
        )
