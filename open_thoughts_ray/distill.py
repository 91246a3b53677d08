"""Teacher→classifier quality distillation — the FineWeb-Edu /
DCLM-baseline recipe (Penedo et al. 2024; Li et al. 2024):

1. score a small seeded SAMPLE of the corpus with an LLM teacher
   (``completions`` ScorerMap — any registered backend);
2. threshold the teacher scores into pos/neg labels;
3. fit the fastText-style hashed-n-gram classifier on the labels with
   the exact distributed trainer (one grouped-Sum shuffle, bytes
   bit-identical to the serial fit);
4. score the FULL corpus with the distilled classifier (plain tasks +
   per-worker model cache — pennies per row vs the teacher) and filter.

Only step 1 touches the teacher: at 100 TB the sample is fixed-size
(teacher budget), every full-corpus pass is classifier-only.  The
reference runs the same loop manually across strategies
(train_fasttext_operator.py + fasttext_operator.py + completions);
this wires them into one auditable pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .models.fasttext_like import HashedNgramClassifier
from .ops.embed import train_text_classifier_distributed


def _seeded_sample(ds, id_col: str, frac: float, seed: str):
    """Deterministic hash sample (pure function of the id — replayable)."""
    import zlib

    lim = int(frac * 0xFFFFFFFF)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        m = [zlib.crc32(f"{v}#{seed}".encode()) <= lim for v in ids]
        return t.filter(pa.array(m, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def distill_quality_classifier(ds, *, text_col: str = "text",
                               id_col: str = "doc_id",
                               sample_frac: float = 0.05,
                               seed: str = "distill",
                               prompt_template: str | None = None,
                               score_threshold: float = 50.0,
                               backend: str = "mock",
                               backend_kwargs: dict | None = None,
                               cache_dir: str | None = None) -> bytes:
    """Steps 1-3: teacher-score a seeded sample, threshold to labels,
    fit the distributed classifier.  Returns model bytes ready for
    ``ray.put`` / ``score_with_classifier``."""
    from .llm.completions import completions

    sample = _seeded_sample(ds.select_columns([id_col, text_col]),
                            id_col, sample_frac, seed)
    tmpl = prompt_template or (
        "Rate the educational quality of this document from 1 to 100.\n"
        "{{" + text_col + "}}")
    scored = completions(
        sample, "scorer",
        {"user_message": tmpl, "output_column": "teacher_score"},
        backend=backend, backend_kwargs=backend_kwargs,
        cache_dir=cache_dir)

    thr = float(score_threshold)

    def to_label(t: pa.Table) -> pa.Table:
        s = t.column("teacher_score").to_numpy(zero_copy_only=False)
        lab = np.where(s >= thr, "pos", "neg")
        return pa.table({
            text_col: t.column(text_col),
            "label": pa.array(lab.tolist(), pa.string()),
        })

    labeled = scored.map_batches(to_label, batch_format="pyarrow")
    return train_text_classifier_distributed(labeled, text_column=text_col,
                                             label_column="label")


_SCORERS: dict = {}


def score_with_classifier(ds, model_bytes: bytes, text_col: str = "text",
                          out_col: str = "quality_score"):
    """Step 4a: append P(pos) per row — plain tasks, model broadcast
    once via ``ray.put`` and rebuilt once per worker process."""
    import ray

    from .ops.bcast import cached_build

    ref = ray.put(model_bytes)

    def fn(batch: pa.Table) -> pa.Table:
        model = cached_build(ref, HashedNgramClassifier.from_bytes,
                             tag="distill")
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        labels, confs = model.predict_batch(texts)
        p = np.asarray(confs, dtype=np.float64)
        p = np.where(np.asarray(labels, dtype=object) == "pos", p, 1.0 - p)
        return batch.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def distilled_quality_filter(ds, *, keep_threshold: float = 0.5,
                             text_col: str = "text", **distill_kw):
    """The full loop: distill on a sample, then classifier-score and
    filter the whole corpus.  Returns (filtered_ds, model_bytes)."""
    import pyarrow.compute as pc

    model = distill_quality_classifier(ds, text_col=text_col, **distill_kw)
    scored = score_with_classifier(ds, model, text_col=text_col)
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("quality_score"),
                                            pa.scalar(float(keep_threshold)))),
        batch_format="pyarrow")
    return kept, model
