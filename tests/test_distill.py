"""Teacher→classifier quality distillation (distill.py): a rubric
teacher with a planted keyword signal must distill into a classifier
that reproduces the rule on UNSEEN documents."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.distill import (
    distill_quality_classifier,
    distilled_quality_filter,
    score_with_classifier,
)

_GOOD = ["photosynthesis converts light into chemical energy",
         "the photosynthesis cycle fixes carbon in the stroma",
         "chlorophyll drives photosynthesis in green plants",
         "dark reactions of photosynthesis use ATP and NADPH"]
_BAD = ["click here to win a free prize now",
        "cheap deals best prices buy today limited offer",
        "lorem ipsum dolor sit amet consectetur",
        "follow like subscribe share comment below"]


def _corpus(n=400, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        base = _GOOD[i % 4] if good else _BAD[i % 4]
        extra = " ".join(f"tok{int(v)}" for v in rng.integers(0, 50, 4))
        rows.append((np.int64(i), f"{base} {extra}", good))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "is_good": pa.array([r[2] for r in rows], pa.bool_()),
    })


def test_distill_reproduces_teacher_rule(ray_session):
    tbl = _corpus()
    ds = rd.from_arrow(tbl).repartition(8)
    model = distill_quality_classifier(
        ds, sample_frac=0.3, backend="keyword_rubric", score_threshold=50.0)
    scored = score_with_classifier(ds, model).to_pandas()
    pred = scored.quality_score >= 0.5
    acc = (pred == scored.is_good).mean()
    assert acc >= 0.95  # distilled classifier reproduces the rubric


def test_distilled_filter_keeps_good(ray_session):
    tbl = _corpus(n=200, seed=7)
    ds = rd.from_arrow(tbl).repartition(4)
    kept, model = distilled_quality_filter(
        ds, keep_threshold=0.5, sample_frac=0.4,
        backend="keyword_rubric", score_threshold=50.0)
    out = kept.to_pandas()
    assert len(out) > 0
    assert out.is_good.mean() >= 0.95
    assert isinstance(model, bytes) and len(model) > 0


def test_distill_deterministic(ray_session):
    tbl = _corpus(n=120, seed=11)
    ds = rd.from_arrow(tbl).repartition(4)
    m1 = distill_quality_classifier(ds, sample_frac=0.5,
                                    backend="keyword_rubric")
    m2 = distill_quality_classifier(ds, sample_frac=0.5,
                                    backend="keyword_rubric")
    assert m1 == m2  # bit-identical bytes (distributed trainer canonical)


def test_yaml_distill_quality_filter(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    tbl = _corpus(n=200, seed=13)
    src = tmp_path / "docs.parquet"
    pq.write_table(tbl, src)
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(src)}},
        {"id": "filtered", "config": {
            "type": "distill_quality_filter", "backend": "keyword_rubric",
            "sample_frac": 0.4, "keep_threshold": 0.5}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) > 0
    assert out.is_good.mean() >= 0.95
