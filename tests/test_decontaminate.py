import pyarrow as pa
import pytest

from open_thoughts_ray.ops.decontaminate import (
    Decontaminator,
    build_benchmark_index,
    decontaminate,
)

BENCH = [
    "What is the capital of France and why does it matter",
    "Compute the integral of x squared from zero to one",
]


def _docs():
    return pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array([
            "what is the capital of FRANCE and why does it matter",  # exact (normalized)
            "please compute the integral of x squared from zero to one thanks",  # high overlap
            "a completely unrelated sentence about gardening",
            "the capital of France appears here but only briefly",
            "",
        ], pa.string()),
    })


def test_scores_direct():
    d = Decontaminator(index=build_benchmark_index(BENCH, ngram_n=8), mode="annotate")
    out = d(_docs())
    scores = out.column("contamination_score").to_pylist()
    assert scores[0] == 1.0           # exact normalized match
    assert scores[1] >= 0.5           # near-complete n-gram containment
    assert scores[2] == 0.0
    assert scores[4] == 0.0


def test_drop_mode_through_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs())
    out = decontaminate(ds, BENCH, overlap_threshold=0.5).to_pandas()
    assert sorted(out.doc_id) == [2, 3, 4]


def test_annotate_mode_through_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs())
    out = decontaminate(ds, BENCH, mode="annotate").to_pandas().sort_values("doc_id")
    assert list(out.contaminated) == [True, True, False, False, False]
