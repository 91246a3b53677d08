import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_thoughts_ray.io import codecs
from open_thoughts_ray.ops.scrub import scrub_text


def test_all_rows_dropped_pipeline(ray_session):
    """Flagship on a table where every row fails the rules → zero kept,
    dedup stage must handle the empty kept set."""
    import ray.data as rd

    from open_thoughts_ray.fixtures.images import generate_partition
    from open_thoughts_ray.pipeline import PipelineOptions, quality_filter_dataset

    imgs, _ = generate_partition(42, 0, 0, 50)
    # blank out the captions → every row fails 'empty'
    cols = {c: imgs.column(c) for c in imgs.schema.names}
    cols["caption"] = pa.array([""] * imgs.num_rows, pa.string())
    out = quality_filter_dataset(
        rd.from_arrow(pa.table(cols)), PipelineOptions.for_cluster(4)
    ).to_pandas()
    assert len(out) == 50
    assert not out.keep.any()
    assert (out.drop_reason == "empty").all()


def test_chained_layout_matches_combined(ray_session):
    """The four-operator reference layout (score_stage_chained) must
    produce identical decisions to the combined ScoreActor."""
    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.pipeline import (
        PipelineOptions,
        broadcast_models,
        score_stage,
        score_stage_chained,
    )

    opts = PipelineOptions.for_cluster(4)
    refs = broadcast_models()
    paths = lance_table.fragment_paths("/tmp/otr_pytest_images")[:4]
    a = (
        score_stage(lance_table.read_dataset("/tmp/otr_pytest_images", paths=paths),
                    refs, opts)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    b = (
        score_stage_chained(
            lance_table.read_dataset("/tmp/otr_pytest_images", paths=paths),
            refs, opts)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    assert (a.drop_reason.values == b.drop_reason.values).all()
    assert (a.scrubbed_caption.values == b.scrubbed_caption.values).all()
    assert np.array_equal(a.ppl.values, b.ppl.values)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["raw", "pngz", "qjpg", "png"]),
)
def test_codec_roundtrip_property(w, h, seed, fmt):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    out = codecs.decode(codecs.encode(px, fmt), w, h, fmt)
    if fmt == "qjpg":
        assert np.abs(out.astype(int) - px.astype(int)).max() <= codecs.QJPG_STEP // 2
    else:
        assert np.array_equal(out, px)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_scrub_never_crashes_and_is_deterministic(text):
    assert scrub_text(text) == scrub_text(text)


def test_phash_of_constant_image():
    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    h = codecs.average_phash(px)  # all cells equal the mean → all bits 0
    assert h == 0


def test_new_ops_on_empty_inputs(ray_session):
    """Round-2 ops must survive empty datasets (the resume/empty-shard
    path): completions, fuzzy dedup, quantile threshold, minhash."""
    import pyarrow as pa
    import ray.data as rd

    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops.dedup_text import minhash_lsh_dedup
    from open_thoughts_ray.ops.fuzzy import fuzzy_dedup
    from open_thoughts_ray.ops.relational import global_quantile_threshold

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert completions(
        empty, "chat", {"user_message": "x {{text}}", "output_column": "o"},
        concurrency=1,
    ).count() == 0
    assert minhash_lsh_dedup(empty, id_col="doc_id").count() == 0
    assert fuzzy_dedup(empty, id_col="doc_id").count() == 0
    ev = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out, thr = global_quantile_threshold(ev, "v", 0.5)
    assert out.count() == 0


def test_r4_ops_on_empty_and_degenerate_inputs(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import delta_neardup_ingest
    from open_thoughts_ray.ops.packing import token_budget_select

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "score": pa.array([], pa.int64()),
        "tok": pa.array([], pa.int64()),
    }))
    assert token_budget_select(empty_docs, "source", "score", "tok",
                               budget=100, id_col="doc_id").count() == 0

    # budget smaller than every document → empty selection
    one = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "source": pa.array(["s"], pa.string()),
        "score": pa.array([5], pa.int64()),
        "tok": pa.array([50], pa.int64()),
    }))
    assert token_budget_select(one, "source", "score", "tok",
                               budget=10, id_col="doc_id").count() == 0

    # empty delta against a non-empty seen corpus
    seen = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c", "d e f"], pa.string()),
    }))
    empty_new = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out = delta_neardup_ingest(empty_new, seen, offset=1000)
    assert out.count() == 0


def test_align_empty_and_filter_all(ray_session):
    import numpy as np
    import ray.data as rd

    from open_thoughts_ray.io import codecs
    from open_thoughts_ray.ops.align import align_filter, align_score

    empty = rd.from_arrow(pa.table({
        "image_id": pa.array([], pa.string()),
        "bytes": pa.array([], pa.binary()),
        "w": pa.array([], pa.int32()),
        "h": pa.array([], pa.int32()),
        "fmt": pa.array([], pa.string()),
        "caption": pa.array([], pa.string()),
    }))
    assert align_score(empty).count() == 0

    px = np.zeros((16, 16, 3), np.uint8)
    one = rd.from_arrow(pa.table({
        "image_id": pa.array(["a"], pa.string()),
        "bytes": pa.array([codecs.encode(px, "raw")], pa.binary()),
        "w": pa.array([16], pa.int32()),
        "h": pa.array([16], pa.int32()),
        "fmt": pa.array(["raw"], pa.string()),
        "caption": pa.array(["totally unrelated caption"], pa.string()),
    }))
    # min_score above any possible cosine → everything filtered, no crash
    assert align_filter(one, min_score=1.5).count() == 0
