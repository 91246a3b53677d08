"""Pipeline-vs-oracle agreement on an INDEPENDENT table (different seed,
size, partitioning) — guards against overfitting the main fixture."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from open_thoughts_ray.fixtures.images import build_images_table
from open_thoughts_ray.io import lance_table
from open_thoughts_ray.models import artifacts
from open_thoughts_ray.oracle.reference_impl import oracle_labels
from open_thoughts_ray.pipeline import PipelineOptions, quality_filter_dataset


def test_second_seed_agreement(ray_session):
    d = build_images_table("/tmp/otr_pytest_images_seed7", n_rows=800, n_parts=5,
                           seed=7, use_ray=True)
    dec = (
        quality_filter_dataset(lance_table.read_dataset(d),
                               PipelineOptions.for_cluster(4))
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    imgs = pa.concat_tables([pq.read_table(p) for p in lance_table.fragment_paths(d)])
    lab = (
        oracle_labels(imgs, artifacts.load_langid(), artifacts.load_lm())
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    assert (dec.keep.values == lab.keep.values).all()
    assert (dec.drop_reason.values == lab.drop_reason.values).all()
    assert (dec.scrubbed_caption.values == lab.scrubbed_caption.values).all()
    assert (dec.dup_group.values == lab.dup_group.values).all()


def test_labels_table_materialization(ray_session, images_table):
    """FIXTURES.md F1: labels persisted alongside the images table."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.oracle.reference_impl import write_labels_table

    out = write_labels_table("/tmp/otr_pytest_images_seed7")
    paths = lance_table.fragment_paths(out)
    t = pq.read_table(paths[0])
    assert set(t.schema.names) >= {"image_id", "keep", "drop_reason",
                                   "scrubbed_caption", "dup_group", "lang",
                                   "lang_conf", "ppl"}
    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == 800
