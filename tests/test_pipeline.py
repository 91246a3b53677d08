"""Flagship pipeline vs the single-process oracle (the BASELINE.md gate:
keep/drop F1 ≥ 0.99, scrubbed-caption exact match, dup-group equality)."""

import numpy as np
import pytest

from open_thoughts_ray.io import lance_table
from open_thoughts_ray.pipeline import PipelineOptions, quality_filter_dataset


@pytest.fixture(scope="module")
def decisions(ray_session, images_table):
    ds = lance_table.read_dataset(images_table)
    out = quality_filter_dataset(ds)
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def test_rowcount_and_schema(decisions):
    assert len(decisions) == 10000
    assert list(decisions.columns) == [
        "image_id", "keep", "drop_reason", "scrubbed_caption", "dup_group",
        "lang", "lang_conf", "ppl",
    ]


def test_keep_drop_f1(decisions, oracle_frame):
    assert list(decisions.image_id) == list(oracle_frame.image_id)
    tp = int((decisions.keep & oracle_frame.keep).sum())
    fp = int((decisions.keep & ~oracle_frame.keep).sum())
    fn = int((~decisions.keep & oracle_frame.keep).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1}"


def test_drop_reasons_match(decisions, oracle_frame):
    agree = (decisions.drop_reason.values == oracle_frame.drop_reason.values).mean()
    assert agree >= 0.99


def test_scrubbed_caption_exact(decisions, oracle_frame):
    assert (
        decisions.scrubbed_caption.values == oracle_frame.scrubbed_caption.values
    ).all()


def test_dup_groups_match(decisions, oracle_frame):
    assert (decisions.dup_group.values == oracle_frame.dup_group.values).mean() >= 0.99


def test_lang_ppl_match(decisions, oracle_frame):
    assert (decisions.lang.values == oracle_frame.lang.values).all()
    assert np.allclose(decisions.ppl.values, oracle_frame.ppl.values, rtol=1e-6)


def test_every_rule_fires(decisions):
    reasons = set(decisions.drop_reason.unique())
    for expected in ("empty", "too_short", "too_long", "lang", "ppl",
                     "repetition", "symbol", "near_dup"):
        assert expected in reasons, f"rule {expected} never fired"


def test_planted_dups_collapse(decisions, images_table):
    """Kept rows must contain no two members of the same dup group."""
    kept = decisions[decisions.keep]
    assert kept.dup_group.is_unique


def test_distributed_labeling_identical(decisions, ray_session, images_table):
    """The label-propagation scale path (no driver union-find) must make
    byte-identical decisions to the broadcast-dict path."""
    ds = lance_table.read_dataset(images_table)
    out = quality_filter_dataset(ds, force_distributed=True)
    dist = out.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(dist.image_id) == list(decisions.image_id)
    assert (dist.keep.values == decisions.keep.values).all()
    assert (dist.drop_reason.values == decisions.drop_reason.values).all()
    assert (dist.dup_group.values == decisions.dup_group.values).all()


def test_geometry_gate_option_prunes_before_decode(ray_session, images_table):
    """Opt-in geometry pre-gate: tiny/extreme-aspect rows vanish from the
    decisions; default (off) keeps reference parity."""
    import ray.data as rd

    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.pipeline import (PipelineOptions,
                                            quality_filter_dataset)

    ds = lance_table.read_dataset(images_table).limit(300)
    base = quality_filter_dataset(
        ds, PipelineOptions.for_cluster(4)).to_pandas()
    gated = quality_filter_dataset(
        lance_table.read_dataset(images_table).limit(300),
        PipelineOptions.for_cluster(4, geometry_gate=True,
                                    geometry_min_side=40)).to_pandas()
    # the gate can only shrink the decision set (fixture thumbs are
    # 16-64 px, so min_side=40 must drop some)
    assert len(gated) < len(base)
    assert set(gated.image_id) <= set(base.image_id)
