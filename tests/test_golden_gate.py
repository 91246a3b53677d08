"""Guards for the generalized golden-fixture oracles
(scripts/gen_golden.py): every fixture referenced by ``oracle_sql()``
must exist, be non-empty, and keep the SAME schema the live query
produces — so a refactor that drifts a column name or dtype fails here
instead of silently hash-mismatching in the driver window."""

import importlib.util
import os

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "open_thoughts_ray", "fixtures",
                          "golden_gate")
SF_SMALL = "/root/testdata/sf0.001"

GOLDEN_NAMES = [
    "fuzzy_dedup_documents",
    "kcenter_select_embeddings",
    "image_caption_alignment",
    "image_search_corpus",
    "approx_top_tokens_documents",
    "distill_quality_documents",
    "tree_search_documents",
    "ann_topk_ivf_embeddings",
    "semantic_dedup_embeddings",
    "arpa_ppl_documents",
]


def _entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_golden_test", os.path.join(REPO, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_fixtures_exist_and_wired():
    m = _entry()
    sqls = m.oracle_sql()
    for name in GOLDEN_NAMES:
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        assert os.path.exists(path), name
        assert len(pd.read_parquet(path)) > 0, name
        assert name in sqls and path in sqls[name], name


@pytest.mark.parametrize("name", ["fuzzy_dedup_documents",
                                  "kcenter_select_embeddings",
                                  "approx_top_tokens_documents"])
def test_live_schema_matches_fixture(ray_session, name):
    """Run the query on the tiny sf0.001 tables (values differ — the
    fixture is pinned to sf0.01 — but column names and dtypes must
    match what the fixture froze)."""
    m = _entry()
    res = m.queries()[name](SF_SMALL)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    gold = pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    assert sorted(df.columns) == sorted(gold.columns)
    for c in gold.columns:
        assert df[c].dtype == gold[c].dtype, (c, df[c].dtype, gold[c].dtype)
