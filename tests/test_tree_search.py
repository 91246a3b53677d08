"""Level-synchronous tree search (llm/tree_search.py) vs the
reference's per-prompt BFS semantics."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.llm.tree_search import tree_search


def _prompts(n=4):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "instruction": pa.array([f"solve problem {i}" for i in range(n)],
                                pa.string()),
    })


def _run(**kw):
    ds = rd.from_arrow(_prompts()).repartition(2)
    out = tree_search(ds, beam_width=2, beam_depth=2, **kw).to_pandas()
    out["trace"] = out.steps.map(lambda s: " | ".join(s))
    return out.sort_values(["doc_id", "trace"]).reset_index(drop=True)


def test_structure_and_expansion_rules(ray_session):
    out = _run()
    # one root per prompt at depth 0
    roots = out[out.depth == 0]
    assert sorted(roots.doc_id) == [0, 1, 2, 3]
    # every child's parent trace exists at depth-1 and is non-terminal
    by_key = {(r.doc_id, r.trace): r for r in out.itertuples()}
    for r in out.itertuples():
        if r.depth == 0:
            continue
        parent = by_key[(r.doc_id, " | ".join(r.steps[:-1]))]
        assert parent.depth == r.depth - 1
        assert not parent.is_terminal  # terminal nodes never expand
    # beam width: each parent has at most 2 children
    kids = out[out.depth > 0].copy()
    kids["parent"] = kids.steps.map(lambda s: " | ".join(s[:-1]))
    assert kids.groupby(["doc_id", "parent"]).size().max() <= 2
    # beam depth: nothing deeper than 2
    assert out.depth.max() <= 2


def test_deterministic(ray_session):
    a, b = _run(), _run()
    pd.testing.assert_frame_equal(a, b)


def test_node_budget_caps_visited(ray_session):
    out = _run(node_budget=3)
    counts = out.groupby("doc_id").size()
    assert (counts <= 3).all()
    # budget is a prefix of the unbudgeted BFS in level order
    full = _run()
    for did in range(4):
        got = set(out[out.doc_id == did].trace)
        ref = full[full.doc_id == did].sort_values(["depth", "trace"])
        assert got == set(ref.trace.head(len(got)))


def test_yaml_tree_search(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    pq.write_table(_prompts(2), tmp_path / "p.parquet")
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "p.parquet")}},
        {"id": "tree", "config": {"type": "tree_search", "beam_width": 2,
                                  "beam_depth": 1, "node_budget": 3}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert set(out.doc_id) == {0, 1}
    assert out.depth.max() <= 1
    assert out.groupby("doc_id").size().max() <= 3
