"""Per-operator content-addressed YAML DAG cache (dagcache.py) and
load_preexisting sub-DAG splicing (yaml_pipeline.expand_includes) —
VERDICT r3 items #2 and #4.  Reference semantics: engine/dag.py:111-171
ancestor hashes + synthetic_data_manager.py:1228-1307 sub-DAG splice."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import yaml

from open_thoughts_ray.dagcache import run_pipeline_cached
from open_thoughts_ray.yaml_pipeline import (
    expand_includes,
    parse_pipeline,
    run_pipeline,
    run_pipeline_file,
)


def _write_input(tmp_path, n=20):
    p = str(tmp_path / "in.parquet")
    pq.write_table(
        pa.table({"id": pa.array(range(n), pa.int64()),
                  "output": pa.array([f"text {i}" for i in range(n)],
                                     pa.string())}), p)
    return p


def _doc(path, limit_n=6):
    return {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "upper", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.uppercase_output"}},
        {"id": "bang", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.add_exclamation"}},
        {"id": "lim", "config": {"type": "limit", "n": limit_n}},
    ]}


def test_cached_run_then_full_hit(ray_session, tmp_path):
    path = _write_input(tmp_path)
    cache = str(tmp_path / "cache")
    out1, rep1 = run_pipeline_cached(_doc(path), cache)
    assert rep1 == {"src": "computed", "upper": "computed",
                    "bang": "computed", "lim": "computed"}
    df1 = out1.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df1) == 6 and df1.output.iloc[0] == "TEXT 0!"

    out2, rep2 = run_pipeline_cached(_doc(path), cache)
    assert rep2 == {k: "hit" for k in rep1}
    df2 = out2.to_pandas().sort_values("id").reset_index(drop=True)
    assert df1.equals(df2)


def test_mid_dag_edit_recomputes_only_suffix(ray_session, tmp_path):
    """The VERDICT done-criterion: edit one mid-DAG op in a 4-op YAML
    and only the suffix recomputes."""
    path = _write_input(tmp_path)
    cache = str(tmp_path / "cache")
    run_pipeline_cached(_doc(path, limit_n=6), cache)

    doc = _doc(path, limit_n=6)
    doc["operators"][2]["config"] = {  # edit the MIDDLE op
        "type": "map_batches_function",
        "function": "tests.yaml_udfs.uppercase_output"}
    out, rep = run_pipeline_cached(doc, cache)
    assert rep == {"src": "hit", "upper": "hit",
                   "bang": "computed", "lim": "computed"}
    assert out.to_pandas().output.iloc[0] == "TEXT 0"  # no '!' now

    # tuning-only change (batch_size) must NOT invalidate anything
    doc2 = _doc(path, limit_n=6)
    doc2["operators"][1]["config"]["batch_size"] = 4
    _, rep2 = run_pipeline_cached(doc2, cache)
    assert rep2 == {k: "hit" for k in rep2}


def test_input_file_change_invalidates(ray_session, tmp_path):
    import os
    import time

    path = _write_input(tmp_path)
    cache = str(tmp_path / "cache")
    run_pipeline_cached(_doc(path), cache)
    time.sleep(0.01)
    _write_input(tmp_path, n=30)  # rewrite source file
    os.utime(path)
    out, rep = run_pipeline_cached(_doc(path), cache)
    assert rep["src"] == "computed"          # source identity changed
    assert rep["lim"] == "computed"          # and everything downstream


def test_no_cache_ops_stream(ray_session, tmp_path):
    path = _write_input(tmp_path)
    cache = str(tmp_path / "cache")
    doc = _doc(path)
    doc["operators"][3]["config"]["no_cache"] = True
    out, rep = run_pipeline_cached(doc, cache)
    assert rep["lim"] == "streamed"
    assert out.count() == 6


def test_load_preexisting_splice(ray_session, tmp_path):
    """examples-style splice: one strategy file included by another runs
    end-to-end, with default chaining continuing off the spliced output."""
    path = _write_input(tmp_path)
    subfile = tmp_path / "base.yaml"
    subfile.write_text(yaml.safe_dump({"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "upper", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.uppercase_output"}},
    ]}))
    top = tmp_path / "top.yaml"
    top.write_text(yaml.safe_dump({"operators": [
        {"id": "base", "config": {"type": "load_preexisting",
                                  "path": "base.yaml"}},
        {"id": "bang", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.add_exclamation"}},
    ]}))
    out = run_pipeline_file(str(top)).to_pandas().sort_values("id")
    assert len(out) == 20
    assert out.output.iloc[0] == "TEXT 0!"


def test_load_preexisting_shared_subdag_dedup(ray_session, tmp_path):
    """Two includes of the same file share ONE sub-DAG (content-hash
    namespace), and both including ids stay addressable."""
    path = _write_input(tmp_path)
    subfile = tmp_path / "base.yaml"
    subfile.write_text(yaml.safe_dump({"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
    ]}))
    doc = {"operators": [
        {"id": "a", "config": {"type": "load_preexisting",
                               "path": str(subfile)}},
        {"id": "b", "config": {"type": "load_preexisting",
                               "path": str(subfile)}},
        {"id": "both", "input_ids": ["a", "b"],
         "config": {"type": "concatenate"}},
    ]}
    expanded = expand_includes(doc)
    sub_ids = [o["id"] for o in expanded["operators"]
               if o["id"].startswith("_sub_")]
    assert len(sub_ids) == 1  # spliced once, not twice
    ops = parse_pipeline(expanded)
    assert ops[-1].input_ids == ["a", "b"]
    out = run_pipeline(doc)
    assert out.count() == 40  # both branches read the shared splice


def test_load_preexisting_cached(ray_session, tmp_path):
    """Spliced sub-DAG ops participate in the operator cache."""
    path = _write_input(tmp_path)
    subfile = tmp_path / "base.yaml"
    subfile.write_text(yaml.safe_dump({"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "upper", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.uppercase_output"}},
    ]}))
    doc = {"operators": [
        {"id": "base", "config": {"type": "load_preexisting",
                                  "path": str(subfile)}},
        {"id": "lim", "config": {"type": "limit", "n": 3}},
    ]}
    cache = str(tmp_path / "cache")
    _, rep1 = run_pipeline_cached(doc, cache)
    assert sorted(rep1.values()).count("computed") == 3  # src, upper, lim
    _, rep2 = run_pipeline_cached(doc, cache)
    assert all(v in ("hit", "streamed") for v in rep2.values())


def test_yaml_temporal_analytics_ops(ray_session, tmp_path):
    """The r4 YAML grammar additions: sessionize / rolling_sum /
    majority_vote / top_n_per_group / bottom_k / grouped_quantile /
    grouped_ntile drive the segment-walk operators from config."""
    import pandas as pd
    import pyarrow.parquet as pq

    events = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([0, 30, 200, 10, 20], unit="s"),
        "event_id": [1, 2, 3, 4, 5],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        "event_type": ["a", "a", "b", "b", "b"],
    })
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(events), p)

    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": p}},
        {"id": "sess", "config": {"type": "sessionize", "key": "user_id",
                                  "ts_column": "ts", "gap_s": 60}},
    ]}
    out = run_pipeline(doc).to_pandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    assert out.n_events.tolist() == [2, 1, 2]

    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": p}},
        {"id": "mv", "config": {"type": "majority_vote",
                                "group_column": "user_id",
                                "value_column": "event_type"}},
    ]}
    mv = run_pipeline(doc).to_pandas().sort_values("user_id")
    assert mv.majority_event_type.tolist() == ["a", "b"]

    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": p}},
        {"id": "bk", "config": {"type": "bottom_k",
                                "order_columns": ["value"], "k": 2}},
    ]}
    bk = run_pipeline(doc).to_pandas()
    assert sorted(bk.value.tolist()) == [1.0, 2.0]

    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": p}},
        {"id": "q", "config": {"type": "grouped_quantile",
                               "group_column": "user_id",
                               "value_column": "value", "q": 0.5}},
    ]}
    med = run_pipeline(doc).to_pandas().sort_values("user_id")
    assert med.q50_value.tolist() == [2.0, 4.5]
