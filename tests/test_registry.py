"""Run-metadata registry (registry.py + CLI runs command) — the
reference's Postgres catalog analogue (synthetic_data_manager.py:818-980),
VERDICT r3 item #9."""

import pyarrow as pa
import pyarrow.parquet as pq
import yaml

from open_thoughts_ray.dagcache import run_pipeline_cached
from open_thoughts_ray.registry import RunRegistry


def _write_input(tmp_path, n=10):
    p = str(tmp_path / "in.parquet")
    pq.write_table(
        pa.table({"id": pa.array(range(n), pa.int64()),
                  "output": pa.array([f"text {i}" for i in range(n)],
                                     pa.string())}), p)
    return p


def test_registry_records_cached_run(ray_session, tmp_path):
    path = _write_input(tmp_path)
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "lim", "config": {"type": "limit", "n": 4}},
    ]}
    reg_dir = str(tmp_path / "reg")
    run_pipeline_cached(doc, str(tmp_path / "cache"), registry_dir=reg_dir)
    run_pipeline_cached(doc, str(tmp_path / "cache"), registry_dir=reg_dir)

    reg = RunRegistry(reg_dir)
    runs = reg.runs()
    assert len(runs) == 2
    t = reg.stage_table()
    assert set(t.columns) >= {"run_id", "op_id", "fingerprint", "status",
                              "rows", "wall_s"}
    first, second = runs[0], runs[1]
    by_id1 = {s["op_id"]: s for s in first["stages"]}
    by_id2 = {s["op_id"]: s for s in second["stages"]}
    assert by_id1["lim"]["status"] == "computed"
    assert by_id2["lim"]["status"] == "hit"
    # rows survive the cache hit (read back from meta.json)
    assert by_id1["lim"]["rows"] == by_id2["lim"]["rows"] == 4
    # fingerprints are stable across runs — the catalog's join key
    assert by_id1["src"]["fingerprint"] == by_id2["src"]["fingerprint"]


def test_cli_runs_command(ray_session, tmp_path):
    from open_thoughts_ray.__main__ import main

    path = _write_input(tmp_path)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(yaml.safe_dump({"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "lim", "config": {"type": "limit", "n": 3}},
    ]}))
    reg_dir = str(tmp_path / "reg")
    res = main(["yaml", str(cfg), "--cache-dir", str(tmp_path / "c"),
                "--registry", reg_dir])
    assert res["rows"] == 3
    assert res["cache"]["lim"] == "computed"
    listing = main(["runs", "--registry", reg_dir])
    assert listing["n_runs"] == 1 and listing["n_stage_rows"] == 2


def test_flagship_records_to_registry(ray_session, tmp_path, monkeypatch):
    from open_thoughts_ray.fixtures.images import build_images_table
    from open_thoughts_ray.pipeline import PipelineOptions, run_checkpointed

    table = str(tmp_path / "imgs")
    build_images_table(table, n_rows=200, n_parts=4, seed=7)
    reg_dir = str(tmp_path / "reg")
    monkeypatch.setenv("OTR_REGISTRY_DIR", reg_dir)
    run_checkpointed(table, str(tmp_path / "out"),
                     PipelineOptions.for_cluster(4), chunk_fragments=2)
    run_checkpointed(table, str(tmp_path / "out"),
                     PipelineOptions.for_cluster(4), chunk_fragments=2)

    reg = RunRegistry(reg_dir)
    runs = [r for r in reg.runs() if r["kind"] == "flagship"]
    assert len(runs) == 2
    s1 = {s["op_id"]: s["status"] for s in runs[0]["stages"]}
    s2 = {s["op_id"]: s["status"] for s in runs[1]["stages"]}
    assert set(s1.values()) == {"computed"}
    assert set(s2.values()) == {"hit"}      # resume skipped every chunk
    assert all(s["rows"] is not None for s in runs[1]["stages"])
