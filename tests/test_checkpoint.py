"""Resume-from-partition lineage (BASELINE.md resumability criterion)."""

import json
import os
import shutil

import pytest

from open_thoughts_ray.checkpoint import ChunkManifest, run_flagship
from open_thoughts_ray.pipeline import PipelineOptions


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "flagship_out")


def test_checkpointed_run_and_resume(ray_session, images_table, oracle_frame, out_dir):
    opts = PipelineOptions()
    # full run
    decisions_dir, metrics = run_flagship(images_table, out_dir, opts, chunk_fragments=16)
    assert metrics["rows"] == 10000
    assert metrics["chunks_skipped_on_resume"] == 0
    first_metrics = dict(metrics)

    # simulate a crash after 2 completed chunks: drop later chunks + manifest tail
    man_path = os.path.join(out_dir, "chunks.jsonl")
    lines = open(man_path).read().strip().splitlines()
    assert len(lines) == 4  # 64 fragments / 16 per chunk
    with open(man_path, "w") as f:
        f.write("\n".join(lines[:2]) + "\n")
    for rec in [json.loads(l) for l in lines[2:]]:
        shutil.rmtree(os.path.join(out_dir, "scored", rec["chunk_id"]))
    shutil.rmtree(decisions_dir)

    decisions_dir, metrics = run_flagship(images_table, out_dir, opts, chunk_fragments=16)
    assert metrics["chunks_skipped_on_resume"] == 2
    assert metrics["rows"] == first_metrics["rows"]
    assert metrics["kept"] == first_metrics["kept"]
    assert metrics["drops_by_reason"] == first_metrics["drops_by_reason"]


def test_checkpointed_matches_oracle(ray_session, images_table, oracle_frame, out_dir):
    import glob

    import pyarrow.parquet as pq

    decisions_dir, _ = run_flagship(images_table, out_dir, PipelineOptions(),
                                    chunk_fragments=32)
    import pyarrow as pa

    dec = (
        pa.concat_tables([pq.read_table(p) for p in
                          sorted(glob.glob(os.path.join(decisions_dir, "*.parquet")))])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert (dec.keep.values == oracle_frame.keep.values).mean() >= 0.99
    assert (dec.scrubbed_caption.values == oracle_frame.scrubbed_caption.values).all()


def test_manifest_append_and_read(tmp_path):
    m = ChunkManifest(str(tmp_path / "m.jsonl"))
    assert m.done() == {}
    m.mark_done("chunk-00000", {"rows": 10})
    m.mark_done("chunk-00001", {"rows": 20})
    d = m.done()
    assert set(d) == {"chunk-00000", "chunk-00001"}
    assert d["chunk-00001"]["rows"] == 20


def test_config_change_invalidates_chunks(ray_session, images_table, out_dir):
    """Content-addressed caching (reference dag.py:111-171): a changed
    rule threshold recomputes every chunk; an unchanged config skips."""
    from open_thoughts_ray.ops.text_rules import RuleConfig

    opts = PipelineOptions()
    _, metrics = run_flagship(images_table, out_dir, opts, chunk_fragments=32)
    assert metrics["chunks_skipped_on_resume"] == 0

    # identical config → all chunks skip
    _, metrics = run_flagship(images_table, out_dir, opts, chunk_fragments=32)
    assert metrics["chunks_skipped_on_resume"] == 2

    # changed threshold → stale chunks recompute, decisions change
    opts2 = PipelineOptions(rules=RuleConfig(min_chars=40))
    _, metrics2 = run_flagship(images_table, out_dir, opts2, chunk_fragments=32)
    assert metrics2["chunks_skipped_on_resume"] == 0
    assert metrics2["drops_by_reason"].get("too_short", 0) \
        > metrics["drops_by_reason"].get("too_short", 0)

    # stale .staging dirs and foreign chunk dirs must not leak into the
    # dedup reread
    os.makedirs(os.path.join(out_dir, "scored", "chunk-99999"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "scored", "chunk-00000.staging"),
                exist_ok=True)
    _, metrics3 = run_flagship(images_table, out_dir, opts2, chunk_fragments=32)
    assert metrics3["rows"] == metrics2["rows"]
    assert metrics3["chunks_skipped_on_resume"] == 2


def test_code_fingerprint_tracks_source(tmp_path, monkeypatch):
    """Editing a scoring kernel changes the chunk cache key WITHOUT a
    manual PIPELINE_CODE_VERSION bump (VERDICT r2 #9)."""
    import importlib
    import linecache
    import sys

    from open_thoughts_ray import checkpoint as C

    mod_path = tmp_path / "otr_fp_probe.py"
    mod_path.write_text("X = 1\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    importlib.invalidate_caches()
    fp1 = C.code_fingerprint(("otr_fp_probe",))
    assert fp1 == C.code_fingerprint(("otr_fp_probe",))  # stable
    mod_path.write_text("X = 2  # semantics changed\n")
    linecache.clearcache()
    importlib.reload(sys.modules["otr_fp_probe"])
    fp2 = C.code_fingerprint(("otr_fp_probe",))
    assert fp1 != fp2


def test_config_fingerprint_includes_source_hash(monkeypatch):
    from open_thoughts_ray import checkpoint as C
    from open_thoughts_ray.pipeline import PipelineOptions

    opts = PipelineOptions()
    fp1 = C.config_fingerprint(opts)
    monkeypatch.setattr(C, "code_fingerprint", lambda *a, **k: "different")
    assert C.config_fingerprint(opts) != fp1


def test_fragment_fingerprint_includes_mtime(tmp_path):
    """Same name + same size + different content (rewritten) must change
    the fragment fingerprint (ADVICE r2)."""
    import os

    from open_thoughts_ray.checkpoint import _fragments_fingerprint

    p = tmp_path / "frag-0.parquet"
    p.write_bytes(b"aaaa")
    fp1 = _fragments_fingerprint([str(p)])
    os.utime(p, (1000, 1000))
    fp2 = _fragments_fingerprint([str(p)])
    assert fp1 != fp2
    assert fp2 == _fragments_fingerprint([str(p)])
