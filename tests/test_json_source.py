"""JSON source wrapper: dir expansion, compression codecs, projection,
truncate, provenance tag, seeded shard sampling."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from open_thoughts_ray.io.json_source import read_json_source, sample_shard_paths


@pytest.fixture(scope="module")
def json_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonsrc")
    rows = [{"doc_id": i, "text": f"doc {i}", "lang": "en" if i % 2 else "de"}
            for i in range(40)]
    with open(d / "a.jsonl", "w") as f:
        for r in rows[:20]:
            f.write(json.dumps(r) + "\n")
    with open(d / "b.jsonl", "w") as f:
        for r in rows[20:]:
            f.write(json.dumps(r) + "\n")
    (d / "ignore.txt").write_text("not json")
    return str(d)


def test_dir_read_projection_limit(ray_session, json_dir):
    out = read_json_source(json_dir, columns=["doc_id", "lang"], limit=25)
    df = out.to_pandas()
    assert list(df.columns) == ["doc_id", "lang"]
    assert len(df) == 25
    # rows come only from the two json files, never the .txt
    assert set(df.doc_id) <= set(range(40))
    # truncation against a single file IS deterministic (one read task)
    single = read_json_source(os.path.join(json_dir, "a.jsonl"), limit=5)
    assert sorted(single.to_pandas().doc_id) == [0, 1, 2, 3, 4]


def test_source_tag(ray_session, json_dir):
    out = read_json_source(json_dir, source_tag="webcrawl")
    df = out.to_pandas()
    assert (df.source == "webcrawl").all()


def test_gzip_file(ray_session, tmp_path):
    p = tmp_path / "c.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(10):
            f.write(json.dumps({"doc_id": i, "v": i * i}) + "\n")
    df = read_json_source(str(p)).to_pandas().sort_values("doc_id")
    assert df.v.tolist() == [i * i for i in range(10)]


def test_zstd_file(ray_session, tmp_path):
    if not pa.Codec.is_available("zstd"):
        pytest.skip("no zstd codec")
    import pyarrow as _pa

    p = tmp_path / "d.jsonl.zst"
    payload = "".join(json.dumps({"doc_id": i}) + "\n" for i in range(7))
    with _pa.output_stream(str(p), compression="zstd") as f:
        f.write(payload.encode())
    df = read_json_source(str(p)).to_pandas()
    assert sorted(df.doc_id) == list(range(7))


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_json_source(str(tmp_path))


def test_sample_shard_paths_deterministic():
    paths = [f"s3://bucket/shard-{i:04d}.jsonl.zst" for i in range(100)]
    a = sample_shard_paths(paths, 10, seed=314)
    b = sample_shard_paths(paths, 10, seed=314)
    c = sample_shard_paths(paths, 10, seed=42)
    assert a == b and len(a) == 10
    assert a != c
    assert sample_shard_paths(paths, 200) == sorted(paths)


# ---------------------------------------------------------------- backoff
def test_with_backoff_retries_then_succeeds():
    from open_thoughts_ray.io.json_source import with_backoff

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise OSError("SlowDown")
        return "ok"

    out = with_backoff(flaky, max_retries=7, base_s=1.0,
                       sleep=sleeps.append, seed=7)
    assert out == "ok" and calls["n"] == 4
    # exponential envelope with full jitter: attempt k sleeps in
    # [0.5, 1.0] * 2^k * base
    assert len(sleeps) == 3
    for k, s in enumerate(sleeps):
        assert 0.5 * (2 ** k) <= s <= 1.0 * (2 ** k)


def test_with_backoff_exhausts_and_raises():
    from open_thoughts_ray.io.json_source import with_backoff

    def always(): raise OSError("SlowDown")
    with pytest.raises(OSError):
        with_backoff(always, max_retries=2, base_s=0.0, sleep=lambda s: None)


def test_with_backoff_non_retryable_propagates():
    from open_thoughts_ray.io.json_source import with_backoff

    def bad(): raise ValueError("schema")
    calls = []
    with pytest.raises(ValueError):
        with_backoff(lambda: (calls.append(1), bad())[1], max_retries=5,
                     base_s=0.0, sleep=lambda s: None)
    assert len(calls) == 1  # no retry on non-transient errors


def test_resilient_sharded_read_survives_transient_faults(ray_session, json_dir):
    from open_thoughts_ray.io.json_source import read_sharded_jsonl_resilient

    # nested def → cloudpickle serializes it by VALUE into the read
    # tasks (a tests-module function pickles by reference and workers
    # can't import the tests dir)
    def transient_twice(path, attempt):
        if attempt < 2:
            raise OSError(f"SlowDown {path} attempt {attempt}")

    ds = read_sharded_jsonl_resilient(
        json_dir, columns=["doc_id"], max_retries=7,
        backoff_base_s=0.001, shard_path_col="shard",
        _fault_hook=transient_twice)
    df = ds.to_pandas()
    assert sorted(df.doc_id) == list(range(40))
    assert df["shard"].nunique() == 2  # one provenance value per file


def test_resilient_sharded_read_gives_up(ray_session, json_dir):
    from open_thoughts_ray.io.json_source import read_sharded_jsonl_resilient

    def always_down(path, attempt):
        raise OSError("SlowDown forever")

    ds = read_sharded_jsonl_resilient(
        json_dir, max_retries=1, backoff_base_s=0.001,
        _fault_hook=always_down)
    with pytest.raises(Exception):
        ds.to_pandas()


def test_resilient_sharded_read_seeded_sample(ray_session, json_dir):
    from open_thoughts_ray.io.json_source import read_sharded_jsonl_resilient

    # num_shards=1, seed fixed → exactly one of the two files, stable
    a = read_sharded_jsonl_resilient(json_dir, num_shards=1, seed=314,
                                     columns=["doc_id"]).to_pandas()
    b = read_sharded_jsonl_resilient(json_dir, num_shards=1, seed=314,
                                     columns=["doc_id"]).to_pandas()
    assert len(a) == 20
    assert sorted(a.doc_id) == sorted(b.doc_id)
