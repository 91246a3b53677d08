"""Incremental MinHash near-dup ingest (dedup_text.delta_neardup_ingest)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.ops.dedup_text import delta_neardup_ingest


def _doc(rng, n=30):
    return " ".join(f"w{int(v)}" for v in rng.integers(0, 500, n))


def _perturb(text, rng):
    toks = text.split()
    i = int(rng.integers(0, len(toks)))
    toks[i] = "zz" + toks[i]
    return " ".join(toks)


def test_delta_drops_dups_of_seen_and_within_delta(ray_session):
    rng = np.random.default_rng(21)
    seen_texts = [_doc(rng) for _ in range(20)]
    seen = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
    })
    # new batch: 0-4 fresh, 5-9 near-copies of seen docs, 10 a fresh
    # doc and 11 its near-copy (within-delta first-seen)
    fresh = [_doc(rng) for _ in range(5)]
    copies = [_perturb(seen_texts[i], rng) for i in range(5)]
    d10 = _doc(rng)
    new = pa.table({
        "doc_id": pa.array(range(100, 112), pa.int64()),
        "text": pa.array(fresh + copies + [d10, _perturb(d10, rng)],
                         pa.string()),
    })
    out = delta_neardup_ingest(
        rd.from_arrow(new).repartition(4),
        rd.from_arrow(seen).repartition(4),
        threshold=0.5).to_pandas()
    ids = set(out.doc_id)
    assert ids == {100, 101, 102, 103, 104, 110}
    # full-width rows come back (schema preserved)
    assert list(out.columns) == ["doc_id", "text"]


def test_delta_no_dups_passthrough(ray_session):
    rng = np.random.default_rng(5)
    seen = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([_doc(rng) for _ in range(10)], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array(range(50, 60), pa.int64()),
        "text": pa.array([_doc(rng) for _ in range(10)], pa.string()),
    })
    out = delta_neardup_ingest(rd.from_arrow(new), rd.from_arrow(seen),
                               threshold=0.5).to_pandas()
    assert sorted(out.doc_id) == list(range(50, 60))


def test_yaml_delta_and_kcenter(ray_session, tmp_path):
    """YAML grammar for the late-r4 ops: two-input delta dedup and
    k-center selection."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    rng = np.random.default_rng(77)
    seen_texts = [_doc(rng) for _ in range(8)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
    }), tmp_path / "seen.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([_perturb(seen_texts[0], rng), _doc(rng)],
                         pa.string()),
    }), tmp_path / "new.parquet")
    doc = {"operators": [
        {"id": "new", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "new.parquet")}},
        {"id": "seen", "config": {"type": "parquet_source",
                                  "path": str(tmp_path / "seen.parquet")}},
        {"id": "kept", "input_ids": ["new", "seen"],
         "config": {"type": "dedup_delta_minhash", "threshold": 0.5}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert list(out.doc_id) == [101]

    # kcenter over a tiny embedding table
    emb = pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array(
            [list(map(float, rng.standard_normal(8))) for _ in range(20)],
            pa.list_(pa.float64())),
    })
    pq.write_table(emb, tmp_path / "emb.parquet")
    doc2 = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "emb.parquet")}},
        {"id": "sel", "config": {"type": "kcenter_select", "k": 4}},
    ]}
    out2 = run_pipeline(doc2).to_pandas()
    assert len(out2) == 4


def test_example_continuous_ingest_yaml(ray_session, tmp_path):
    """examples/continuous_ingest.yaml end to end: delta vet →
    distilled quality filter → token budget."""
    import pyarrow.parquet as pq
    import yaml

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    rng = np.random.default_rng(91)
    seen_texts = [_doc(rng) for _ in range(10)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
        "source": pa.array(["web"] * 10, pa.string()),
    }), tmp_path / "seen.parquet")
    rows = []
    for i in range(20):
        good = i % 2 == 0
        base = ("photosynthesis " if good else "buy now ") + _doc(rng, 20)
        rows.append((100 + i, base, "web" if i < 10 else "books"))
    # plus one near-copy of a seen doc (must be vetted out)
    rows.append((200, _perturb(seen_texts[0], rng), "web"))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }), tmp_path / "new.parquet")
    text = open("examples/continuous_ingest.yaml").read() \
        .replace("{new_path}", str(tmp_path / "new.parquet")) \
        .replace("{seen_path}", str(tmp_path / "seen.parquet"))
    out = run_pipeline(yaml.safe_load(text)).to_pandas()
    assert 200 not in set(out.doc_id)            # delta vet dropped it
    assert (out.doc_id % 2 == 0).all()           # quality kept evens
    spent = out.groupby("source")["n_tokens"].sum()
    assert (spent <= 400).all()                  # budget respected
    assert len(out) > 0


def test_delta_empty_seen_first_ingest(ray_session):
    """ADVICE r4: first-ever ingest (empty seen corpus) must not crash
    on int(None) and must behave as plain first-seen dedup."""
    rng = np.random.default_rng(77)
    d0 = _doc(rng)
    new = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([d0, _perturb(d0, rng), _doc(rng)], pa.string()),
    })
    seen = pa.table({"doc_id": pa.array([], pa.int64()),
                     "text": pa.array([], pa.string())})
    out = delta_neardup_ingest(
        rd.from_arrow(new).repartition(2),
        rd.from_arrow(seen), threshold=0.5).to_pandas()
    assert set(out.doc_id) == {1, 3}
