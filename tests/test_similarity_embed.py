import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops.embed import TextEmbedder, embed_dataset, train_text_classifier
from open_thoughts_ray.ops.similarity import ann_topk, cosine_dedup_earlier, lsh_bucket_batch


def _emb_df(n=60, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-duplicates: rows 10/11 and 20/21 nearly identical
    m[11] = m[10] + rng.standard_normal(dim).astype(np.float32) * 0.01
    m[21] = m[20] + rng.standard_normal(dim).astype(np.float32) * 0.01
    return pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in m]}), m


def test_ann_topk_matches_numpy(ray_session):
    import ray.data as rd

    df, m = _emb_df()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = ann_topk(rd.from_pandas(df), m[:3], k=5, query_ids=[0, 1, 2]).to_pandas()
    for q in range(3):
        sims = mn @ mn[q]
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
        expect = [i for i in order if i != q][:5]
        got = list(out[out.query_id == q].sort_values("rank").vec_id)
        assert got == expect, (q, got, expect)


def test_cosine_dedup_earlier(ray_session):
    import ray.data as rd

    df, m = _emb_df()
    out = cosine_dedup_earlier(rd.from_pandas(df), threshold=0.95).to_pandas()
    ids = set(out.vec_id)
    assert 10 in ids and 11 not in ids
    assert 20 in ids and 21 not in ids
    assert len(ids) == 58


def test_lsh_bucket_batch_groups_near_dups():
    df, m = _emb_df()
    t = pa.table({"vec_id": pa.array(df.vec_id, pa.int64()),
                  "embedding": pa.array(df.embedding, pa.list_(pa.float32()))})
    out = lsh_bucket_batch(t)
    buckets = out.column("lsh_bucket").to_pylist()
    assert buckets[10] == buckets[11]
    assert buckets[20] == buckets[21]


def test_text_embedder_deterministic_and_normalized():
    e1, e2 = TextEmbedder(), TextEmbedder()
    v1 = e1._encode(["the small cat sits on the mat", "another text"])
    v2 = e2._encode(["the small cat sits on the mat", "another text"])
    assert np.array_equal(v1, v2)
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0, atol=1e-5)
    # similar texts → closer than dissimilar
    a, b, c = e1._encode([
        "the small cat sits on the mat",
        "the small cat sits on the old mat",
        "zorvax pelmight quandrosite verbelung",
    ])
    assert a @ b > a @ c


def test_embed_dataset_schema(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "d e f"]}))
    out = embed_dataset(ds).take_all()
    assert len(out[0]["embedding"]) == 64


def test_train_text_classifier_separates(ray_session):
    import ray.data as rd

    from open_thoughts_ray.fixtures import textgen
    from open_thoughts_ray.models.fasttext_like import HashedNgramClassifier

    pos = [textgen.gen_clean_en(np.random.default_rng(100 + i)) for i in range(150)]
    neg = [textgen.gen_lang(np.random.default_rng(500 + i), "xx1") for i in range(150)]
    model_bytes = train_text_classifier(
        rd.from_pandas(pd.DataFrame({"text": pos})),
        rd.from_pandas(pd.DataFrame({"text": neg})),
    )
    clf = HashedNgramClassifier.from_bytes(model_bytes)
    labels, _ = clf.predict_batch(
        [textgen.gen_clean_en(np.random.default_rng(900 + i)) for i in range(50)]
    )
    assert labels.count("pos") >= 49


def test_train_classifier_distributed_bit_identical(ray_session):
    """The distributed count-merge fit must produce byte-identical model
    bytes to the serial HashedNgramClassifier.train on the same rows —
    integer count sums are associative, the driver applies the same
    smoothing/log path."""
    import ray.data as rd

    from open_thoughts_ray.fixtures import textgen
    from open_thoughts_ray.models.fasttext_like import HashedNgramClassifier
    from open_thoughts_ray.ops.embed import train_text_classifier_distributed

    pos = [textgen.gen_clean_en(np.random.default_rng(100 + i)) for i in range(80)]
    neg = [textgen.gen_lang(np.random.default_rng(500 + i), "xx1") for i in range(80)]
    texts = pos + neg + [""]  # empty text contributes its padding gram
    labels = ["pos"] * 80 + ["neg"] * 80 + ["neg"]
    serial = HashedNgramClassifier.train(texts, labels).to_bytes()
    df = pd.DataFrame({"text": texts, "label": labels})
    dist = train_text_classifier_distributed(
        rd.from_pandas(df).repartition(7))
    assert dist == serial
    clf = HashedNgramClassifier.from_bytes(dist)
    got, _ = clf.predict_batch(
        [textgen.gen_clean_en(np.random.default_rng(900 + i)) for i in range(30)])
    assert got.count("pos") >= 29


def _brute_force_survivors(m: np.ndarray, threshold: float) -> set:
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    keep = set()
    for i in range(len(m)):
        if i == 0 or sims[:i, i].max() < threshold:
            keep.add(i)
    return keep


def test_cosine_dedup_earlier_multiblock_exact(ray_session):
    """The block-pair plan must be exact across many blocks (peak task
    memory = 2 blocks; no full-matrix broadcast)."""
    import ray.data as rd

    df, m = _emb_df(n=300, dim=16, seed=11)
    ds = rd.from_pandas(df).repartition(12)  # force many id-range blocks
    out = cosine_dedup_earlier(ds, threshold=0.4).to_pandas()
    assert set(out.vec_id) == _brute_force_survivors(m, 0.4)


def test_cosine_dedup_lsh_matches_exact_on_near_identicals(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.similarity import cosine_dedup_lsh

    rng = np.random.default_rng(5)
    n, dim = 400, 32
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # plant 40 near-identical pairs (cos ≥ 0.99)
    for i in range(40):
        m[200 + i] = m[i] + rng.standard_normal(dim).astype(np.float32) * 0.01
    df = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in m]})
    out = cosine_dedup_lsh(rd.from_pandas(df), threshold=0.95).to_pandas()
    assert set(out.vec_id) == _brute_force_survivors(m, 0.95)


def test_ann_topk_ivf_recall(ray_session):
    """IVF candidate restriction: recall@10 ≥ 0.9 vs exact brute force
    on clustered data."""
    import ray.data as rd

    from open_thoughts_ray.ops.similarity import ann_topk_ivf

    rng = np.random.default_rng(17)
    n, dim, n_clusters = 2000, 32, 20
    centers = rng.standard_normal((n_clusters, dim)) * 3
    m = (centers[rng.integers(0, n_clusters, n)] +
         rng.standard_normal((n, dim))).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in m]})
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    queries = m[:5]
    got = ann_topk_ivf(rd.from_pandas(df), queries, k=10,
                       query_ids=list(range(5)), n_cells=32,
                       n_probe=8).to_pandas()
    hits = total = 0
    for q in range(5):
        sims = mn @ mn[q]
        order = sorted(range(n), key=lambda i: (-sims[i], i))
        exact = {i for i in order if i != q}
        exact = set(list(sorted(exact, key=lambda i: (-sims[i], i)))[:10])
        approx = set(got[got.query_id == q].vec_id)
        hits += len(exact & approx)
        total += 10
    assert hits / total >= 0.9, hits / total


def test_ann_topk_ivf_block_count_invariant(ray_session):
    """Different block counts (≈ parallelism) must give the identical
    result frame: content-sorted quantizer sample, exact int64 cell
    assignment/cosines, id-tiebroken per-batch candidate selection."""
    import ray.data as rd

    from open_thoughts_ray.ops.similarity import ann_topk_ivf

    rng = np.random.default_rng(29)
    n, dim = 600, 16
    m = rng.standard_normal((n, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(n),
                       "embedding": [v.tolist() for v in m]})
    queries = m[:4]

    def run(blocks):
        out = ann_topk_ivf(rd.from_pandas(df, override_num_blocks=blocks),
                           queries, k=7, query_ids=list(range(4)),
                           n_cells=8, n_probe=3).to_pandas()
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    assert run(1).equals(run(9))


def test_cosine_dedup_earlier_autoroutes_to_lsh(ray_session, caplog):
    """VERDICT r3 #6: above max_exact_rows the exact O(N^2) scan must
    route to the banded-LSH path instead of silently going quadratic."""
    import logging

    import ray.data as rd

    rng = np.random.default_rng(9)
    n, dim = 200, 32
    m = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(20):  # near-identical dups the LSH path must catch
        m[100 + i] = m[i] + rng.standard_normal(dim).astype(np.float32) * 0.01
    df = pd.DataFrame({"vec_id": range(n),
                       "embedding": [v.tolist() for v in m]})
    with caplog.at_level(logging.WARNING,
                         logger="open_thoughts_ray.ops.similarity"):
        out = cosine_dedup_earlier(rd.from_pandas(df), threshold=0.95,
                                   max_exact_rows=50).to_pandas()
    assert any("routing to cosine_dedup_lsh" in r.message for r in caplog.records)
    assert set(out.vec_id) == _brute_force_survivors(m, 0.95)
    # and max_exact_rows=None forces the exact path (no warning)
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="open_thoughts_ray.ops.similarity"):
        out2 = cosine_dedup_earlier(rd.from_pandas(df), threshold=0.95,
                                    max_exact_rows=None).to_pandas()
    assert not any("routing" in r.message for r in caplog.records)
    assert set(out2.vec_id) == set(out.vec_id)
