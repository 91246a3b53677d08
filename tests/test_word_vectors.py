"""Word-vector interchange formats (word2vec .vec / GloVe) and the
mean-pool embedder built on them (models/word_vectors.py).

Reference seam: engine/operators/embedding_operator.py:106-128 loads a
pretrained model by name; here the pretrained artifact is a real
public-format vector file.
"""

from __future__ import annotations

import numpy as np
import pytest

from open_thoughts_ray.models.word_vectors import (WordVecEmbedder,
                                                   WordVectors,
                                                   load_word_vectors,
                                                   save_word2vec_text)

TOKENS = ["the", "cat", "sat", "mat", "dog", "Über"]


@pytest.fixture()
def vec_file(tmp_path):
    rng = np.random.default_rng(42)
    m = rng.standard_normal((len(TOKENS), 8)).astype(np.float32)
    p = tmp_path / "toy.vec"
    save_word2vec_text(str(p), TOKENS, m)
    return str(p), m


def test_word2vec_roundtrip(vec_file):
    path, m = vec_file
    wv = load_word_vectors(path)
    assert wv.dim == 8 and wv.n_words == len(TOKENS)
    rows, found = wv.lookup(TOKENS)
    assert found.all()
    # %.5g text serialization: agreement to ~1e-4 relative
    np.testing.assert_allclose(wv.vectors[rows], m, rtol=2e-4, atol=2e-4)
    _, nf = wv.lookup(["missing", "words"])
    assert not nf.any()


def test_glove_headerless(tmp_path, vec_file):
    path, m = vec_file
    # strip the header → GloVe format; sniffing must still parse it
    lines = open(path).read().splitlines()[1:]
    g = tmp_path / "toy.glove.txt"
    g.write_text("\n".join(lines) + "\n")
    wv = load_word_vectors(str(g))
    assert wv.n_words == len(TOKENS) and wv.dim == 8
    rows, found = wv.lookup(TOKENS)
    assert found.all()


def test_trailing_space_and_dup_first_wins(tmp_path):
    # fastText .vec emits trailing spaces; duplicate token keeps FIRST
    p = tmp_path / "t.vec"
    p.write_text("3 2\na 1 2 \na 9 9\nb 3 4\n")
    wv = load_word_vectors(str(p))
    rows, found = wv.lookup(["a", "b"])
    assert found.all()
    np.testing.assert_allclose(wv.vectors[rows], [[1, 2], [3, 4]])


def test_inconsistent_dim_raises(tmp_path):
    p = tmp_path / "bad.vec"
    p.write_text("2 3\na 1 2 3\nb 1 2\n")
    with pytest.raises(ValueError, match="inconsistent dim"):
        load_word_vectors(str(p))


def test_embedder_mean_pool_and_l2(vec_file):
    path, _ = vec_file
    e = WordVecEmbedder(path, oov_scale=0.0)
    wv = e.wv
    out = e._encode(["the cat", "dog", ""])
    # row 0 = normalized mean of the two vectors
    rows, _ = wv.lookup(["the", "cat"])
    ref = wv.vectors[rows].mean(axis=0)
    ref /= np.linalg.norm(ref)
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out[:2], axis=1), 1.0,
                               rtol=1e-5)
    # empty text → zero vector (no tokens, no fake norm)
    assert np.allclose(out[2], 0.0)


def test_embedder_oov_deterministic(vec_file):
    path, _ = vec_file
    a = WordVecEmbedder(path)._encode(["zzz unknown cat"])
    b = WordVecEmbedder(path)._encode(["zzz unknown cat"])
    np.testing.assert_array_equal(a, b)
    # OOV-only text still yields a unit vector (hash fallback)
    c = WordVecEmbedder(path)._encode(["qqqq"])
    assert abs(np.linalg.norm(c[0]) - 1.0) < 1e-5


def test_embedder_batch_invariance(vec_file):
    """Pooling is per-row: encoding rows together or alone is
    identical (actor batch size can never change results)."""
    path, _ = vec_file
    e = WordVecEmbedder(path)
    texts = ["the cat sat", "dog Über mat", "novel words here", "cat"]
    joint = e._encode(texts)
    solo = np.vstack([e._encode([t]) for t in texts])
    np.testing.assert_allclose(joint, solo, rtol=1e-6, atol=1e-7)


def test_yaml_embedding_vec_path(ray_session, tmp_path, vec_file):
    """yaml `embedding` with vec_path drives the pretrained-file path
    end-to-end; output schema matches the stand-in embedder's."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    path, _ = vec_file
    df = pd.DataFrame({"text": ["the cat sat on the mat",
                                "dog dog dog", "völlig unbekannt"]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "in.parquet"))
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "in.parquet")}},
        {"id": "emb", "config": {"type": "embedding",
                                 "input_column": "text",
                                 "vec_path": path}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 3
    emb = np.vstack([np.asarray(v, np.float32) for v in out.embedding])
    assert emb.shape == (3, 8)
    e = WordVecEmbedder(path)
    np.testing.assert_allclose(
        emb, e._encode(list(df.text)), rtol=1e-5, atol=1e-6)
