"""Real fastText ``.bin`` format: parser, writer, inference, node cache.

Validates the from-scratch implementation of the public fastText file
format and prediction math (facebookresearch/fastText src/fasttext.cc,
src/dictionary.cc, src/loss.cc) that stands in for the reference's
``fasttext.load_model`` path (fasttext_operator.py:193-281).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pytest

from open_thoughts_ray.models import fasttext_bin as fb
from open_thoughts_ray.models.fasttext_bin import (
    ENTRY_LABEL, ENTRY_WORD, LOSS_HS, LOSS_NS, LOSS_OVA, LOSS_SOFTMAX,
    FastTextArgs, FastTextModel, ft_hash)


# --------------------------------------------------------------- hashing


def test_hash_matches_fnv1a_on_ascii():
    # fastText's hash IS FNV-1a-32 for ASCII input (sign extension is a
    # no-op below 0x80); 0x4F9F2CAB is the published FNV-1a("hello")
    assert ft_hash("hello") == 0x4F9F2CAB
    assert ft_hash("") == 2166136261


def test_hash_sign_extends_high_bytes():
    # bytes >= 0x80 go through uint32_t(int8_t(ch)) — NOT plain FNV-1a
    h = 2166136261
    for b in "é".encode():
        if b >= 128:
            b |= 0xFFFFFF00
        h = (h ^ b) * 16777619 & 0xFFFFFFFF
    assert ft_hash("é") == h
    # and differs from the unsigned-byte FNV-1a
    h2 = 2166136261
    for b in "é".encode():
        h2 = (h2 ^ b) * 16777619 & 0xFFFFFFFF
    assert ft_hash("é") != h2


# -------------------------------------------------------------- subwords


def test_subwords_exact_set_ascii():
    # "<ab>" with minn=2 maxn=3: <a <ab ab ab> b>  (1-char BOW/EOW excluded)
    grams = ["<a", "<ab", "ab", "ab>", "b>"]
    want = [10 + ft_hash(g) % 100 for g in grams]
    assert fb._subword_ngrams("ab", 2, 3, 100, 10) == want


def test_subwords_utf8_character_boundaries():
    # continuation bytes glue to their lead byte: "é" is ONE character
    out = fb._subword_ngrams("é", 2, 2, 1000, 0)
    grams = ["<é", "é>"]
    assert out == [ft_hash(g) % 1000 for g in grams]


def test_subwords_maxn_zero_is_empty():
    assert fb._subword_ngrams("hello", 0, 0, 100, 0) == []


# ------------------------------------------------------------ word-ngrams


def test_word_ngram_hash_sign_extension():
    # h values stored as int32_t sign-extend when widened to uint64
    h1, h2 = ft_hash("aé"), ft_hash("bè")  # force a high-bit hash via utf8
    out = fb._word_ngram_ids([h1, h2], 2, 1000, 5)
    h1s = (h1 | 0xFFFFFFFF00000000) if h1 & 0x80000000 else h1
    h2s = (h2 | 0xFFFFFFFF00000000) if h2 & 0x80000000 else h2
    want = 5 + ((h1s * 116049371 + h2s) & ((1 << 64) - 1)) % 1000
    assert out == [want]


# ------------------------------------------------------------- round-trip


def _tiny_model(loss=LOSS_SOFTMAX, word_ngrams=1, minn=0, maxn=0, bucket=64,
                dim=6, seed=0):
    rng = np.random.default_rng(seed)
    words = ["</s>", "alpha", "beta", "gamma",
             "__label__x", "__label__y", "__label__z"]
    counts = np.array([90, 50, 40, 30, 12, 8, 5], dtype=np.int64)
    types = np.array([0, 0, 0, 0, 1, 1, 1], dtype=np.int8)
    args = FastTextArgs(dim=dim, bucket=bucket, word_ngrams=word_ngrams,
                        minn=minn, maxn=maxn, loss=loss)
    inp = rng.standard_normal((4 + bucket, dim)).astype(np.float32)
    out = rng.standard_normal((3, dim)).astype(np.float32)
    return FastTextModel(args, words, counts, types, 777, inp, out)


def test_roundtrip_write_load(tmp_path):
    m = _tiny_model(word_ngrams=2, minn=2, maxn=3)
    p = str(tmp_path / "m.bin")
    fb.write_bin(p, m)
    m2 = fb.load_bin(p)
    assert m2.words == m.words
    assert m2.args == m.args
    assert m2.ntokens == m.ntokens
    assert np.array_equal(m2.counts, m.counts)
    assert np.array_equal(m2.types, m.types)
    assert np.array_equal(m2.input, m.input)
    assert np.array_equal(m2.output, m.output)
    # identical predictions through the file
    labs1, p1 = m.predict_batch(["alpha beta zzz", "é unknown"], k=3)
    labs2, p2 = m2.predict_batch(["alpha beta zzz", "é unknown"], k=3)
    assert labs1 == labs2
    np.testing.assert_array_equal(p1, p2)


def test_load_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.bin")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        fb.load_bin(p)


def test_quantized_flag_is_the_documented_seam(tmp_path):
    m = _tiny_model()
    p = str(tmp_path / "m.bin")
    fb.write_bin(p, m)
    data = bytearray(open(p, "rb").read())
    # quant flag byte sits right after the dictionary block
    qoff = data.index(b"__label__z\x00") + len("__label__z") + 1 + 9
    assert data[qoff] == 0
    data[qoff] = 1
    open(p, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="quantized"):
        fb.load_bin(p)


# -------------------------------------------------------------- inference


def test_softmax_prediction_matches_manual():
    m = _tiny_model()
    text = "alpha beta"
    # ids: alpha=1, beta=2, EOS=0  (maxn=0 -> no subwords)
    hid = m.input[[1, 2, 0]].mean(axis=0)
    scores = m.output @ hid
    p = np.exp(scores - scores.max())
    p /= p.sum()
    labs, probs = m.predict_batch([text], k=3)
    order = np.argsort(-p, kind="stable")
    assert labs[0] == [m.labels[i] for i in order]
    np.testing.assert_allclose(probs[0], p[order], rtol=1e-5)


def test_oov_uses_subword_buckets():
    m = _tiny_model(minn=2, maxn=3)
    ids = m._line_ids("zzzz")
    want = fb._subword_ngrams("zzzz", 2, 3, m.args.bucket, 4) + [0]  # + EOS
    assert sorted(ids) == sorted(want)


def test_invocab_word_adds_subwords_when_maxn_positive():
    m = _tiny_model(minn=2, maxn=3)
    ids = m._line_ids("alpha")
    want = [1] + fb._subword_ngrams("alpha", 2, 3, m.args.bucket, 4) + [0]
    assert sorted(ids) == sorted(want)
    # EOS itself never gets subwords (dictionary.cc initNgrams EOS guard)
    assert m._line_ids("") == [0]


def test_word_ngrams_extend_line():
    m1 = _tiny_model(word_ngrams=1)
    m2 = _tiny_model(word_ngrams=2)
    base = m1._line_ids("alpha beta")
    ext = m2._line_ids("alpha beta")
    # bigrams over (alpha, beta, </s>) word hashes -> 2 extra bucket ids
    assert len(ext) == len(base) + 2
    assert ext[: len(base)] == base


def test_binary_heads_sigmoid():
    for loss in (LOSS_NS, LOSS_OVA):
        m = _tiny_model(loss=loss)
        hid = m.input[[1, 0]].mean(axis=0)
        p = 1.0 / (1.0 + np.exp(-(m.output @ hid)))
        labs, probs = m.predict_batch(["alpha"], k=1)
        i = int(np.argmax(p))
        assert labs[0][0] == m.labels[i]
        assert probs[0][0] == pytest.approx(p[i], rel=1e-5)


def test_hierarchical_softmax_probs_sum_to_one():
    m = _tiny_model(loss=LOSS_HS)
    labs, probs = m.predict_batch(["alpha beta", "gamma"], k=3)
    for row in probs:
        assert row.sum() == pytest.approx(1.0, abs=1e-5)
    # top-1 equals exhaustive leaf enumeration via root-path walk
    tree = m._tree()
    hid = m.input[[1, 2, 0]].mean(axis=0)
    best, best_lp = None, -1e30
    for leaf in range(m.nlabels):
        lp, node = 0.0, leaf
        while tree[node][0] != -1:
            parent = tree[node][0]
            f = 1.0 / (1.0 + math.exp(-float(m.output[parent - m.nlabels] @ hid)))
            lp += math.log(f if tree[node][4] else 1.0 - f)
            node = parent
        if lp > best_lp:
            best, best_lp = leaf, lp
    assert labs[0][0] == m.labels[best]


def test_huffman_tree_structure():
    m = _tiny_model(loss=LOSS_HS)
    tree = m._tree()
    osz = m.nlabels
    assert len(tree) == 2 * osz - 1
    root = 2 * osz - 2
    assert tree[root][0] == -1
    assert tree[root][3] == sum(int(c) for c in m.counts[m.nwords:])
    # every leaf reachable from the root
    seen = set()
    stack = [root]
    while stack:
        n = stack.pop()
        if tree[n][1] == -1:
            seen.add(n)
        else:
            stack.extend([tree[n][1], tree[n][2]])
    assert seen == set(range(osz))


# --------------------------------------------------- real-format artifact


def test_langid_bin_artifact_accuracy():
    from open_thoughts_ray.fixtures.textgen import langid_corpus
    from open_thoughts_ray.models import artifacts

    m = fb.load_bin(artifacts.langid_bin_path())
    assert m.args.maxn > 0  # subword model: generalizes to OOV words
    texts, labels = langid_corpus(n_per_lang=200, seed=999)
    labs, _ = m.predict_batch(texts, k=1)
    pred = [t[0][len("__label__"):] if t else "" for t in labs]
    acc = np.mean([p == l for p, l in zip(pred, labels)])
    assert acc >= 0.97


def test_langid_scorer_bin_source_parity():
    from open_thoughts_ray.fixtures.textgen import langid_corpus
    from open_thoughts_ray.models import artifacts
    from open_thoughts_ray.ops.langid import LangIdScorer

    path = artifacts.langid_bin_path()
    texts, labels = langid_corpus(n_per_lang=20, seed=31)
    s = LangIdScorer(bin_source=path, text_column="t")
    out = s(pa.table({"t": texts}))
    assert out.column("lang").to_pylist() == labels  # NB is exact here
    confs = out.column("lang_conf").to_pylist()
    assert all(0.0 <= c <= 1.0 for c in confs)


# -------------------------------------------------------------- node cache


def _fetch_worker(args):
    src, cache = args
    from open_thoughts_ray.models.fasttext_bin import cached_model_file

    p = cached_model_file(src, cache_dir=cache)
    return p, os.path.getsize(p)


def test_node_cache_concurrent_single_copy(tmp_path):
    import multiprocessing as mp

    src = str(tmp_path / "src.bin")
    fb.write_bin(src, _tiny_model())
    size = os.path.getsize(src)
    cache = str(tmp_path / "cache")
    with mp.get_context("spawn").Pool(4) as pool:
        results = pool.map(_fetch_worker, [(src, cache)] * 4)
    paths = {p for p, _ in results}
    assert len(paths) == 1
    assert all(s == size for _, s in results)
    model_dir = os.path.dirname(paths.pop())
    assert os.path.exists(os.path.join(model_dir, "SUCCESS"))
    # cached file loads and predicts
    m = fb.load_bin_cached(src, cache_dir=cache)
    assert m.nlabels == 3


def test_node_cache_hit_skips_copy(tmp_path):
    src = str(tmp_path / "src.bin")
    fb.write_bin(src, _tiny_model())
    cache = str(tmp_path / "cache")
    p1 = fb.cached_model_file(src, cache_dir=cache)
    os.unlink(src)  # source gone — second call must hit the cache
    p2 = fb.cached_model_file(src, cache_dir=cache)
    assert p1 == p2 and os.path.exists(p2)
