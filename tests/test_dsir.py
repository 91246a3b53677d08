"""DSIR importance selection (ops/dsir.py) vs a brute-force in-memory
replay of the same hashed-n-gram likelihood-ratio rule."""

import hashlib
import math

import pandas as pd
import pytest
import ray

from open_thoughts_ray.ops.dsir import (
    _bucket,
    _features,
    dsir_select,
    dsir_weight_table,
    hashed_ngram_counts,
)

B = 512


def brute_select(raw: dict[str, str], target: dict[str, str], k: int):
    """(ordered ids, scores) under the exact documented rule."""
    def counts(docs):
        c = [0] * B
        for t in docs.values():
            for f in _features(t):
                c[_bucket(f, B)] += 1
        return c, sum(c)

    tc, nt = counts(target)
    rc, nr = counts(raw)
    w = [math.floor(1e6 * math.log(float((tc[b] + 1) * (nr + B))
                                   / float((rc[b] + 1) * (nt + B))))
         for b in range(B)]
    scores = {i: sum(w[_bucket(f, B)] for f in _features(t))
              for i, t in raw.items()}
    ordered = sorted(scores, key=lambda i: (-scores[i], i))[:k]
    return ordered, scores


RAW = {
    "a": "the cat sat on the mat",
    "b": "le chat est sur le tapis rouge",
    "c": "the dog sat on the log by the fire",
    "d": "der hund sitzt auf dem baum",
    "e": "a cat and a dog sat together on the mat",
    "f": "",
    "g": "short",
}
TARGET = {
    "t1": "the cat sat on the mat today",
    "t2": "the dog sat on the rug",
}


def _ds(docs):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))


def test_features_and_bucket():
    assert _features("a b c") == ["a", "b", "c", "a b", "b c"]
    assert _features("") == [""]
    assert _features("solo") == ["solo"]
    want = int(hashlib.md5(b"a b").hexdigest()[:8], 16) % B
    assert _bucket("a b", B) == want


def test_hashed_ngram_counts_matches_serial():
    got, n = hashed_ngram_counts(_ds(RAW), buckets=B)
    want = [0] * B
    for t in RAW.values():
        for f in _features(t):
            want[_bucket(f, B)] += 1
    assert got.tolist() == want
    assert n == sum(want)


def test_weight_table_direction():
    # a bucket frequent in target but rare in raw gets a positive
    # weight; the reverse gets a negative one
    import numpy as np

    tc = np.zeros(4, dtype=int)
    rc = np.zeros(4, dtype=int)
    tc[0], rc[1] = 100, 100
    w = dsir_weight_table(tc, 100, rc, 100)
    assert w[0] > 0 > w[1]
    # symmetric counts → identical weights
    assert w[2] == w[3]


def test_select_matches_bruteforce():
    ordered, scores = brute_select(RAW, TARGET, k=4)
    got = dsir_select(_ds(RAW), _ds(TARGET), k=4, buckets=B).to_pandas()
    assert list(got["doc_id"]) == ordered
    assert [scores[i] for i in got["doc_id"]] == list(got["dsir_score"])
    # target-like English docs outrank equally-long foreign docs (note
    # DSIR's known length artifact: near-empty docs score ~0, which can
    # beat NEGATIVE-scoring mismatched docs — so compare like-for-like)
    assert scores["a"] > scores["b"]
    assert scores["c"] > scores["d"]


def test_select_all_rows_is_total_order():
    ordered, scores = brute_select(RAW, TARGET, k=len(RAW))
    got = dsir_select(_ds(RAW), _ds(TARGET), k=len(RAW), buckets=B).to_pandas()
    assert list(got["doc_id"]) == ordered


def test_gumbel_variant_deterministic_and_distinct():
    a = dsir_select(_ds(RAW), _ds(TARGET), k=3, buckets=B,
                    gumbel_seed=7).to_pandas()
    b = dsir_select(_ds(RAW), _ds(TARGET), k=3, buckets=B,
                    gumbel_seed=7).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    c = dsir_select(_ds(RAW), _ds(TARGET), k=3, buckets=B,
                    gumbel_seed=8).to_pandas()
    assert set(a.columns) == {"doc_id", "dsir_score"}
    # different seeds shouldn't always pick the same set (weak check:
    # allow equality of sets but not of full orderings for BOTH seeds)
    assert (list(a["doc_id"]) != list(c["doc_id"])
            or set(a["doc_id"]) == set(c["doc_id"]))


@pytest.mark.parametrize("nraw,ntarget", [(60, 10), (25, 25)])
def test_select_random_corpus_property(nraw, ntarget):
    import numpy as np

    rng = np.random.default_rng(nraw)
    vocab_en = [f"en{i}" for i in range(15)]
    vocab_xx = [f"xx{i}" for i in range(15)]
    raw = {}
    for i in range(nraw):
        v = vocab_en if i % 2 == 0 else vocab_xx
        raw[f"d{i:03d}"] = " ".join(rng.choice(v, rng.integers(1, 30)))
    target = {f"t{i}": " ".join(rng.choice(vocab_en, rng.integers(5, 30)))
              for i in range(ntarget)}
    ordered, scores = brute_select(raw, target, k=10)
    got = dsir_select(_ds(raw), _ds(target), k=10, buckets=B).to_pandas()
    assert list(got["doc_id"]) == ordered
    # the selected half must be dominated by the en-vocab docs
    en_ids = {i for i in raw if int(i[1:]) % 2 == 0}
    assert len(set(got["doc_id"]) & en_ids) >= 8
