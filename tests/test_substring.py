"""Exact duplicated-substring scrub (ops/substring.py) vs a brute-force
in-memory oracle, both rewrite paths (broadcast and distributed)."""

import numpy as np
import pandas as pd
import pytest
import ray

from open_thoughts_ray.ops.substring import (
    _covered_mask,
    doc_kgrams,
    exact_substring_scrub,
    flag_dup_substring_docs,
)


def brute_scrub(docs: dict[str, str], k: int, min_docs: int = 2):
    """Reference semantics: token removed iff covered by a k-gram that
    occurs in >= min_docs distinct documents."""
    from collections import Counter

    df = Counter()
    for t in docs.values():
        df.update(set(doc_kgrams(t, k)))
    dup = {g for g, c in df.items() if c >= min_docs}
    out = {}
    for i, t in docs.items():
        toks = t.split(" ")
        grams = doc_kgrams(t, k)
        covered = [False] * len(toks)
        for p, g in enumerate(grams):
            if g in dup:
                for j in range(p, p + k):
                    covered[j] = True
        clean = " ".join(tok for tok, c in zip(toks, covered) if not c)
        out[i] = (clean, sum(covered))
    return out


DOCS = {
    "a": "the quick brown fox jumps over the lazy dog tonight",
    "b": "something quick brown fox jumps over the moon instead here",
    "c": "completely unrelated text about distributed data processing engines",
    "d": "the quick brown fox jumps over the lazy dog tonight",  # exact dup of a
    "e": "short doc",  # shorter than k -> untouched
    "f": "",  # empty -> untouched
    "g": "rep rep rep rep rep rep rep rep rep rep",  # within-doc repeats only
}


def _run(k=5, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(DOCS), "text": list(DOCS.values())}))
    got = exact_substring_scrub(ds, k=k, **kw).to_pandas()
    return {r.doc_id: (r.clean_text, r.n_removed)
            for r in got.itertuples()}


def test_covered_mask_diff_trick():
    # starts 0 and 3 with k=2 over 6 tokens -> tokens 0,1,3,4 covered
    m = _covered_mask(6, 2, [0, 3])
    assert m.tolist() == [True, True, False, True, True, False]
    assert _covered_mask(4, 3, []).tolist() == [False] * 4
    # window clipped at the end
    assert _covered_mask(3, 5, [0]).tolist() == [True, True, True]


def test_scrub_matches_bruteforce_broadcast():
    want = brute_scrub(DOCS, k=5)
    got = _run(k=5)
    assert got == want
    # exact dup pair scrubbed to empty, uniques untouched
    assert got["a"][0] == "" and got["d"][0] == ""
    assert got["c"] == (DOCS["c"], 0)
    assert got["e"] == ("short doc", 0)
    assert got["f"] == ("", 0)
    # within-doc repetition is NOT cross-document duplication
    assert got["g"] == (DOCS["g"], 0)


def test_scrub_partial_span():
    # a and b share exactly "quick brown fox jumps over the" (6 tokens);
    # with k=5 the two 5-gram windows inside it are duplicated in both
    want = brute_scrub(DOCS, k=5)
    assert want["b"][1] == 6  # the shared 6-token span, nothing else
    assert want["b"][0] == "something moon instead here"
    got = _run(k=5)
    assert got["b"] == want["b"]


def test_scrub_distributed_path_matches():
    want = brute_scrub(DOCS, k=5)
    got = _run(k=5, max_driver_grams=0)  # force explode/join path
    assert got == want


def test_flag_docs_both_paths():
    want = {i for i, (c, n) in brute_scrub(DOCS, k=5).items() if n > 0}
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(DOCS), "text": list(DOCS.values())}))
    got_b = set(flag_dup_substring_docs(ds, k=5).to_pandas()["doc_id"])
    got_d = set(flag_dup_substring_docs(
        ds, k=5, max_driver_grams=0).to_pandas()["doc_id"])
    assert got_b == want == got_d


def test_min_docs_threshold():
    # min_docs=3: only grams shared by a, b AND d (the "quick brown fox
    # jumps over [the]" span) stay duplicated; the rest of a/d survives
    want = brute_scrub(DOCS, k=5, min_docs=3)
    got = _run(k=5, min_docs=3)
    assert got == want
    assert got["c"][1] == 0 and got["g"][1] == 0
    assert 0 < got["a"][1] < len(DOCS["a"].split(" "))


@pytest.mark.parametrize("k", [2, 3, 8])
def test_scrub_random_corpus_property(k):
    rng = np.random.default_rng(k)
    vocab = [f"w{i}" for i in range(12)]
    docs = {f"d{i}": " ".join(rng.choice(vocab, rng.integers(0, 20)))
            for i in range(40)}
    want = brute_scrub(docs, k=k)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in exact_substring_scrub(ds, k=k).to_pandas().itertuples()}
    assert got == want
