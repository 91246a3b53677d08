"""Indel-ratio (fuzz.ratio) kernel, fuzzy dedup, fuzzy decontamination."""

import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.fuzzy import (
    decontaminate_fuzzy_ratio,
    fuzzy_dedup,
    indel_ratio,
    lcs_length,
)


def _lcs_naive(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i, ca in enumerate(a):
        for j, cb in enumerate(b):
            dp[i + 1][j + 1] = max(dp[i][j + 1], dp[i + 1][j],
                                   dp[i][j] + (ca == cb))
    return dp[-1][-1]


def test_lcs_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(30):
        a = "".join(rng.choice(list("abcde"), rng.integers(0, 30)))
        b = "".join(rng.choice(list("abcde"), rng.integers(0, 30)))
        assert lcs_length(a, b) == _lcs_naive(a, b), (a, b)


def test_indel_ratio_reference_values():
    # rapidfuzz.fuzz.ratio ground truths
    assert indel_ratio("abc", "abc") == 100.0
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("abc", "xyz") == 0.0
    # fuzz.ratio("kitten","sitting") = 2*4/13*100 ≈ 61.538
    assert abs(indel_ratio("kitten", "sitting") - 100 * 2 * 4 / 13) < 1e-9
    assert indel_ratio("hello world", "hello wrld") == pytest.approx(
        100 * 2 * 10 / 21)


def test_fuzzy_dedup_collapses_near_identical(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank on a sunny day in july with friends")
    rows = []
    rng = np.random.default_rng(9)
    words = ["alpha", "bridge", "copper", "delta", "ember", "falcon",
             "granite", "harbor", "indigo", "jasper", "kelp", "lumen",
             "meadow", "nectar", "onyx", "prism", "quartz", "raven",
             "sable", "tundra"]
    for i in range(30):
        text = " ".join(rng.choice(words, 12, replace=True)) + f" {i}"
        rows.append({"doc_id": f"u{i:03d}", "text": text})
    rows.append({"doc_id": "a01", "text": base})
    rows.append({"doc_id": "a02", "text": base.replace("sunny", "rainy")})
    rows.append({"doc_id": "a03", "text": base + " extra"})
    out = fuzzy_dedup(rd.from_pandas(pd.DataFrame(rows)),
                      ratio_threshold=85.0).to_pandas()
    ids = set(out.doc_id)
    assert "a01" in ids and "a02" not in ids and "a03" not in ids
    assert len(ids) == 31


def test_decontaminate_fuzzy_ratio(ray_session):
    import ray.data as rd

    bench = ["what is the capital of france and why does it matter to "
             "european history students today"]
    rows = [
        {"doc_id": 1, "text": "What is the capital of France and why does "
                              "it matter to European history students now"},
        {"doc_id": 2, "text": "a completely unrelated document about "
                              "cooking pasta with tomatoes and basil"},
    ]
    out = decontaminate_fuzzy_ratio(
        rd.from_pandas(pd.DataFrame(rows)), bench, ratio_threshold=85.0,
        ngram_n=5,
    ).to_pandas()
    assert list(out.doc_id) == [2]
    ann = decontaminate_fuzzy_ratio(
        rd.from_pandas(pd.DataFrame(rows)), bench, ratio_threshold=85.0,
        ngram_n=5, mode="annotate",
    ).to_pandas().sort_values("doc_id")
    assert ann.contaminated.tolist() == [True, False]
