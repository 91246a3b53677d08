"""Distributed pair verification, exact n-gram-Jaccard dedup, and the
driver/distributed dedup path switch (VERDICT r2 #1/#2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _dup_heavy_corpus(n=200, dup_frac=0.95, seed=7):
    """Synthetic corpus where dup_frac of rows are near-copies of a few
    base docs (the adversarial 95%-duplicate crawl-shard shape)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    bases = [" ".join(rng.choice(words, 30)) for _ in range(5)]
    rows = []
    for i in range(n):
        if i < int(n * dup_frac):
            base = bases[i % len(bases)]
            toks = base.split()
            # light mutation: change one token
            j = int(rng.integers(0, len(toks)))
            toks[j] = f"m{i % 3}"
            rows.append({"doc_id": i, "text": " ".join(toks)})
        else:
            rows.append({"doc_id": i,
                         "text": " ".join(rng.choice(words, 30))})
    return pd.DataFrame(rows)


def test_minhash_distributed_path_matches_driver_path(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import minhash_lsh_dedup

    df = _dup_heavy_corpus()
    ds = rd.from_pandas(df)
    driver = minhash_lsh_dedup(rd.from_pandas(df), threshold=0.7,
                               num_partitions=4)
    dist = minhash_lsh_dedup(ds, threshold=0.7, num_partitions=4,
                             max_driver_pairs=0)  # force distributed
    a = sorted(driver.to_pandas()["doc_id"])
    b = sorted(dist.to_pandas()["doc_id"])
    assert a == b
    assert len(a) < len(df)  # the planted dups actually collapsed


def test_fuzzy_distributed_path_matches_driver_path(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.fuzzy import fuzzy_dedup

    df = _dup_heavy_corpus(n=120)
    driver = fuzzy_dedup(rd.from_pandas(df), ratio_threshold=90.0,
                         num_partitions=4)
    dist = fuzzy_dedup(rd.from_pandas(df), ratio_threshold=90.0,
                       num_partitions=4, max_driver_pairs=0)
    assert sorted(driver.to_pandas()["doc_id"]) == \
        sorted(dist.to_pandas()["doc_id"])


def test_simhash_distributed_path_matches_driver_path(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import simhash_dedup

    df = _dup_heavy_corpus(n=120)
    driver = simhash_dedup(rd.from_pandas(df), hamming_max=3,
                           num_partitions=4)
    dist = simhash_dedup(rd.from_pandas(df), hamming_max=3,
                         num_partitions=4, max_driver_edges=0)
    assert sorted(driver.to_pandas()["doc_id"]) == \
        sorted(dist.to_pandas()["doc_id"])


def test_ngram_jaccard_dedup_first_seen_semantics(ray_session):
    """Sequential NOT-EXISTS semantics vs a brute-force reference."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import ngram_jaccard, ngram_jaccard_dedup

    df = _dup_heavy_corpus(n=80, dup_frac=0.5)
    texts = dict(zip(df["doc_id"], df["text"]))
    expected = []
    for b in sorted(texts):
        if not any(ngram_jaccard(texts[a], texts[b], 3) >= 0.8
                   for a in sorted(texts) if a < b):
            expected.append(b)
    out = ngram_jaccard_dedup(rd.from_pandas(df), threshold=0.8,
                              num_partitions=4)
    assert sorted(out.to_pandas()["doc_id"]) == expected


def test_ngram_jaccard_dedup_large_dropset_anti_join(ray_session):
    """Forcing the anti-join path (max_driver_drops=0) gives identical
    survivors to the broadcast-set path."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import ngram_jaccard_dedup

    df = _dup_heavy_corpus(n=100)
    small = ngram_jaccard_dedup(rd.from_pandas(df), threshold=0.8,
                                num_partitions=4)
    big = ngram_jaccard_dedup(rd.from_pandas(df), threshold=0.8,
                              num_partitions=4, max_driver_drops=0)
    assert sorted(small.to_pandas()["doc_id"]) == \
        sorted(big.to_pandas()["doc_id"])


def test_anti_join_ids(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.pairverify import anti_join_ids

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4],
                                      "x": ["a", "b", "c", "d"]}))
    drop = rd.from_arrow(pa.table({"id": pa.array(["2", "4", "4"],
                                                  pa.string())}))
    out = anti_join_ids(ds, "doc_id", drop, num_partitions=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    assert sorted(out.columns) == ["doc_id", "x"]


def test_verify_pairs_distributed_kernel_runs_on_workers(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.pairverify import verify_pairs_distributed

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["aa bb", "aa bb", "zz yy"]}))
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(["1", "1"], pa.string()),
        "b": pa.array(["2", "3"], pa.string())}))

    def kernel(ta, tb):
        return np.asarray([x == y for x, y in zip(ta, tb)], dtype=bool)

    edges = verify_pairs_distributed(pairs, ds, "doc_id", "text", kernel,
                                     num_partitions=2).to_pandas()
    assert [(r.a, r.b) for r in edges.itertuples()] == [("1", "2")]


def test_empty_candidate_and_empty_edge_paths(ray_session):
    """Zero shared grams, zero verified edges, and an empty drop set must
    all return the input unchanged — Ray's empty hash-aggregator output
    is schema-less and would poison the downstream joins without the
    typed-empty guards."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import (
        minhash_lsh_dedup,
        ngram_jaccard_dedup,
    )
    from open_thoughts_ray.ops.fuzzy import fuzzy_dedup

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["aa bb cc dd ee ff gg",
                                "aa bb cc dd ee ff hh",
                                "zz yy xx ww vv uu tt"]})
    disjoint = pd.DataFrame({"doc_id": [1, 2, 3],
                             "text": ["aa bb cc dd", "ee ff gg hh",
                                      "ii jj kk ll"]})
    # no candidate pairs at all
    out = ngram_jaccard_dedup(rd.from_pandas(disjoint), threshold=0.5,
                              num_partitions=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    # candidates exist but verification rejects everything, on the
    # forced-distributed path (threshold > 1 is unreachable)
    out = minhash_lsh_dedup(rd.from_pandas(df), threshold=1.01,
                            num_partitions=2, max_driver_pairs=0).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    out = fuzzy_dedup(rd.from_pandas(df), ratio_threshold=101.0,
                      num_partitions=2, max_driver_pairs=0).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
