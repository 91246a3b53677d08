import pandas as pd

from open_thoughts_ray.ops.bpe import (
    bpe_encode,
    bpe_token_count_batch,
    merges_from_word_counts,
    train_bpe,
)


def test_merge_loop_classic_example():
    # Sennrich et al. running example: 'es' then 'est' dominate
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = merges_from_word_counts(counts, 4)
    assert merges[0] == ("e", "s")          # 9 occurrences
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", "</w>")     # 9
    assert ("l", "o") in merges[:4]         # 7


def test_encode_applies_merges_in_order():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = merges_from_word_counts(counts, 10)
    toks = bpe_encode("newest", merges)
    assert "".join(toks) == "newest</w>"
    assert len(toks) < len("newest") + 1    # merges actually applied
    # unseen word falls back to finer pieces but round-trips
    assert "".join(bpe_encode("slowest", merges)) == "slowest</w>"


def test_train_bpe_distributed_matches_serial(ray_session):
    import ray.data as rd

    from collections import Counter

    texts = ["low low low lower", "newest widest newest",
             "newest newest widest lower low"]
    df = pd.DataFrame({"text": texts})
    dist = train_bpe(rd.from_pandas(df).repartition(3), num_merges=6)
    counts = Counter(w for t in texts for w in t.split(" "))
    serial = merges_from_word_counts(dict(counts), 6)
    assert dist == serial
    # partitioning invariance
    dist2 = train_bpe(rd.from_pandas(df.sample(frac=1.0, random_state=7)),
                      num_merges=6)
    assert dist2 == serial


def test_bpe_token_count_batch(ray_session):
    import pyarrow as pa

    counts = {"aaaa": 10, "aab": 5}
    merges = merges_from_word_counts(counts, 3)
    batch = pa.table({"text": ["aaaa aab", ""]})
    out = bpe_token_count_batch(batch, merges)
    n = out.column("n_bpe_tokens").to_pylist()
    assert n[1] == 0 and n[0] >= 2
