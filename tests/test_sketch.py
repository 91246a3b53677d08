import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.sketch import BloomFilter, HyperLogLog, approx_distinct, bloom_semi_join


def test_hll_accuracy_direct():
    for n in (100, 5000, 50000):
        hll = HyperLogLog(p=12)
        from open_thoughts_ray.ops.sketch import _hash_values

        hll.add_hashes(_hash_values([f"key-{i}" for i in range(n)]))
        est = hll.estimate()
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    from open_thoughts_ray.ops.sketch import _hash_values

    a, b = HyperLogLog(), HyperLogLog()
    a.add_hashes(_hash_values([f"x{i}" for i in range(1000)]))
    b.add_hashes(_hash_values([f"x{i}" for i in range(500, 1500)]))
    u = HyperLogLog()
    u.add_hashes(_hash_values([f"x{i}" for i in range(1500)]))
    assert a.merge(b).estimate() == u.estimate()


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    n_distinct = 3000
    df = pd.DataFrame({"k": [f"key-{i % n_distinct}" for i in range(12000)]})
    est = approx_distinct(rd.from_pandas(df), "k")
    assert abs(est - n_distinct) / n_distinct < 0.05


def test_bloom_no_false_negatives():
    bf = BloomFilter(n_bits=1 << 16)
    keys = [f"k{i}" for i in range(2000)]
    bf.add(keys)
    assert bf.contains(keys).all()
    fp = bf.contains([f"other{i}" for i in range(2000)]).mean()
    assert fp < 0.05


def test_bloom_semi_join(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(1000), "k": [f"k{i}" for i in range(1000)]})
    keys = [f"k{i}" for i in range(0, 1000, 10)]
    semi = bloom_semi_join(rd.from_pandas(df), keys, "k").to_pandas()
    assert set(range(0, 1000, 10)).issubset(set(semi.doc_id))  # no false negatives
    anti = bloom_semi_join(rd.from_pandas(df), keys, "k", anti=True).to_pandas()
    assert set(anti.doc_id).isdisjoint(set(range(0, 1000, 10)))
