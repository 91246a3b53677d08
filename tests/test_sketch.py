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


def test_approx_distinct_md5_matches_sql_reconstruction(ray_session):
    """The md5 hasher must make the whole sketch bit-reproducible in
    DuckDB: same registers, same estimate, down to the rounded int."""
    import duckdb
    import ray.data as rd

    df = pd.DataFrame({"k": [i % 700 for i in range(5000)]})
    est = approx_distinct(rd.from_pandas(df), "k", hasher="md5")

    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("""
        WITH h AS (
            SELECT CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)),1,16))
                   AS UBIGINT) AS hv FROM t
        ),
        reg AS (
            SELECT hv >> 52 AS idx,
                   MAX(CASE WHEN (hv & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
                        ELSE 53 - length(bin(hv & ((1::UBIGINT << 52) - 1)))
                       END) AS rho
            FROM h GROUP BY idx
        ),
        s AS (SELECT count(*) AS nreg, sum(power(2.0, -rho)) AS sp FROM reg),
        est AS (
            SELECT (0.7213/(1+1.079/4096.0))*4096.0*4096.0
                     / ((4096-nreg)*1.0 + sp) AS raw,
                   (4096-nreg) AS zeros FROM s
        )
        SELECT CASE WHEN raw <= 2.5*4096 AND zeros > 0
               THEN 4096.0*ln(4096.0/zeros) ELSE raw END FROM est
    """).fetchall()[0][0]
    assert round(est) == round(want)
    assert abs(est - 700) / 700 < 0.05


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


def test_approx_top_k_exact_when_wide(ray_session):
    """With partial_width >= batch cardinality the sketch is exact and
    the error bound is 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.sketch import approx_top_k

    rng = np.random.default_rng(3)
    # zipf-ish: item i appears ~ 1000/(i+1) times
    vals = [f"v{i}" for i in range(40) for _ in range(1000 // (i + 1))]
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    items, bound = approx_top_k(ds, "v", k=5, partial_width=64)
    assert bound == 0
    assert [i for i, _ in items] == ["v0", "v1", "v2", "v3", "v4"]
    assert items[0][1] == 1000


def test_approx_top_k_bound_and_heavy_hitter_guarantee(ray_session):
    """Narrow partials: reported counts are lower bounds within the
    reported max_underestimate, and the dominant item is present."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.sketch import approx_top_k

    rng = np.random.default_rng(4)
    vals = ["heavy"] * 3000 + [f"t{i}" for i in range(2000)] * 2
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    items, bound = approx_top_k(ds, "v", k=3, partial_width=32)
    top = dict(items)
    assert "heavy" in top
    assert top["heavy"] <= 3000  # lower bound never overestimates
    assert 3000 - top["heavy"] <= bound


def test_approx_top_k_weighted(ray_session):
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.sketch import approx_top_k

    df = pd.DataFrame({"item": ["a", "b", "a", "c"],
                       "w": [10, 5, 7, 1]})
    items, bound = approx_top_k(rd.from_pandas(df), "item", k=2,
                                partial_width=16, weight_col="w")
    assert items == [("a", 17), ("b", 5)]
    assert bound == 0
