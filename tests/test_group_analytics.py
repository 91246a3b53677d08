"""argmax_per_group / grouped_median / pearson_corr / max_gap_per_key —
the window-function-shaped analytics added round 3 (SQL oracles live in
__ray_entry__.oracle_sql; these are the pure-op unit tests)."""

import math

import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.relational import (
    argmax_per_group,
    grouped_median,
    pearson_corr,
)
from open_thoughts_ray.ops.temporal import max_gap_per_key


def _df(n=200, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "v": rng.normal(50.0, 10.0, n).round(3),
        "id": np.arange(n),
    })


def test_argmax_per_group(ray_session):
    import ray.data as rd

    df = _df()
    out = argmax_per_group(
        rd.from_pandas(df, override_num_blocks=7), "k", ["v", "id"]
    ).to_pandas()
    exp = df.sort_values(["v", "id"], ascending=False).drop_duplicates("k")
    got = out.set_index("k")["id"].to_dict()
    assert got == exp.set_index("k")["id"].to_dict()


def test_argmax_per_group_ascending_tie_break(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 1, 2], "v": [5, 5, 9, 3],
                       "id": [10, 2, 7, 1]})
    out = argmax_per_group(
        rd.from_pandas(df, override_num_blocks=2), "k", ["v", "id"],
        descending=False,
    ).to_pandas()
    # group 1: min (v, id) tuple is (5, 2); group 2 trivially id 1
    assert out.set_index("k")["id"].to_dict() == {1: 2, 2: 1}


def test_grouped_median_matches_numpy(ray_session):
    import ray.data as rd

    df = _df()
    out = grouped_median(
        rd.from_pandas(df, override_num_blocks=5), "k", "v"
    ).to_pandas()
    exp = df.groupby("k")["v"].median()
    for _, row in out.iterrows():
        assert row["median_v"] == exp[row["k"]]


def test_grouped_median_even_count_interpolates(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a"] * 4, "v": [1.0, 2.0, 10.0, 20.0]})
    out = grouped_median(rd.from_pandas(df), "k", "v").to_pandas()
    assert out["median_v"].iloc[0] == 6.0


def test_pearson_corr(ray_session):
    import ray.data as rd

    df = _df(500)
    df["w"] = 3.0 * df["v"] + np.random.default_rng(1).normal(0, 5, len(df))
    got = pearson_corr(rd.from_pandas(df, override_num_blocks=9), "v", "w")
    exp = float(np.corrcoef(df["v"], df["w"])[0, 1])
    assert math.isclose(got, exp, rel_tol=0, abs_tol=1e-9)


def test_max_gap_per_key(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([10, 40, 100, 7, 7, 5], unit="s"),
    })
    out = max_gap_per_key(
        rd.from_pandas(df, override_num_blocks=3), "u", "ts"
    ).to_pandas()
    got = out.set_index("u")[["max_gap_us", "n_gaps"]].astype(int)
    # user 1: gaps 30s, 60s → max 60s; user 2: two same-instant events →
    # gap 0; user 3: single event → no row
    assert got.loc[1].tolist() == [60_000_000, 2]
    assert got.loc[2].tolist() == [0, 1]
    assert 3 not in got.index


def test_pivot_count(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import pivot_count

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "t": ["a", "a", "b", "b", "c", "a"],
    })
    out = pivot_count(
        rd.from_pandas(df, override_num_blocks=3), "u", "t", ["a", "b"]
    ).to_pandas().set_index("u").sort_index()
    assert out["n_a"].tolist() == [2, 0, 1]
    assert out["n_b"].tolist() == [1, 1, 0]
    assert "n_c" not in out.columns  # fixed IN-list, static schema


def test_grouped_quantile_matches_numpy(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import grouped_quantile

    df = _df(300)
    out = grouped_quantile(
        rd.from_pandas(df, override_num_blocks=5), "k", "v", 0.9
    ).to_pandas()
    exp = df.groupby("k")["v"].quantile(0.9, interpolation="linear")
    for _, row in out.iterrows():
        assert row["q90_v"] == exp[row["k"]]


def test_top_n_per_group(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import top_n_per_group

    df = _df()
    out = top_n_per_group(
        rd.from_pandas(df, override_num_blocks=6), "k", ["v", "id"], n=3
    ).to_pandas()
    exp = (df.sort_values(["v", "id"], ascending=False)
             .groupby("k", sort=False).head(3))
    got = set(zip(out.k, out.id))
    assert got == set(zip(exp.k, exp.id))


def test_grouped_nunique(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import grouped_nunique

    df = pd.DataFrame({"g": [1, 1, 1, 2, 2], "v": ["a", "a", "b", "c", "c"]})
    out = grouped_nunique(
        rd.from_pandas(df, override_num_blocks=2), "g", "v"
    ).to_pandas().set_index("g")["n_distinct_v"].to_dict()
    assert out == {1: 2, 2: 1}


def test_grouped_string_agg(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import grouped_string_agg

    df = pd.DataFrame({"g": [1, 1, 1, 2], "v": ["b", "a", "b", "z"]})
    out = grouped_string_agg(
        rd.from_pandas(df, override_num_blocks=2), "g", "v", ","
    ).to_pandas().set_index("g")["agg_v"].to_dict()
    assert out == {1: "a,b", 2: "z"}


def test_grouped_ntile(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import grouped_ntile

    df = _df()
    out = grouped_ntile(
        rd.from_pandas(df, override_num_blocks=4), "k", ["v", "id"], 4
    ).to_pandas()
    for key, g in df.groupby("k"):
        m = len(g)
        q, r = divmod(m, 4)
        got = (out[out.k == key].sort_values(["v", "id"])["tile"]
               .to_numpy())
        # ANSI NTILE: first m%4 tiles one row larger
        import numpy as np
        sizes = np.array([q + 1 if i < r else q for i in range(4)])
        exp = np.repeat(np.arange(1, 5), sizes)[:m]
        assert (got == exp).all()


def test_mixture_sample_rates_and_determinism(ray_session):
    import hashlib

    import numpy as np
    import ray.data as rd

    from open_thoughts_ray.ops.relational import mixture_sample

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n),
        "src": rng.choice(["a", "b", "c"], n),
    })
    rates = {"a": 0.8, "b": 0.25, "c": 0.0}
    out = mixture_sample(
        rd.from_pandas(df, override_num_blocks=5), "src", "id", rates
    ).to_pandas()
    # exact reference decision per row
    cut = {"a": format(int(0.8 * 16**8), "08x"),
           "b": format(int(0.25 * 16**8), "08x"), "c": ""}
    exp = df[[hashlib.md5(str(i).encode()).hexdigest() < cut[s]
              for i, s in zip(df.id, df.src)]]
    assert set(out.id) == set(exp.id)
    # empirical rates in the right ballpark, zero-rate source dropped
    for s, r in rates.items():
        m = (df.src == s).sum()
        k = (out.src == s).sum()
        assert abs(k / m - r) < 0.06
    # rate >= 1.0 keeps everything
    full = mixture_sample(
        rd.from_pandas(df, override_num_blocks=3), "src", "id",
        {"a": 1.0, "b": 1.0, "c": 1.0},
    ).to_pandas()
    assert len(full) == n


def test_zscore_column_exact_integer_moments(ray_session):
    import math

    import ray.data as rd

    from open_thoughts_ray.ops.relational import zscore_column

    df = pd.DataFrame({"event_id": range(5),
                       "value": [1.0, 2.0, 3.0, 4.0, 10.0]})
    got = (zscore_column(rd.from_pandas(df), "value").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    c = (df.value * 100).round()
    mu = c.sum() / len(c)
    var = (c * c).sum() / len(c) - mu * mu
    exp = (c - mu) / math.sqrt(var)
    assert np.allclose(got["z_value"], exp, rtol=0, atol=0)
    # constant column → all zeros
    const = pd.DataFrame({"event_id": range(3), "value": [7.0, 7.0, 7.0]})
    gz = zscore_column(rd.from_pandas(const), "value").to_pandas()
    assert (gz["z_value"] == 0).all()


def test_minmax_normalize_column(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import minmax_normalize_column

    df = pd.DataFrame({"event_id": range(4), "value": [5.0, 10.0, 7.5, 5.0]})
    got = (minmax_normalize_column(rd.from_pandas(df), "value").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert np.allclose(got["norm_value"], [0.0, 1.0, 0.5, 0.0],
                       rtol=0, atol=0)
    const = pd.DataFrame({"event_id": range(2), "value": [3.0, 3.0]})
    gc = minmax_normalize_column(rd.from_pandas(const), "value").to_pandas()
    assert (gc["norm_value"] == 0).all()


def test_robust_scale_column(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import robust_scale_column

    df = pd.DataFrame({"event_id": range(7),
                       "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 100.0]})
    got = (robust_scale_column(rd.from_pandas(df), "value").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    q1, med, q3 = np.quantile(df.value, [0.25, 0.5, 0.75], method="linear")
    exp = (df.value - med) / (q3 - q1)
    assert np.allclose(got["robust_value"], exp, rtol=0, atol=0)
    const = pd.DataFrame({"event_id": range(3), "value": [5.0] * 3})
    gc = robust_scale_column(rd.from_pandas(const), "value").to_pandas()
    assert (gc["robust_value"] == 0).all()


def test_histogram_column(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import histogram_column

    df = pd.DataFrame({"value": [0.0, 5.0, 9.99, 10.0, 95.0, 250.0, -3.0]})
    got = (histogram_column(rd.from_pandas(df).repartition(3), "value",
                            0.0, 100.0, 10).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    # bucket 0: {0, 5, 9.99, -3 clipped}, bucket 1: {10.0},
    # bucket 9: {95, 250 clipped}
    assert got["bucket"].tolist() == [0, 1, 9]
    assert got["n"].tolist() == [4, 1, 2]


def test_percent_rank_annotate(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import percent_rank_annotate

    df = pd.DataFrame({"id": range(5), "v": [10, 20, 20, 30, 40]})
    got = (percent_rank_annotate(rd.from_pandas(df), "v").to_pandas()
           .sort_values("id").reset_index(drop=True))
    # percent_rank: ties share (count strictly below)/(n-1)
    assert got["pr_v"].tolist() == [0.0, 0.25, 0.25, 0.75, 1.0]
    one = pd.DataFrame({"id": [0], "v": [5]})
    g1 = percent_rank_annotate(rd.from_pandas(one), "v").to_pandas()
    assert g1["pr_v"].tolist() == [0.0]


def test_mutual_information(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import mutual_information

    # perfectly dependent: MI = H(X) = ln 2 for a 50/50 split
    dep = pd.DataFrame({"a": ["x", "x", "y", "y"],
                        "b": ["p", "p", "q", "q"]})
    assert mutual_information(rd.from_pandas(dep), "a", "b") == \
        pytest.approx(math.log(2), abs=1e-12)
    # independent: MI = 0
    ind = pd.DataFrame({"a": ["x", "x", "y", "y"],
                        "b": ["p", "q", "p", "q"]})
    assert mutual_information(rd.from_pandas(ind), "a", "b") == \
        pytest.approx(0.0, abs=1e-12)


def test_population_stability_index(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import population_stability_index

    a = pd.DataFrame({"v": [5.0] * 50 + [15.0] * 50})
    b_same = pd.DataFrame({"v": [5.0] * 30 + [15.0] * 30})
    assert population_stability_index(
        rd.from_pandas(a), rd.from_pandas(b_same), "v", 0, 20, 2) == \
        pytest.approx(0.0, abs=1e-12)
    b_shift = pd.DataFrame({"v": [5.0] * 10 + [15.0] * 90})
    got = population_stability_index(
        rd.from_pandas(a), rd.from_pandas(b_shift), "v", 0, 20, 2)
    exp = (0.5 - 0.1) * math.log(0.5 / 0.1) + (0.5 - 0.9) * math.log(0.5 / 0.9)
    assert got == pytest.approx(exp, rel=1e-12)


def test_zscore_per_group(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import zscore_per_group

    df = pd.DataFrame({
        "event_id": range(6),
        "g": ["a", "a", "a", "b", "b", "b"],
        "v": [1.0, 2.0, 3.0, 10.0, 10.0, 10.0],
    })
    got = (zscore_per_group(rd.from_pandas(df).repartition(3), "g", "v")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    c = (df.v * 100).round()
    for g in ("a", "b"):
        sel = df.g == g
        mu = c[sel].mean()
        var = (c[sel] ** 2).mean() - mu * mu
        exp = ((c[sel] - mu) / math.sqrt(var)) if var > 0 else c[sel] * 0.0
        assert np.allclose(got.loc[sel.values, "z_v"], exp, rtol=0, atol=0)


def test_stratified_priority_sample(ray_session):
    import hashlib

    import ray.data as rd

    from open_thoughts_ray.ops.relational import stratified_priority_sample

    df = pd.DataFrame({
        "doc_id": range(60),
        "lang": [["en", "de", "fr"][i % 3] for i in range(60)],
    })
    got = stratified_priority_sample(
        rd.from_pandas(df).repartition(5), "lang", k=4,
        id_col="doc_id", seed="s1",
    ).to_pandas()
    # brute-force oracle: per lang, 4 smallest md5(id#seed)
    df2 = df.copy()
    df2["pri"] = [hashlib.md5(f"{i}#s1".encode()).hexdigest()
                  for i in df2.doc_id]
    exp = (df2.sort_values(["lang", "pri", "doc_id"])
           .groupby("lang", sort=False).head(4))
    assert got.groupby("lang").size().max() == 4
    assert sorted(got.doc_id) == sorted(exp.doc_id)
    # different seed → different survivors (unbiased selection moves)
    got2 = stratified_priority_sample(
        rd.from_pandas(df).repartition(5), "lang", k=4,
        id_col="doc_id", seed="s2",
    ).to_pandas()
    assert sorted(got2.doc_id) != sorted(got.doc_id)
