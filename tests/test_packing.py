import numpy as np
import pandas as pd
import pytest


def _df(n=500, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(100, 100 + n))
    return pd.DataFrame({"id": ids, "w": rng.integers(1, 50, n)})


@pytest.mark.parametrize("exclusive", [False, True])
def test_global_cumsum_matches_pandas(ray_session, exclusive):
    import ray.data as rd

    from open_thoughts_ray.ops.packing import global_cumsum

    df = _df()
    out = global_cumsum(
        rd.from_pandas(df, override_num_blocks=7), "id", "w",
        exclusive=exclusive, num_buckets=11,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    exp = ref["w"].cumsum().to_numpy()
    if exclusive:
        exp = exp - ref["w"].to_numpy()
    assert (out["id"].to_numpy() == ref["id"].to_numpy()).all()
    assert (out["running_sum"].to_numpy() == exp).all()


def test_global_cumsum_explicit_bounds_and_sparse_ids(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.packing import global_cumsum

    # non-contiguous ids, some buckets empty
    df = pd.DataFrame({"id": [5, 1000, 30, 999999, 77], "w": [3, 4, 5, 6, 7]})
    out = global_cumsum(
        rd.from_pandas(df, override_num_blocks=3), "id", "w",
        num_buckets=16, bounds=(5, 999999),
    ).to_pandas().sort_values("id")
    exp = df.sort_values("id")["w"].cumsum().to_numpy()
    assert (out["running_sum"].to_numpy() == exp).all()


def test_pack_sequences_matches_reference(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.packing import pack_sequences

    df = _df(300, seed=11)
    out = pack_sequences(
        rd.from_pandas(df, override_num_blocks=5), "id", "w",
        budget=100, num_buckets=9,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    exp = (ref["w"].cumsum() - ref["w"]).to_numpy() // 100
    assert (out["pack_id"].to_numpy() == exp).all()
    # pack ids are non-decreasing along the order and start at 0
    assert out["pack_id"].iloc[0] == 0
    assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()


def test_curriculum_interleave_proportions(ray_session):
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.packing import curriculum_interleave

    df = pd.DataFrame({
        "doc_id": range(12),
        "source": (["a"] * 6) + (["b"] * 6),
    })
    out = (curriculum_interleave(rd.from_pandas(df), "source", "doc_id",
                                 weights={"a": 2.0})
           .to_pandas().sort_values(["mix_key", "doc_id"])
           .reset_index(drop=True))
    # in any prefix of the mix order, 'a' appears ~2x as often as 'b'
    first6 = out.head(6)["source"].tolist()
    assert first6.count("a") == 4 and first6.count("b") == 2
    # keys are rank/weight exactly
    a_rows = out[out.source == "a"].sort_values("doc_id")
    assert a_rows["mix_key"].tolist() == [(i + 1) / 2.0 for i in range(6)]


def test_token_budget_select(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.packing import token_budget_select

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"s{i % 5}" for i in range(n)],
        "score": rng.integers(0, 1000, n).astype(np.int64),
        "tok": rng.integers(1, 50, n).astype(np.int64),
    })
    budget = 300
    out = token_budget_select(
        rd.from_pandas(df, override_num_blocks=8), "source", "score",
        "tok", budget=budget, id_col="doc_id").to_pandas()

    # serial reference: per source, desc-score/asc-id prefix under budget
    ref = df.sort_values(["source", "score", "doc_id"],
                         ascending=[True, False, True], kind="mergesort")
    ref = ref[ref.groupby("source")["tok"].cumsum() <= budget]
    assert sorted(out.doc_id) == sorted(ref.doc_id)
    # every group's spend is within budget
    spent = out.groupby("source")["tok"].sum()
    assert (spent <= budget).all()
