import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops import columns as C


@pytest.fixture
def ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array(["  x ", "y", " z"], pa.string()),
        "b": pa.array(["cat", "dog", "bird"], pa.string()),
        "lst": pa.array([["p", "q"], ["r"], []], pa.list_(pa.string())),
    }))


def test_strip_column(ds):
    out = C.strip_column(ds, "a").to_pandas()
    assert list(out.a) == ["x", "y", "z"]


def test_concatenate_columns(ds):
    out = C.concatenate_columns(ds, ["a", "b"], out="ab", sep="|").to_pandas()
    assert out.ab.iloc[0] == "  x |cat"


def test_list_to_string(ds):
    out = C.list_to_string(ds, "lst").to_pandas()
    assert list(out.lst) == ["p q", "r", ""]


def test_extract_list_index(ds):
    out = C.extract_list_index(ds, "lst", 0, out="first").to_pandas()
    assert list(out["first"]) == ["p", "r", None]


def test_select_rows_regex(ds):
    out = C.select_rows_regex(ds, "b", r"^d.g$").to_pandas()
    assert list(out.id) == [2]


def test_upsample_rows(ds):
    out = C.upsample_rows(ds, 8, current_rows=3).to_pandas()
    assert len(out) == 8
    # whole copies preserved: each original id appears ≥2 times
    assert out.id.value_counts().min() >= 2


def test_weighted_bernoulli_sample_deterministic(ray_session):
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from open_thoughts_ray.ops.columns import weighted_bernoulli_sample_batch

    batch = pa.table({"doc_id": [0, 1, 2, 3],
                      "w": pa.array([0.0, 2000.0, 500.0, 500.0],
                                    pa.float64())})
    out = weighted_bernoulli_sample_batch(batch, "doc_id", "w", 1000.0)
    kept = out.column("doc_id").to_pylist()
    assert 0 not in kept          # weight 0 never kept
    assert 1 in kept              # weight > scale always kept
    # rows 2/3: kept iff md5-uniform < 0.5, independent of batch order
    for i in (2, 3):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        assert (i in kept) == (u < 0.5)
    # annotate mode preserves rows
    ann = weighted_bernoulli_sample_batch(batch, "doc_id", "w", 1000.0,
                                          out="keep")
    assert ann.num_rows == 4


def test_normalize_text_batch_vectorized(ray_session):
    import pyarrow as pa

    from open_thoughts_ray.ops.columns import normalize_text_batch

    batch = pa.table({"text": ["  Hello, WORLD!!  ", "a--b  c", "", "123 .x"]})
    out = normalize_text_batch(batch).column("norm_text").to_pylist()
    assert out == ["hello world", "a b c", "", "123 x"]


def test_partitioned_parquet_write_roundtrip(ray_session, tmp_path):
    """Resumable-output surface: write partitioned by a key column, read
    back a single partition with directory pruning."""
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(20),
                       "lang": ["en", "de"] * 10,
                       "n": range(20)})
    out = str(tmp_path / "part_out")
    rd.from_pandas(df).write_parquet(out, partition_cols=["lang"])
    import os

    assert sorted(os.listdir(out)) == ["lang=de", "lang=en"]
    back = rd.read_parquet(out + "/lang=en").to_pandas()
    assert len(back) == 10 and set(back["doc_id"]) == set(range(0, 20, 2))
