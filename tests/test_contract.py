import glob

import pandas as pd
import pyarrow.compute as pc
import pytest

from open_thoughts_ray.ops.contract import (
    SchemaViolation,
    split_quarantine,
    validate_schema,
)


def test_validate_schema_passes_and_fails(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
    ds = rd.from_pandas(df)
    ok = validate_schema(ds, {"doc_id": "int64", "text": "string"})
    assert ok.count() == 2

    with pytest.raises(Exception) as ei:
        validate_schema(rd.from_pandas(df), {"doc_id": "string"}).materialize()
    assert "expected string" in str(ei.value)

    with pytest.raises(Exception) as ei2:
        validate_schema(rd.from_pandas(df), {"missing": "int64"}).materialize()
    assert "missing column" in str(ei2.value)

    nulls = pd.DataFrame({"doc_id": [1, None]})
    with pytest.raises(Exception) as ei3:
        validate_schema(rd.from_pandas(nulls), {"doc_id": "double"},
                        forbid_nulls=["doc_id"]).materialize()
    assert "null" in str(ei3.value)


def test_split_quarantine_routes_and_audits(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(6),
                       "n_chars": [10, -1, 20, 0, 30, -5]})
    qdir = str(tmp_path / "quarantine")
    out = split_quarantine(
        rd.from_pandas(df).repartition(3),
        lambda t: pc.greater(t.column("n_chars"), 0),
        qdir, reason="nonpositive_length",
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 4]
    files = glob.glob(qdir + "/*.parquet")
    assert files
    bad = pd.concat([pd.read_parquet(f) for f in files])
    assert sorted(bad["doc_id"]) == [1, 3, 5]
    assert (bad["_quarantine_reason"] == "nonpositive_length").all()
