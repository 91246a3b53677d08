import duckdb
import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.containment import containment_dedup


def _corpus(seed=7, n=100):
    """Full docs + truncated copies + quoted-inside copies + exact dups
    + a few too-short strings (short-bucket path)."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        base = " ".join(
            "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 6))
            for _ in range(12 + int(rng.integers(20))))
        texts.append(base)
        r = i % 5
        if r == 0:
            texts.append(base[: len(base) // 2])           # truncation
        elif r == 1:
            texts.append("PREFIX " + base + " SUFFIX")     # quoted inside
        elif r == 2:
            texts.append(base)                             # exact dup
    texts += ["abc", "abc", "xyz", texts[0][:5]]           # short strings
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _sql_survivors(df):
    con = duckdb.connect()
    con.register("d", df)
    return sorted(r[0] for r in con.sql("""
        SELECT g.doc_id FROM d g WHERE NOT EXISTS (
            SELECT 1 FROM d e WHERE e.doc_id != g.doc_id
              AND contains(e.text, g.text)
              AND (length(e.text) > length(g.text)
                   OR (length(e.text) = length(g.text)
                       AND e.doc_id < g.doc_id)))
    """).fetchall())


@pytest.mark.parametrize("blocks", [1, 5])
def test_containment_dedup_matches_sql(ray_session, blocks):
    import ray.data as rd

    df = _corpus()
    want = _sql_survivors(df)
    out = containment_dedup(rd.from_pandas(df, override_num_blocks=blocks),
                            num_partitions=4)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    assert got == want
    assert len(got) < len(df)


def test_containment_equal_texts_keep_first(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [5, 3, 9],
                       "text": ["same text here okay"] * 3})
    out = containment_dedup(rd.from_pandas(df), num_partitions=2)
    assert sorted(out.to_pandas()["doc_id"].tolist()) == [3]


def test_containment_distributed_drop_path(ray_session):
    import ray.data as rd

    df = _corpus(seed=9)
    a = containment_dedup(rd.from_pandas(df, override_num_blocks=4),
                          num_partitions=4)
    b = containment_dedup(rd.from_pandas(df, override_num_blocks=4),
                          num_partitions=4, max_driver_drops=0)
    assert sorted(a.to_pandas()["doc_id"]) == sorted(b.to_pandas()["doc_id"])
