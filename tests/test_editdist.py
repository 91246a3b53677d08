import duckdb
import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.editdist import (
    levenshtein_dedup,
    levenshtein_within,
    passjoin_pairs,
)


def _lev_ref(a: str, b: str) -> int:
    """Plain quadratic reference DP."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _mutate(rng, s: str, n_edits: int) -> str:
    out = list(s)
    for _ in range(n_edits):
        op = rng.integers(3)
        pos = int(rng.integers(max(1, len(out))))
        ch = chr(97 + int(rng.integers(26)))
        if op == 0 and out:
            out[pos % len(out)] = ch
        elif op == 1:
            out.insert(pos, ch)
        elif out:
            del out[pos % len(out)]
    return "".join(out)


def _corpus(n=120, seed=3):
    """Base strings plus mutated near-copies at various edit distances."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 40 + int(rng.integers(60))))
        texts.append(base)
        if i % 3 == 0:
            texts.append(_mutate(rng, base, int(rng.integers(1, 8))))
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def test_levenshtein_within_matches_reference():
    rng = np.random.default_rng(7)
    for _ in range(150):
        a = "".join(chr(97 + int(c)) for c in rng.integers(0, 5, int(rng.integers(0, 30))))
        b = _mutate(rng, a, int(rng.integers(0, 10)))
        d = _lev_ref(a, b)
        for k in (0, 1, 3, 5, 8):
            assert levenshtein_within(a, b, k) == (d <= k), (a, b, k, d)


def test_passjoin_candidates_have_recall_one(ray_session):
    import ray.data as rd

    df = _corpus()
    k = 5
    truth = set()
    texts = df["text"].tolist()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if abs(len(texts[i]) - len(texts[j])) <= k and _lev_ref(texts[i], texts[j]) <= k:
                truth.add((str(i), str(j)))
    got = passjoin_pairs(rd.from_pandas(df, override_num_blocks=4),
                         "doc_id", "text", k, num_partitions=4).to_pandas()
    cands = {tuple(sorted((a, b), key=int)) for a, b in zip(got["a"], got["b"])}
    assert truth, "corpus must contain true near-dup pairs"
    missing = truth - cands
    assert not missing, f"PassJoin missed true pairs: {sorted(missing)[:5]}"


def test_passjoin_short_string_fallback(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["abc", "abd", "xy", "abcdefghij"]})
    got = passjoin_pairs(rd.from_pandas(df), "doc_id", "text", 5,
                         num_partitions=2).to_pandas()
    cands = {tuple(sorted((a, b), key=int)) for a, b in zip(got["a"], got["b"])}
    # every pair within distance 5 must be a candidate: (0,1) d=1, (0,2)
    # d=3, (1,2) d=3 — short strings pair through the shared bucket
    for p in [("0", "1"), ("0", "2"), ("1", "2")]:
        assert p in cands


@pytest.mark.parametrize("k", [3, 5])
def test_levenshtein_dedup_matches_sql_not_exists(ray_session, k):
    import ray.data as rd

    df = _corpus(seed=11)
    con = duckdb.connect()
    con.register("d", df)
    want = sorted(r[0] for r in con.sql(f"""
        SELECT g.doc_id FROM d g WHERE NOT EXISTS (
            SELECT 1 FROM d e WHERE e.doc_id < g.doc_id
              AND abs(length(e.text) - length(g.text)) <= {k}
              AND levenshtein(e.text, g.text) <= {k})
    """).fetchall())
    out = levenshtein_dedup(rd.from_pandas(df, override_num_blocks=5),
                            max_dist=k, num_partitions=4)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    assert got == want
    assert len(got) < len(df)  # some dups actually collapsed


def test_levenshtein_dedup_distributed_drop_path(ray_session):
    """max_driver_drops=0 forces the anti-join path; survivors must be
    identical to the broadcast-set path."""
    import ray.data as rd

    df = _corpus(seed=13)
    a = levenshtein_dedup(rd.from_pandas(df, override_num_blocks=4),
                          max_dist=5, num_partitions=4)
    b = levenshtein_dedup(rd.from_pandas(df, override_num_blocks=4),
                          max_dist=5, num_partitions=4, max_driver_drops=0)
    assert sorted(a.to_pandas()["doc_id"]) == sorted(b.to_pandas()["doc_id"])
