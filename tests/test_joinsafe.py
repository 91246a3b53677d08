"""Fault-injection coverage for the Ray 2.49 hash-shuffle-join
empty-first-block hazard (VERDICT r4 #1/#2).

Mechanism (ray/data/_internal/execution/operators/hash_shuffle.py):
``_shuffle_block`` early-returns on a 0-row block without broadcasting
the schema, yet the one-shot ``should_broadcast_schemas`` flag is
consumed by the first SUBMITTED block per join side — so a join whose
side leads with an empty block (typed OR schema-less) finalizes
zero-column partitions and pyarrow throws ``ArrowInvalid: No match …
FieldRef``.  ``ops/joinsafe.safe_join`` is the engine-wide guard; these
tests drive every join-consuming operator with inputs whose FIRST block
is empty, which reproduced the r4 ``components_documents`` driver crash
deterministically before the fix.
"""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from open_thoughts_ray.ops.joinsafe import safe_join


def _t(ks, col="v", keyname="k"):
    return pa.table({keyname: pa.array(ks, pa.int64()),
                     col: pa.array([str(x) for x in ks], pa.string())})


def _empty_first(*tables):
    """Dataset whose FIRST block is schema-less empty — the hazard."""
    return ray.data.from_arrow([pa.table({}), *tables])


def _typed_empty_first(schema_like: pa.Table, *tables):
    """Dataset whose FIRST block is a typed 0-row block — also a
    trigger (the 0-row early return skips the schema broadcast)."""
    return ray.data.from_arrow([schema_like.slice(0, 0), *tables])


SCH = pa.schema([("k", pa.int64()), ("v", pa.string())])
SCH_W = pa.schema([("k", pa.int64()), ("w", pa.string())])


# --------------------------------------------------------- safe_join unit
@pytest.mark.parametrize("make_left", [
    lambda: _empty_first(_t([1, 2])),
    lambda: _typed_empty_first(_t([0]), _t([1, 2])),
])
def test_safe_join_empty_first_left(make_left):
    right = ray.data.from_arrow(_t(list(range(16)), col="w"))
    out = safe_join(make_left(), right, join_type="inner", on=("k",),
                    num_partitions=8, left_schema=SCH, right_schema=SCH_W)
    rows = sorted(out.take_all(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2]
    assert rows[0]["w"] == "1"


@pytest.mark.parametrize("join_type,expect", [
    ("inner", 0), ("left_outer", 4), ("full_outer", 4)])
def test_safe_join_all_empty_right(join_type, expect):
    left = ray.data.from_arrow(_t([0, 1, 2, 3]))
    right = ray.data.from_arrow([pa.table({})])  # schema-less empty
    out = safe_join(left, right, join_type=join_type, on=("k",),
                    num_partitions=8, left_schema=SCH, right_schema=SCH_W)
    rows = out.take_all()
    assert len(rows) == expect
    if expect:
        assert all(r["w"] is None for r in rows)
        assert {r["k"] for r in rows} == {0, 1, 2, 3}


def test_safe_join_all_empty_left_full_outer():
    left = ray.data.from_arrow([pa.table({})])
    right = ray.data.from_arrow(_t([7, 8], col="w"))
    out = safe_join(left, right, join_type="full_outer", on=("k",),
                    num_partitions=8, left_schema=SCH, right_schema=SCH_W)
    rows = sorted(out.take_all(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [7, 8]
    assert all(r["v"] is None for r in rows)


def test_safe_join_both_empty():
    out = safe_join(ray.data.from_arrow([pa.table({})]),
                    ray.data.from_arrow([pa.table({})]),
                    join_type="inner", on=("k",), num_partitions=4,
                    left_schema=SCH, right_schema=SCH_W)
    assert out.count() == 0
    # combined schema is typed even though both sides were schema-less
    assert set(out.schema().names) >= {"k", "v"}


def test_safe_join_schemaless_empty_requires_hint():
    with pytest.raises(ValueError, match="schema-less"):
        safe_join(ray.data.from_arrow([pa.table({})]),
                  ray.data.from_arrow(_t([1])),
                  join_type="inner", on=("k",), num_partitions=4)


# ------------------------------------------- operator-level fault injection
def test_label_propagation_empty_first_edge_block():
    """The r4 driver crash: components over an edge dataset whose first
    block is empty (sparse edges at high parallelism)."""
    from open_thoughts_ray.ops.dedup import label_propagation

    edges_t = pa.table({"a": pa.array(["001", "003"], pa.string()),
                        "b": pa.array(["002", "004"], pa.string())})
    edges = ray.data.from_arrow([pa.table({}), edges_t])
    nodes = ray.data.from_arrow(pa.table(
        {"id": pa.array([f"{i:03d}" for i in range(1, 7)], pa.string())}))
    labels = {r["id"]: r["label"]
              for r in label_propagation(nodes, edges).take_all()}
    assert labels["002"] == "001" and labels["004"] == "003"
    assert labels["005"] == "005" and labels["006"] == "006"


def test_hash_join_empty_first_blocks_both_sides():
    from open_thoughts_ray.ops.relational import hash_join

    left = _typed_empty_first(_t([0]), _t([1, 2, 3]))
    right = _empty_first(_t([2, 3, 4], col="w"))
    out = hash_join(left, right, on="k", num_partitions=8)
    assert sorted(r["k"] for r in out.take_all()) == [2, 3]


def test_snapshot_diff_empty_new_side():
    """full_outer with one genuinely empty side (first-ever snapshot)."""
    from open_thoughts_ray.ops.dedup import snapshot_diff

    old = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["a", "b"], pa.string())}))
    new = ray.data.from_arrow([pa.table({})])
    res = snapshot_diff(
        old, new.map_batches(
            lambda t: pa.table({"doc_id": pa.array([], pa.int64()),
                                "text": pa.array([], pa.string())})
            if t.num_columns == 0 else t, batch_format="pyarrow"),
    )
    row = res.to_pylist()[0] if isinstance(res, pa.Table) \
        else res.take_all()[0]
    assert row["n_removed"] == 2 and row["n_added"] == 0


def test_anti_join_ids_empty_first_block_input():
    from open_thoughts_ray.ops.pairverify import anti_join_ids

    ds = _empty_first(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                                "text": pa.array(list("abc"), pa.string())}))
    drop = ray.data.from_arrow(pa.table({"id": pa.array(["2"], pa.string())}))
    out = anti_join_ids(ds.map_batches(
        lambda t: pa.table({"doc_id": pa.array([], pa.int64()),
                            "text": pa.array([], pa.string())})
        if t.num_columns == 0 else t, batch_format="pyarrow"), "doc_id", drop)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 3]


def test_exact_substring_scrub_empty_first_block():
    from open_thoughts_ray.ops.substring import exact_substring_scrub

    seg = "one two three four five six"
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"{seg} tail one", f"{seg} other words here",
                          "totally unrelated text body now"], pa.string()),
    })
    typed = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    ds = ray.data.from_arrow([typed, tbl])  # typed-empty-first trigger
    out = exact_substring_scrub(ds, k=5, min_docs=2, max_driver_grams=0)
    assert out.count() == 3  # survives; content checked in test_substring


def test_remove_boilerplate_empty_first_block():
    from open_thoughts_ray.ops.boilerplate import remove_boilerplate_lines

    lines = ["header header header header header header",
             "unique content line number %d with words"]
    docs = [(i, lines[0] + "\n" + (lines[1] % i)) for i in range(8)]
    tbl = pa.table({"doc_id": pa.array([i for i, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    typed = tbl.slice(0, 0)
    ds = ray.data.from_arrow([typed, tbl])
    out = remove_boilerplate_lines(ds, min_df=4, max_driver_lines=0)
    rows = {r["doc_id"]: r["clean_text"] for r in out.take_all()}
    assert len(rows) == 8
    assert all("header" not in v for v in rows.values())


def test_label_propagation_sparse_edges_32cpus():
    """r4 driver-crash regression: at ``ray.init(num_cpus=32)`` the
    sparse edge table's first shuffled block can be empty, which
    poisoned the per-round label join ("No match … FieldRef.Name(nbr)").
    Runs in a subprocess so the 32-CPU local cluster doesn't disturb
    the 4-CPU session fixture."""
    import subprocess
    import sys

    code = r"""
import ray, pyarrow as pa, sys
ray.init(address="local", num_cpus=32, include_dashboard=False)
sys.path.insert(0, %r)
from open_thoughts_ray.ops.dedup import fingerprint_components

n = 500
texts = []
for i in range(n):
    # every 10th pair of docs shares a 3-token prefix -> sparse edges
    base = f"w{i//2 if i %% 10 < 2 else i}"
    texts.append(f"{base} {base}b {base}c body{i} tail{i} end{i}")
ds = ray.data.from_arrow(pa.table({
    "doc_id": pa.array(list(range(n)), pa.int64()),
    "text": pa.array(texts, pa.string()),
})).repartition(64)  # many blocks, most contribute no edges
out = fingerprint_components(ds, "doc_id", "text", 3, 3)
rows = out.take_all()
assert len(rows) == n, len(rows)
ray.shutdown()
print("OK32")
"""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [sys.executable, "-c", code % repo], env=env,
        capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK32" in res.stdout
