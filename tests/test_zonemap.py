"""Manifest zone-map fragment pruning (io/lance_table.py).

The 100-TB read path: a filtered read must skip fragments from the
manifest stats alone, before any parquet footer is fetched; the
residual row filter then pushes into the scan.  Correctness bar:
pruned read ≡ full scan + filter, with stat-less fragments never
pruned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from open_thoughts_ray.io import lance_table as LT


def _write(tmp_path, tables, stats=True):
    frags = [LT.write_fragment(str(tmp_path), i, t, stats=stats)
             for i, t in enumerate(tables)]
    LT.write_manifest(str(tmp_path), frags)
    return str(tmp_path)


def _frag_tables():
    # three fragments with disjoint id ranges and distinct langs
    return [
        pa.table({"doc_id": pa.array(range(0, 100), pa.int64()),
                  "score": pa.array(np.linspace(0.0, 0.9, 100)),
                  "lang": pa.array(["en"] * 100)}),
        pa.table({"doc_id": pa.array(range(100, 200), pa.int64()),
                  "score": pa.array(np.linspace(1.0, 1.9, 100)),
                  "lang": pa.array(["de"] * 100)}),
        pa.table({"doc_id": pa.array(range(200, 300), pa.int64()),
                  "score": pa.array(np.linspace(2.0, 2.9, 100)),
                  "lang": pa.array(["fr"] * 100)}),
    ]


def test_zone_stats_shapes():
    t = pa.table({
        "i": pa.array([3, 1, None], pa.int64()),
        "s": pa.array(["b", "a", None]),
        "f": pa.array([2.5, float("nan"), 0.5]),
        "payload": pa.array([b"x", b"y", b"z"], pa.binary()),
        "lst": pa.array([[1], [2], [3]], pa.list_(pa.int64())),
    })
    st = LT.zone_stats(t)
    assert st["i"] == {"min": 1, "max": 3, "nulls": 1}
    assert st["s"] == {"min": "a", "max": "b", "nulls": 1}
    assert st["f"]["min"] == 0.5 and st["f"]["max"] == 2.5
    # binary / list payloads carry no zone maps
    assert "payload" not in st and "lst" not in st
    # all-null and empty columns record None bounds
    st2 = LT.zone_stats(pa.table({"x": pa.array([None, None], pa.int64())}))
    assert st2["x"] == {"min": None, "max": None, "nulls": 2}


def test_prune_fragments_ranges(tmp_path):
    d = _write(tmp_path, _frag_tables())
    kept, pruned = LT.prune_fragments(d, [("doc_id", ">=", 250)])
    assert pruned == 2 and len(kept) == 1 and "frag-00002" in kept[0]
    kept, pruned = LT.prune_fragments(d, [("doc_id", "<", 100)])
    assert pruned == 2 and "frag-00000" in kept[0]
    # == on a string column
    kept, pruned = LT.prune_fragments(d, [("lang", "==", "de")])
    assert pruned == 2 and "frag-00001" in kept[0]
    # conjunction across columns prunes the intersection
    kept, pruned = LT.prune_fragments(
        d, [("doc_id", ">=", 100), ("score", "<=", 1.5)])
    assert pruned == 2 and "frag-00001" in kept[0]
    # boundary inclusivity: >= min of a fragment keeps it
    kept, _ = LT.prune_fragments(d, [("doc_id", ">=", 200)])
    assert len(kept) == 1
    kept, _ = LT.prune_fragments(d, [("doc_id", ">", 299)])
    assert kept == []


def test_statless_fragments_never_pruned(tmp_path):
    d = _write(tmp_path, _frag_tables(), stats=False)
    kept, pruned = LT.prune_fragments(d, [("doc_id", "==", -1)])
    assert pruned == 0 and len(kept) == 3


def test_unknown_column_and_bad_conjunct(tmp_path):
    d = _write(tmp_path, _frag_tables())
    kept, pruned = LT.prune_fragments(d, [("nope", "==", 1)])
    assert pruned == 0 and len(kept) == 3
    with pytest.raises(ValueError, match="bad conjunct"):
        LT.prune_fragments(d, [("doc_id", "!=", 1)])


def test_all_null_zone_pruning(tmp_path):
    tables = [pa.table({"doc_id": pa.array([None, None], pa.int64())}),
              pa.table({"doc_id": pa.array([5, 6], pa.int64())})]
    d = _write(tmp_path, tables)
    # an all-null fragment provably holds no row with doc_id == 5
    kept, pruned = LT.prune_fragments(d, [("doc_id", "==", 5)])
    assert pruned == 1 and "frag-00001" in kept[0]


def test_read_dataset_pruned_equals_full_filter(ray_session, tmp_path):
    d = _write(tmp_path, _frag_tables())
    conj = [("doc_id", ">=", 150), ("score", "<", 2.5)]
    got = (LT.read_dataset(d, filter_conjuncts=conj)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    full = LT.read_dataset(d).to_pandas()
    want = full[(full.doc_id >= 150) & (full.score < 2.5)] \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want) and len(got) == 105  # 50 de + 55 fr
    # empty result keeps the schema
    empty = LT.read_dataset(d, filter_conjuncts=[("doc_id", ">", 10**6)])
    assert empty.count() == 0
    assert set(empty.schema().names) == {"doc_id", "score", "lang"}
    # column projection composes with the pushed filter
    thin = LT.read_dataset(d, columns=["doc_id"],
                           filter_conjuncts=[("lang", "==", "fr")])
    pdf = thin.to_pandas()
    assert list(pdf.columns) == ["doc_id"] and len(pdf) == 100
