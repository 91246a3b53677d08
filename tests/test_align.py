"""Image–caption alignment (CLIP-score analogue, ops/align.py).

Contract under test: both towers land in ONE shared embedding space, so
a caption that names the image's visual tokens scores high while an
unrelated caption scores low — the property a real CLIP swap preserves.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_thoughts_ray.io import codecs
from open_thoughts_ray.ops.align import (
    ImageTextAligner,
    _visual_tokens,
    align_filter,
    align_score,
)


def _images_table(n: int = 12, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
            "caption": []}
    pxs = []
    for i in range(n):
        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        pxs.append(px)
        rows["image_id"].append(f"img{i:03d}")
        rows["bytes"].append(codecs.encode(px, "raw"))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append("raw")
    # even rows: caption = own visual tokens (matched);
    # odd rows: caption = the PREVIOUS image's tokens (mismatched)
    for i in range(n):
        src = i if i % 2 == 0 else i - 1
        rows["caption"].append(_visual_tokens(pxs[src]))
    return pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"], pa.string()),
        "caption": pa.array(rows["caption"], pa.string()),
    })


def test_matched_beats_mismatched(ray_session):
    tbl = _images_table()
    out = align_score(rd.from_arrow(tbl)).to_pandas() \
        .set_index("image_id").sort_index()
    matched = out.iloc[::2]["align_score"].to_numpy()
    mismatched = out.iloc[1::2]["align_score"].to_numpy()
    # matched captions are the image's own token bag → cosine ≈ 1
    assert (matched > 0.99).all()
    # mismatched captions are a DIFFERENT random image's tokens; they
    # share only format-level grams, far below the matched band
    assert matched.min() > mismatched.max()


def test_filter_keeps_matched_only_and_schema(ray_session):
    tbl = _images_table()
    out = align_score(rd.from_arrow(tbl)).to_pandas()
    thr = float((out.iloc[1::2]["align_score"].max()
                 + out.iloc[::2]["align_score"].min()) / 2)
    kept = align_filter(rd.from_arrow(tbl), min_score=thr)
    ktbl = kept.to_pandas()
    assert set(ktbl.image_id) == {f"img{i:03d}" for i in range(0, 12, 2)}
    assert list(ktbl.columns) == tbl.column_names  # schema unchanged


def test_bit_identical_to_serial_reference(ray_session):
    tbl = _images_table(seed=7)
    ray_scores = align_score(rd.from_arrow(tbl)) \
        .to_pandas().set_index("image_id")["align_score"]
    model = ImageTextAligner()
    serial = model(tbl).to_pandas().set_index("image_id")["align_score"]
    for k in serial.index:
        assert ray_scores[k] == serial[k]  # bit-for-bit


def test_visual_tokens_deterministic_and_distinct():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    b = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert _visual_tokens(a) == _visual_tokens(a)
    assert _visual_tokens(a) != _visual_tokens(b)


def test_yaml_image_ops(ray_session, tmp_path):
    """YAML grammar for the image family: quality gate + alignment."""
    import pyarrow.parquet as pq

    from open_thoughts_ray import yaml_pipeline as Y

    tbl = _images_table()
    src = tmp_path / "imgs.parquet"
    pq.write_table(tbl, src)
    doc = {
        "operators": [
            {"id": "src", "config": {"type": "parquet_source",
                                     "path": str(src)}},
            {"id": "gate", "input_ids": ["src"],
             "config": {"type": "image_quality_gate", "mode": "annotate",
                        "min_sharpness": 0.0, "min_contrast": 0.0}},
            {"id": "aligned", "input_ids": ["gate"],
             "config": {"type": "image_caption_alignment",
                        "mode": "filter", "min_score": 0.99}},
        ]
    }
    out = Y.run_pipeline(doc).to_pandas()
    # min_score=0.99 keeps exactly the matched (even) rows
    assert set(out.image_id) == {f"img{i:03d}" for i in range(0, 12, 2)}
    assert "sharpness" in out.columns


def test_example_image_curation_yaml(ray_session, tmp_path):
    """examples/image_curation.yaml: geometry gate → pixel quality →
    alignment filter → phash near-dup keep-sharpest, end to end."""
    import pyarrow.parquet as pq
    import yaml

    from open_thoughts_ray.io.codecs import average_phash, decode
    from open_thoughts_ray.yaml_pipeline import run_pipeline

    tbl = _images_table()  # 12 rows: even matched, odd mismatched
    # plant an exact duplicate of img000 with a matched caption; the
    # near-dup stage must collapse the pair to one survivor
    px0 = decode(tbl.column("bytes")[0].as_py(),
                 tbl.column("w")[0].as_py(), tbl.column("h")[0].as_py(),
                 "raw")
    import numpy as np

    from open_thoughts_ray.io import codecs
    from open_thoughts_ray.ops.align import _visual_tokens

    dup_px = px0  # exact pixel copy → identical phash, tied sharpness
    extra = pa.table({
        "image_id": pa.array(["img_dup"], pa.string()),
        "bytes": pa.array([codecs.encode(dup_px, "raw")], pa.binary()),
        "w": pa.array([px0.shape[1]], pa.int32()),
        "h": pa.array([px0.shape[0]], pa.int32()),
        "fmt": pa.array(["raw"], pa.string()),
        "caption": pa.array([_visual_tokens(dup_px)], pa.string()),
    })
    tbl = pa.concat_tables([tbl, extra])
    from open_thoughts_ray.common.hashing import uint64_to_int64

    phash = pa.array(
        [uint64_to_int64(average_phash(decode(tbl.column("bytes")[i].as_py(),
                              tbl.column("w")[i].as_py(),
                              tbl.column("h")[i].as_py(), "raw")))
         for i in range(tbl.num_rows)], pa.int64())
    tbl = tbl.append_column("phash", phash)
    src = tmp_path / "imgs.parquet"
    pq.write_table(tbl, src)
    doc = yaml.safe_load(
        open("examples/image_curation.yaml").read().replace(
            "{input_path}", str(src)))
    out = run_pipeline(doc).to_pandas()
    ids = set(out.image_id)
    # odd (mismatched-caption) rows filtered by alignment
    assert not any(f"img{i:03d}" in ids for i in range(1, 12, 2))
    # exact-copy pair (img000, img_dup) collapsed to ONE survivor
    assert len({"img000", "img_dup"} & ids) == 1
    # matched non-dup evens survive
    assert {f"img{i:03d}" for i in range(2, 12, 2)} <= ids


def test_image_search_retrieves_own_image(ray_session):
    """Cross-modal retrieval: querying with an image's visual-token
    text must rank that image first."""
    from open_thoughts_ray.io.codecs import decode
    from open_thoughts_ray.ops.align import _visual_tokens, image_search

    tbl = _images_table(n=10, seed=17)
    # queries = visual tokens of images 0, 3, 7
    targets = {0: "img000", 1: "img003", 2: "img007"}
    queries = {}
    for qid, iid in targets.items():
        row = int(iid[3:])
        px = decode(tbl.column("bytes")[row].as_py(),
                    tbl.column("w")[row].as_py(),
                    tbl.column("h")[row].as_py(), "raw")
        queries[qid] = _visual_tokens(px)
    out = image_search(rd.from_arrow(tbl).repartition(4), queries, k=3) \
        .to_pandas()
    for qid, iid in targets.items():
        top = out[(out.query_id == qid) & (out["rank"] == 1)]
        assert list(top.image_id) == [iid]
        assert float(top.cos.iloc[0]) > 0.99
    assert (out.groupby("query_id")["rank"].max() == 3).all()


def test_flagship_align_prefilter_option(ray_session):
    """PipelineOptions.align_min_score wires the alignment gate into the
    flagship path: off by default (oracle parity untouched), and an
    impossible threshold drops every row before scoring."""
    import ray.data as rd

    from open_thoughts_ray.pipeline import (
        PipelineOptions,
        quality_filter_dataset,
    )

    from open_thoughts_ray.common.hashing import uint64_to_int64
    from open_thoughts_ray.io.codecs import average_phash, decode

    tbl = _images_table()
    phash = pa.array(
        [uint64_to_int64(average_phash(decode(
            tbl.column("bytes")[i].as_py(), tbl.column("w")[i].as_py(),
            tbl.column("h")[i].as_py(), "raw")))
         for i in range(tbl.num_rows)], pa.int64())
    tbl = tbl.append_column("phash", phash)
    base = quality_filter_dataset(rd.from_arrow(tbl)).count()
    assert base == tbl.num_rows  # every row gets a decision by default
    gated = quality_filter_dataset(
        rd.from_arrow(tbl), PipelineOptions(align_min_score=1.5))
    assert gated.count() == 0
