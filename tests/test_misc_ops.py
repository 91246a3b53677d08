import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops.consensus import distinct_ngram_ratio, majority_vote, token_entropy
from open_thoughts_ray.ops.multimodal import ImageFeatureExtractor, ImageResizer, frame_sample_batch
from open_thoughts_ray.yaml_pipeline import parse_pipeline, run_pipeline


def test_majority_vote(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "qid": [1, 1, 1, 2, 2, 2, 3, 3],
        "answer": ["a", "b", "a", "x", "y", "x", "m", "n"],  # qid 3 ties m/n
    })
    out = majority_vote(rd.from_pandas(df), "qid", "answer").to_pandas().set_index("qid")
    assert out.loc[1, "majority_answer"] == "a" and out.loc[1, "votes"] == 2
    assert out.loc[2, "majority_answer"] == "x"
    assert out.loc[3, "majority_answer"] == "m"  # deterministic tie-break


def test_token_entropy_matches_direct(ray_session):
    import math

    import ray.data as rd

    texts = ["a a b", "b c", "a"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    got = token_entropy(ds)
    from collections import Counter

    c = Counter(t for s in texts for t in s.split(" "))
    tot = sum(c.values())
    expect = -sum(v / tot * math.log(v / tot) for v in c.values())
    assert abs(got - expect) < 1e-9


def test_extract_root_domain_and_frequent_annotate(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.web import (annotate_frequent_domains,
                                           extract_root_domain)

    assert extract_root_domain("https://www.alpha.example.com/p/1") == "example.com"
    assert extract_root_domain("HTTP://Beta.Example.ORG/x?q=1") == "example.org"
    assert extract_root_domain("https://localhost/x") == "localhost"
    assert extract_root_domain("not a url") == ""
    assert extract_root_domain("") == ""

    urls = (["https://www.a.com/1"] * 3 + ["https://b.org/2"] * 2
            + ["https://rare.net/3"])
    out = annotate_frequent_domains(
        rd.from_pandas(pd.DataFrame({"url": urls})), min_count=2).to_pandas()
    by_dom = out.groupby("root_domain")["is_frequent_domain"].all()
    assert by_dom["a.com"] and by_dom["b.org"]
    assert not out[out.root_domain == "rare.net"]["is_frequent_domain"].any()


def test_token_gini_matches_mean_abs_difference(ray_session):
    """Rank-block formula equals the O(V²) mean-absolute-difference
    definition of Gini on the token frequency vector."""
    import ray.data as rd

    from open_thoughts_ray.ops.consensus import token_gini

    texts = ["a a a b b c", "a b d", "e e e e a"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    got = token_gini(ds)
    from collections import Counter

    x = np.array(sorted(Counter(
        t for s in texts for t in s.split(" ")).values()), dtype=float)
    n = len(x)
    expect = np.abs(x[:, None] - x[None, :]).sum() / (2 * n * x.sum())
    assert got == pytest.approx(expect, rel=1e-12)
    # uniform distribution → gini 0
    uni = rd.from_pandas(pd.DataFrame({"text": ["p q r s"]}))
    assert token_gini(uni) == pytest.approx(0.0, abs=1e-12)


def test_distinct_ngram_ratio(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"text": ["a b a b", "a b"]}))
    # bigrams: (a b), (b a), (a b) | (a b) → 2 distinct / 4 total
    assert distinct_ngram_ratio(ds, n=2) == pytest.approx(0.5)


def _image_batch(n=4, seed=0):
    from open_thoughts_ray.fixtures.images import _gen_pixels
    from open_thoughts_ray.io import codecs

    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
    for i in range(n):
        px = _gen_pixels(np.random.default_rng(seed + i))
        rows["image_id"].append(f"img-{i}")
        rows["bytes"].append(codecs.encode(px, "pngz"))
        rows["w"].append(px.shape[1])
        rows["h"].append(px.shape[0])
        rows["fmt"].append("pngz")
    return pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"], pa.string()),
    })


def test_image_resizer(ray_session):
    import ray.data as rd

    out = rd.from_arrow(_image_batch()).map_batches(
        ImageResizer, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"target": 24},
    ).to_pandas()
    assert (out.w == 24).all() and (out.h == 24).all()
    assert all(len(b) == 24 * 24 * 3 for b in out.bytes)


def test_image_features(ray_session):
    import ray.data as rd

    out = rd.from_arrow(_image_batch()).map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", concurrency=1
    ).take_all()
    assert len(out[0]["features"]) == ImageFeatureExtractor.DIM


def test_image_quality_gate(ray_session):
    import ray.data as rd

    from open_thoughts_ray.io import codecs
    from open_thoughts_ray.ops.multimodal import ImageQualityGate

    rng = np.random.default_rng(7)
    # sharp: checkerboard (huge Laplacian variance, high contrast);
    # 30/220 values so no sample sits at the clip rails
    sharp = (np.indices((16, 16)).sum(axis=0) % 2 * 190 + 30).astype(np.uint8)
    sharp = np.stack([sharp] * 3, axis=2)
    # flat: constant mid-gray (contrast 0)
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    # clipped: all-white (clip_frac 1.0)
    clipped = np.full((16, 16, 3), 255, dtype=np.uint8)
    # textured: noisy enough to pass every gate
    textured = rng.integers(40, 200, size=(16, 16, 3)).astype(np.uint8)
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
    for name, px in [("sharp", sharp), ("flat", flat),
                     ("clipped", clipped), ("textured", textured)]:
        rows["image_id"].append(name)
        rows["bytes"].append(codecs.encode(px, "raw"))
        rows["w"].append(16)
        rows["h"].append(16)
        rows["fmt"].append("raw")
    tbl = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"], pa.string()),
    })
    ann = rd.from_arrow(tbl).map_batches(
        ImageQualityGate, batch_format="pyarrow", concurrency=1
    ).to_pandas().set_index("image_id")
    assert ann.loc["sharp", "img_keep"]
    assert not ann.loc["flat", "img_keep"]        # contrast 0
    assert not ann.loc["clipped", "img_keep"]     # clip_frac 1.0
    assert ann.loc["textured", "img_keep"]
    assert ann.loc["clipped", "clip_frac"] == 1.0
    kept = rd.from_arrow(tbl).map_batches(
        ImageQualityGate, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"mode": "filter"},
    ).to_pandas()
    assert set(kept.image_id) == {"sharp", "textured"}


def test_image_quality_signals_vs_loop_oracle():
    """Vectorized Laplacian variance equals the per-pixel double loop."""
    from open_thoughts_ray.ops.multimodal import ImageQualityGate

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 7, 3)).astype(np.uint8)
    sharp, contrast, clip = ImageQualityGate.signals(px)
    gray = px.astype(np.float64).mean(axis=2)
    vals = []
    for y in range(1, 8):
        for x in range(1, 6):
            vals.append(4 * gray[y, x] - gray[y - 1, x] - gray[y + 1, x]
                        - gray[y, x - 1] - gray[y, x + 1])
    assert sharp == pytest.approx(np.var(vals))
    assert contrast == pytest.approx(gray.std())
    assert clip == pytest.approx(((px <= 2) | (px >= 253)).mean())


def test_frame_sample_is_stub():
    with pytest.raises(NotImplementedError):
        frame_sample_batch(_image_batch())


def test_yaml_parse_wiring():
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": "x"}},
        {"id": "lim", "config": {"type": "limit", "n": 5}},
        {"id": "both", "input_ids": ["src", "lim"], "config": {"type": "concatenate"}},
    ]}
    ops = parse_pipeline(doc)
    assert ops[1].input_ids == ["src"]          # default chain wiring
    assert ops[2].input_ids == ["src", "lim"]
    with pytest.raises(ValueError):
        parse_pipeline({"operators": [
            {"id": "a", "config": {"type": "limit", "n": 1},
             "input_ids": ["missing"]}]})


def test_yaml_pipeline_end_to_end(ray_session, tmp_path):
    """Mirror of the reference engine test (engine/tests/test_execution.py:24-69):
    source → transform chain → assert rows + transforms applied."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": pa.array(range(10), pa.int64()),
                  "output": pa.array([f"sample text {i}" for i in range(10)],
                                     pa.string())}),
        str(tmp_path / "dummy.parquet"),
    )
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "dummy.parquet")}},
        {"id": "upper", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.uppercase_output"}},
        {"id": "bang", "config": {
            "type": "map_batches_function",
            "function": "tests.yaml_udfs.add_exclamation"}},
    ]}
    out = run_pipeline(doc).to_pandas().sort_values("id")
    assert len(out) == 10
    assert out.output.iloc[0] == "SAMPLE TEXT 0!"


def test_yaml_sharded_jsonl_source(ray_session, tmp_path):
    """The dclm-source YAML grammar: num_shards + seed select shards
    deterministically; the resilient read returns their rows."""
    import gzip
    import json

    for s in range(4):
        with gzip.open(tmp_path / f"shard-{s}.jsonl.gz", "wt") as f:
            for i in range(5):
                f.write(json.dumps({"doc_id": s * 5 + i, "text": f"d{i}"}) + "\n")
    doc = {"operators": [
        {"id": "src", "config": {
            "type": "sharded_jsonl_source", "path": str(tmp_path),
            "num_shards": 2, "seed": 314, "columns": ["doc_id"],
            "shard_path_col": "shard"}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 10                       # 2 shards × 5 rows
    assert out["shard"].nunique() == 2
    out2 = run_pipeline(doc).to_pandas()        # seeded → same selection
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_quantile_summary_merge_accuracy():
    import numpy as np

    from open_thoughts_ray.ops.sketch import QuantileSummary

    rng = np.random.default_rng(7)
    vals = rng.lognormal(0.0, 2.0, size=1_000_000)
    blocks = np.array_split(vals, 37)
    summaries = [QuantileSummary.from_values(b, 1024) for b in blocks]
    merged = QuantileSummary.merge_all(summaries, 1024)
    assert merged.n == len(vals)
    # bounded driver state: the merged summary is ≤1024 points
    assert len(merged.points) <= 1024
    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = merged.quantile(q)
        # rank error ≤ 0.5 %
        rank = np.searchsorted(srt, est) / len(vals)
        assert abs(rank - q) < 0.005, (q, rank)


def test_quantile_summary_exact_small():
    import numpy as np

    from open_thoughts_ray.ops.sketch import QuantileSummary

    vals = np.asarray([3.0, 1.0, 4.0, 1.5, 9.0, 2.6])
    s = QuantileSummary.from_values(vals, 1024)
    for q in (0.0, 0.25, 0.5, 0.77, 1.0):
        assert s.quantile(q) == float(np.quantile(vals, q, method="linear"))


def test_distributed_quantile_bounded(ray_session):
    """Sketch path at 10^6 rows: driver never holds the value column."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.ops.relational import global_quantile_threshold

    rng = np.random.default_rng(3)
    n = 1_000_000
    df = pd.DataFrame({"v": rng.exponential(5.0, size=n)})
    ds = rd.from_pandas(df).repartition(16)
    out, thr = global_quantile_threshold(ds, "v", 0.9, exact_threshold=100_000)
    true_thr = float(np.quantile(df.v.to_numpy(), 0.9, method="linear"))
    # approximate threshold within 0.5% rank error
    rank = (df.v.to_numpy() <= thr).mean()
    assert abs(rank - 0.9) < 0.005, (thr, true_thr, rank)
    kept = out.count()
    assert abs(kept / n - 0.1) < 0.006


def test_yaml_repartition_and_dedup_ops(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    pq.write_table(
        pa.table({"id": pa.array([3, 1, 2, 1, 3], pa.int64()),
                  "k": pa.array(list("aabba"))}),
        str(tmp_path / "t.parquet"),
    )
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "t.parquet")}},
        {"id": "shard", "config": {"type": "repartition", "num_blocks": 3}},
        {"id": "dedup", "config": {"type": "dedup_exact",
                                   "key_columns": ["k"], "order_column": "id"}},
    ]}
    out = run_pipeline(doc).to_pandas().sort_values("k")
    assert out.id.tolist() == [1, 1]  # min id per key, across 3 blocks


def test_distinct_ngram_ratio_approx_matches_exact(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.consensus import (
        distinct_ngram_ratio,
        distinct_ngram_ratio_approx,
    )

    rng = np.random.default_rng(4)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, 20)) for _ in range(600)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(8)
    exact = distinct_ngram_ratio(ds, n=2)
    approx = distinct_ngram_ratio_approx(ds, n=2)
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_repartition_by_length_homogeneous_blocks(ray_session):
    import ray
    import ray.data as rd

    from open_thoughts_ray.ops.relational import repartition_by_length

    rng = np.random.default_rng(2)
    texts = ["x" * int(l) for l in rng.lognormal(3, 1.2, size=2000)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    out = repartition_by_length(ds, "text", blocks_per_cpu=2).materialize()
    # no rows lost, helper column dropped
    assert out.count() == 2000
    assert out.schema().names == ["text"]
    # blocks are length-contiguous: each block's length range must not
    # overlap its neighbors' (global sort by length)
    ranges = []
    for bundle in out.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            blk = ray.get(ref)
            if isinstance(blk, pa.Table):
                lens = [len(t) for t in blk.column("text").to_pylist()]
            else:
                lens = [len(t) for t in blk["text"]]
            if lens:
                ranges.append((min(lens), max(lens)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2 or lo1 == lo2  # contiguous, ties allowed


def test_yaml_dedup_family_ops(ray_session, tmp_path):
    """YAML surface for the text dedup family + decontaminate
    (the reference's YAML-first usage of its dedup UDFs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    path = str(tmp_path / "docs.parquet")
    texts = ["aa bb cc dd ee ff gg hh", "aa bb cc dd ee ff gg zz",
             "mm nn oo pp qq rr ss tt"]
    pq.write_table(pa.table({"doc_id": [1, 2, 3], "text": texts}), path)
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "dedup", "config": {"type": "dedup_ngram_jaccard",
                                   "threshold": 0.5}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]  # 2 is a near-copy of 1

    doc2 = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "decon", "config": {"type": "decontaminate",
                                   "benchmark_texts": [texts[2]],
                                   "overlap_threshold": 0.5}},
    ]}
    out2 = run_pipeline(doc2).to_pandas()
    assert sorted(out2["doc_id"]) == [1, 2]  # 3 matches the benchmark

    doc3 = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "mh", "config": {"type": "dedup_minhash", "threshold": 0.5,
                                "bands": 32, "num_hashes": 64}},
    ]}
    out3 = run_pipeline(doc3).to_pandas()
    assert 3 in set(out3["doc_id"])  # distinct doc always survives


def test_self_bleu_matches_naive(ray_session):
    """Distributed Self-BLEU equals the O(N²·V) textbook computation:
    per-doc modified n-gram precision clipped against the best OTHER
    doc, geometric mean of p1..p2, micro-unit floor, mean over ALL docs
    (empty docs contribute 0)."""
    import math
    from collections import Counter

    import ray.data as rd

    from open_thoughts_ray.ops.consensus import self_bleu

    texts = ["the cat sat on the mat", "the cat sat on a mat",
             "dogs run fast", "the mat sat", "", "unique words only here",
             "the cat sat on the mat"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = self_bleu(rd.from_pandas(docs))

    def grams(t, n):
        toks = t.split(" ") if t else []
        return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))

    total = 0
    for i, t in enumerate(texts):
        ps = []
        for n in (1, 2):
            c = grams(t, n)
            tot = sum(c.values())
            if tot == 0:
                ps = None
                break
            others = [grams(u, n) for j, u in enumerate(texts) if j != i]
            clip = sum(min(v, max(o.get(g, 0) for o in others))
                       for g, v in c.items())
            ps.append(clip / tot)
        if ps and all(p > 0 for p in ps):
            total += math.floor(math.sqrt(ps[0] * ps[1]) * 1_000_000)
    expect = total / (1_000_000 * len(texts))
    assert got == pytest.approx(expect, abs=0)


def test_js_divergence_matches_direct(ray_session):
    """Distributed JSD equals a direct scipy-style computation, and the
    identical-corpus / disjoint-corpus limits hold (0 and ln 2)."""
    import math

    import ray.data as rd

    from collections import Counter

    from open_thoughts_ray.ops.consensus import js_divergence

    a_texts = ["a a b c", "b b d"]
    b_texts = ["a c c", "e e b"]
    dsa = rd.from_pandas(pd.DataFrame({"text": a_texts}))
    dsb = rd.from_pandas(pd.DataFrame({"text": b_texts}))
    got = js_divergence(dsa, dsb)

    ca = Counter(t for s in a_texts for t in s.split(" "))
    cb = Counter(t for s in b_texts for t in s.split(" "))
    A, B = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    expect = 0.0
    for t in vocab:
        p = ca.get(t, 0) / A
        q = cb.get(t, 0) / B
        m = (p + q) / 2
        if p:
            expect += 0.5 * p * math.log(p / m)
        if q:
            expect += 0.5 * q * math.log(q / m)
    assert got == pytest.approx(expect, abs=1e-12)

    same = rd.from_pandas(pd.DataFrame({"text": a_texts}))
    assert js_divergence(dsa, same) == pytest.approx(0.0, abs=1e-12)
    disj_a = rd.from_pandas(pd.DataFrame({"text": ["x x y"]}))
    disj_b = rd.from_pandas(pd.DataFrame({"text": ["z w w"]}))
    assert js_divergence(disj_a, disj_b) == pytest.approx(math.log(2),
                                                          abs=1e-12)


def test_dedup_keep_best_and_bow_fingerprint(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import (bow_fingerprint_batch,
                                             dedup_keep_best)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        # docs 0/1/3 are token permutations of each other → one cluster
        "text": ["b a c", "c b a", "unique words here", "a b c", "b a c x"],
        "quality": [5, 9, 1, 9, 2],
    })
    fp = rd.from_pandas(df).map_batches(bow_fingerprint_batch,
                                        batch_format="pyarrow")
    out = dedup_keep_best(fp, ["bow_fp"], ["quality", "doc_id"],
                          ascending=[False, True]).to_pandas()
    kept = sorted(out["doc_id"].tolist())
    # cluster {0,1,3}: max quality 9 tied between 1 and 3 → min doc_id 1
    assert kept == [1, 2, 4]


def test_geometry_gate_metadata_only(ray_session):
    import pyarrow as pa

    from open_thoughts_ray.ops.multimodal import geometry_gate_batch

    batch = pa.table({
        "image_id": ["ok", "tiny", "extreme", "big"],
        # bytes column intentionally bogus: the gate must never read it
        "bytes": [b"x", b"y", b"z", b"w"],
        "w": pa.array([64, 8, 300, 4096], pa.int32()),
        "h": pa.array([48, 64, 20, 4096], pa.int32()),
    })
    ann = geometry_gate_batch(batch, min_side=16, max_aspect=3.0)
    assert ann.column("geom_keep").to_pylist() == [True, False, False, True]
    filt = geometry_gate_batch(batch, min_side=16, max_aspect=3.0,
                               mode="filter")
    assert filt.column("image_id").to_pylist() == ["ok", "big"]
    # min_pixels rule
    ann2 = geometry_gate_batch(batch, min_side=1, max_aspect=100.0,
                               min_pixels=5000)
    assert ann2.column("geom_keep").to_pylist() == [False, False, True, True]


def test_yaml_r3_ops(ray_session, tmp_path):
    """YAML surface for the round-3 additions: boilerplate removal,
    intra-doc line dedup, normalizers, TF-IDF."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    path = str(tmp_path / "docs.parquet")
    boiler = "one two three four five six"
    pq.write_table(pa.table({
        "doc_id": [1, 2, 3],
        "text": [boiler + " u1 u2 u3 u4 u5 u6",
                 boiler + " w1 w2 w3 w4 w5 w6",
                 "solo doc nothing shared here now"],
        "score": pa.array([1.0, 2.0, 4.0], pa.float64()),
    }), path)

    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "bp", "config": {"type": "boilerplate_removal"}},
    ]}
    out = run_pipeline(doc).to_pandas().sort_values("doc_id")
    assert out["clean_text"].tolist() == [
        "u1 u2 u3 u4 u5 u6", "w1 w2 w3 w4 w5 w6",
        "solo doc nothing shared here now"]

    doc2 = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "z", "config": {"type": "minmax_normalize",
                               "column": "score",
                               "output_column": "s01"}},
    ]}
    out2 = run_pipeline(doc2).to_pandas().sort_values("doc_id")
    assert out2["s01"].tolist() == [0.0, 1.0 / 3.0, 1.0]

    doc3 = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "kw", "config": {"type": "tfidf_top_terms", "k": 1}},
    ]}
    out3 = run_pipeline(doc3).to_pandas()
    assert len(out3) == 3 and set(out3.columns) == {"doc_id", "term", "score"}


def test_ks_statistic_direct(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import ks_statistic

    a = pd.DataFrame({"v": [1, 1, 2, 3]})
    b = pd.DataFrame({"v": [2, 3, 3, 4]})
    got = ks_statistic(rd.from_pandas(a), rd.from_pandas(b), "v")
    # ECDF_a: 1→.5, 2→.75, 3→1, 4→1 ; ECDF_b: 1→0, 2→.25, 3→.75, 4→1
    assert got == pytest.approx(0.5, abs=1e-15)
    same = ks_statistic(rd.from_pandas(a), rd.from_pandas(a), "v")
    assert same == pytest.approx(0.0, abs=1e-15)


def test_pmi_top_bigrams(ray_session):
    import math

    import ray.data as rd

    from open_thoughts_ray.ops.consensus import pmi_top_bigrams

    # "new york" always adjacent (strong collocation); filler varies
    docs = ["new york a b", "new york c d", "new york e f",
            "a c new york", "b d new york", "e c new york"]
    out = pmi_top_bigrams(rd.from_pandas(pd.DataFrame({"text": docs})),
                          k=3, min_count=3).to_pandas()
    assert out.iloc[0][["w1", "w2"]].tolist() == ["new", "york"]
    # direct PMI for (new, york): c_xy=6, B=18, c_new=c_york=6, T=24
    exp = math.log((6 / 18) / ((6 / 24) * (6 / 24)))
    assert out.iloc[0]["pmi"] == math.floor(exp * 1e6) / 1e6


def test_pmi_join_path_equals_broadcast(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.consensus import pmi_top_bigrams

    docs = ["new york a b", "new york c d", "new york e f",
            "a c new york", "b d new york", "e c new york"]
    ds = pd.DataFrame({"text": docs})
    small = pmi_top_bigrams(rd.from_pandas(ds), k=5,
                            min_count=2).to_pandas()
    joined = pmi_top_bigrams(rd.from_pandas(ds), k=5, min_count=2,
                             max_driver_vocab=0).to_pandas()
    pd.testing.assert_frame_equal(small, joined, check_dtype=False)


def test_example_crawl_cleanup_yaml(ray_session, tmp_path):
    """examples/crawl_cleanup.yaml: the CCNet/C4-shaped text path —
    boilerplate strip → intra-doc line dedup → normalize-free near-dup
    collapse → hash split — over a synthetic crawl."""
    import json as _json

    import yaml

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    boiler = "cookie notice accept all terms here"
    rows = []
    for i in range(12):
        uniq = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append({"doc_id": i, "text": boiler + " " + uniq})
    # near-copy of doc 0 (differs in one trailing token after cleanup)
    rows.append({"doc_id": 50,
                 "text": boiler + " " + " ".join(
                     f"w0x{j}" for j in range(11)) + " zz"})
    src = tmp_path / "crawl.jsonl"
    with open(src, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    doc = yaml.safe_load(
        open("examples/crawl_cleanup.yaml").read().replace(
            "{input_path}", str(src)))
    out = run_pipeline(doc).to_pandas()
    # boilerplate stripped everywhere, near-copy collapsed to doc 0
    assert not out.text.str.contains("cookie").any()
    assert 50 not in set(out.doc_id)
    assert set(out.split) <= {"train", "val", "test"}
    assert len(out) == 12


def test_yaml_retrieval_stack(ray_session, tmp_path):
    """YAML surface for the retrieval family: hybrid RRF candidates
    feeding a rerank op via explicit DAG inputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["hash join engines", "hash hash join join hash",
                 "sort merge only", "nothing here"],
    }), path)
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source", "path": path}},
        {"id": "hyb", "config": {"type": "hybrid_rrf_topk", "k": 3,
                                 "queries": {0: ["hash", "join"]}}},
        {"id": "rerank", "input_ids": ["src", "hyb"],
         "config": {"type": "rerank_token_f1", "k": 2,
                    "queries": {0: ["hash", "join"]}}},
    ]}
    out = run_pipeline(doc).to_pandas().sort_values("rank")
    assert len(out) == 2
    # doc 1's distinct tokens are exactly the query set -> F1 = 1.0
    assert out.iloc[0]["doc_id"] == 1
    assert out.iloc[0]["f1"] == 1.0


def test_yaml_reference_vocabulary(ray_session, tmp_path):
    """A strategy file written in the REFERENCE's own type names
    (hf_source / cpu_function via alias / fasttext / shard / truncate /
    remove_columns) must run under this grammar."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(
                ["the quick brown fox jumps over the lazy dog"] * 30,
                pa.string()),
            "extra": pa.array(["x"] * 30, pa.string()),
        }),
        str(tmp_path / "docs.parquet"),
    )
    doc = {"operators": [
        {"id": "src", "config": {
            "type": "hf_source", "dataset": str(tmp_path / "docs.parquet"),
            "source_tag": "unit"}},
        {"id": "drop", "config": {
            "type": "remove_columns", "columns": ["extra"]}},
        {"id": "ft", "config": {
            "type": "fasttext", "input_column": "text",
            "just_add_scores": True, "batch_size": 16}},
        {"id": "reshard", "config": {"type": "shard", "num_shards": 2}},
        {"id": "head", "config": {"type": "truncate", "num_truncate": 7}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 7
    assert "lang" in out.columns and "lang_conf" in out.columns
    assert "extra" not in out.columns
    assert set(out.source) == {"unit"}


def test_yaml_fasttext_path_real_bin(ray_session, tmp_path):
    """``fasttext_path`` loads a REAL-format .bin through the fcntl node
    cache (the reference's lid.176.bin path, fasttext_operator.py:193-281)
    and filters by target_label like the reference surface."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.fixtures.textgen import langid_corpus
    from open_thoughts_ray.models import artifacts

    texts, labels = langid_corpus(n_per_lang=25, seed=77)
    pq.write_table(
        pa.table({"text": pa.array(texts, pa.string()),
                  "true_lang": pa.array(labels, pa.string())}),
        str(tmp_path / "docs.parquet"),
    )
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "docs.parquet")}},
        {"id": "ft", "config": {
            "type": "fasttext", "input_column": "text",
            "fasttext_path": artifacts.langid_bin_path(),
            "target_label": "en", "filter_threshold": 0.5}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 25
    assert set(out.true_lang) == {"en"}
    assert (out.lang == "en").all() and (out.lang_conf >= 0.5).all()


def test_yaml_fasttext_hf_repo_is_network_seam(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"text": ["hi"]}), str(tmp_path / "d.parquet"))
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "d.parquet")}},
        {"id": "ft", "config": {"type": "fasttext", "input_column": "text",
                                "hf_repo_id": "facebook/fasttext-lid"}},
    ]}
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="swap seam"):
        run_pipeline(doc)


def test_yaml_train_fasttext_and_filter(ray_session, tmp_path):
    """train_fasttext emits a model artifact row; fasttext filtering by
    target_label keeps only confident rows of that label."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"text": pa.array(["guten tag wie geht es dir"] * 20
                                   + ["hello how are you today friend"] * 20,
                                   pa.string())}),
        str(tmp_path / "mix.parquet"),
    )
    doc = {"operators": [
        {"id": "pos", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "mix.parquet"),
                                 "limit": 20}},
        {"id": "neg", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "mix.parquet")}},
        {"id": "train", "input_ids": ["pos", "neg"], "config": {
            "type": "train_fasttext", "input_column": "text",
            "output_path": str(tmp_path / "model.bin")}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 1 and out.n_bytes.iloc[0] > 0
    import os as _os

    assert _os.path.exists(tmp_path / "model.bin")


def test_yaml_embedding_similarity_filtering(ray_session, tmp_path):
    """embedding → similarity_filtering in reference vocabulary: the
    duplicated text collapses to one survivor per distinct content."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["alpha beta gamma"] * 3
                             + ["totally different words here"] * 3,
                             pa.string()),
        }),
        str(tmp_path / "dup.parquet"),
    )
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "dup.parquet")}},
        {"id": "emb", "config": {"type": "embedding",
                                 "input_column": "text"}},
        {"id": "sim", "config": {"type": "similarity_filtering",
                                 "similarity_threshold": 0.99,
                                 "id_column": "vec_id",
                                 "embedding_column": "embedding"}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert sorted(out.vec_id) == [0, 3]  # first of each identical group


def test_yaml_multimodal_family(ray_session, tmp_path):
    """YAML grammar for the audio/video/image stage family."""
    import numpy as np
    import pyarrow.parquet as pq

    from open_thoughts_ray.ops.audio import encode_pcm
    from open_thoughts_ray.ops.video import encode_video
    from open_thoughts_ray.yaml_pipeline import run_pipeline

    rng = np.random.default_rng(3)
    # audio: one loud 1-s clip, one silent clip (gate must drop it)
    loud = (rng.standard_normal(16000) * 8000).astype(np.int16)
    silent = np.zeros(16000, dtype=np.int16)
    pq.write_table(pa.table({
        "clip_id": pa.array(["loud", "silent"], pa.string()),
        "bytes": pa.array([encode_pcm(loud, 16000),
                           encode_pcm(silent, 16000)], pa.binary()),
    }), tmp_path / "audio.parquet")
    out = run_pipeline({"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "audio.parquet")}},
        {"id": "gate", "config": {"type": "audio_energy_gate"}},
        {"id": "feat", "config": {"type": "audio_features"}},
    ]}).to_pandas()
    assert list(out.clip_id) == ["loud"]
    assert "audio_feat" in out.columns

    # video: 12 frames, sample every 4 → 3 frame rows; scene cuts run
    frames = rng.integers(0, 256, size=(12, 8, 8, 3)).astype(np.uint8)
    pq.write_table(pa.table({
        "video_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([encode_video(frames)], pa.binary()),
    }), tmp_path / "video.parquet")
    out2 = run_pipeline({"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "video.parquet")}},
        {"id": "frames", "config": {"type": "video_frame_sample",
                                    "every_n": 4}},
    ]}).to_pandas()
    assert len(out2) == 3
    out3 = run_pipeline({"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "video.parquet")}},
        {"id": "cuts", "config": {"type": "video_scene_cuts"}},
    ]}).to_pandas()
    assert out3.n_frames.iloc[0] == 12


def test_yaml_source_filter_pushdown(ray_session, tmp_path):
    """YAML ``filter:`` conjuncts push into the read: lance_source
    prunes fragments from the manifest zone maps; hf_source on plain
    parquet pushes the same predicate into the scan."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.io import lance_table as LT

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "lang": pa.array((["en"] * 50) + (["de"] * 50), pa.string()),
    })
    frags = [LT.write_fragment(str(tmp_path / "lance"), i,
                               t.slice(i * 25, 25)) for i in range(4)]
    LT.write_manifest(str(tmp_path / "lance"), frags)
    pq.write_table(t, str(tmp_path / "docs.parquet"))

    flt = [{"column": "doc_id", "op": ">=", "value": 30},
           {"column": "lang", "value": "en"}]   # default op "=="
    doc = {"operators": [
        {"id": "src", "config": {"type": "lance_source",
                                 "path": str(tmp_path / "lance"),
                                 "filter": flt}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert sorted(out.doc_id) == list(range(30, 50))

    doc2 = {"operators": [
        {"id": "src", "config": {"type": "hf_source",
                                 "dataset": str(tmp_path / "docs.parquet"),
                                 "filter": [["doc_id", "<", 10]]}},
    ]}
    out2 = run_pipeline(doc2).to_pandas()
    assert sorted(out2.doc_id) == list(range(10))
