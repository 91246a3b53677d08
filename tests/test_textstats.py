"""Gopher-style repetition signals (ops/textstats.py) — kernel math on
hand-computed cases and the filter op on planted repetitive docs."""
import numpy as np
import pandas as pd
import pyarrow as pa

from open_thoughts_ray.ops.textstats import (gopher_repetition_batch,
                                             gopher_repetition_filter)


def _sig(text: str) -> dict:
    t = gopher_repetition_batch(pa.table({"text": [text]}))
    return {c: t.column(c)[0].as_py()
            for c in ("dup_line_frac", "top_bigram_frac", "dup_trigram_frac")}


def test_gopher_kernel_hand_computed():
    # "a b a b a b": 6 tokens, bigrams (a,b)x3 (b,a)x2 -> top 2*3/6 = 1.0
    # trigrams: (a,b,a)x2 (b,a,b)x2 -> all 4 occurrences duplicated -> 4/4
    s = _sig("a b a b a b")
    assert s["top_bigram_frac"] == 1.0
    assert s["dup_trigram_frac"] == 1.0
    assert s["dup_line_frac"] == 0.0

    # all-distinct tokens: top bigram count 1 -> 2/5; no dup trigrams
    s = _sig("a b c d e")
    assert abs(s["top_bigram_frac"] - np.floor(2 / 5 * 1e6) / 1e6) < 1e-12
    assert s["dup_trigram_frac"] == 0.0

    # duplicate lines
    s = _sig("x y\nx y\nz w")
    assert abs(s["dup_line_frac"] - np.floor(1 / 3 * 1e6) / 1e6) < 1e-12

    # degenerate docs
    assert _sig("")["top_bigram_frac"] == 0.0
    assert _sig("solo")["dup_trigram_frac"] == 0.0


def test_gopher_filter_drops_planted(ray_session):
    import ray.data as rd

    clean = [{"doc_id": i,
              "text": " ".join(f"w{i}_{j}" for j in range(20))}
             for i in range(10)]
    spam = [{"doc_id": 100, "text": "buy now " * 30},
            {"doc_id": 101, "text": "line\nline\nline\nother"}]
    out = gopher_repetition_filter(
        rd.from_pandas(pd.DataFrame(clean + spam))).to_pandas()
    ids = set(out.doc_id)
    assert all(r["doc_id"] in ids for r in clean)
    assert 100 not in ids and 101 not in ids


def test_corpus_profile(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from collections import Counter

    from open_thoughts_ray.ops.textstats import corpus_profile

    texts = ["a a b", "b c", "a"]
    p = corpus_profile(rd.from_pandas(pd.DataFrame({"text": texts})))
    assert p["n_docs"] == 3
    assert p["n_tokens"] == 6
    assert p["n_chars"] == sum(len(t) for t in texts)
    assert p["distinct_tokens"] == 3
    c = Counter(t for s in texts for t in s.split(" "))
    tot = sum(c.values())
    exp = -sum(v / tot * math.log(v / tot) for v in c.values())
    assert abs(p["token_entropy"] - exp) < 1e-9


def test_compression_ratio_signal(ray_session):
    import pyarrow as pa

    from open_thoughts_ray.ops.textstats import (compression_ratio_batch,
                                                 compression_ratio_filter)

    batch = pa.table({"text": ["spam " * 500,                  # repetitive
                               "the quick brown fox jumps over the lazy dog "
                               "while reading diverse literature quietly",
                               ""]})
    out = compression_ratio_batch(batch)
    r = out.column("zlib_ratio").to_pylist()
    assert r[0] < 0.05          # pure repetition compresses away
    assert r[1] > 0.5           # prose does not
    assert r[2] == 1.0          # empty sentinel

    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["spam " * 500, "normal prose with variety"]})
    kept = compression_ratio_filter(rd.from_pandas(df), min_ratio=0.25,
                                    max_ratio=1.5).to_pandas()
    assert kept["doc_id"].tolist() == [1]
