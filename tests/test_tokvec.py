"""Vectorized token kernels (ops/tokvec.py) vs the per-row reference
loops they replaced — exact parity on both empty-text conventions
(VERDICT r4 #5)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from open_thoughts_ray.ops.retrieval import _term_freqs
from open_thoughts_ray.ops.tokvec import (
    distinct_pair_df_table,
    partial_token_counts_table,
    token_lengths,
)


def _corpus(seed=3, n=3000):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        m = int(rng.integers(0, 40))
        if m == 0:
            texts.append("" if i % 3 else None)
        else:
            toks = [f"w{int(v)}" for v in rng.integers(0, 120, m)]
            if i % 7 == 0:
                toks.insert(1, "")  # double-space artifact
            texts.append(" ".join(toks))
    return texts


def test_term_freqs_parity():
    texts = _corpus()
    terms = [f"w{i}" for i in range(0, 120, 5)]
    idx = {t: j for j, t in enumerate(terms)}
    tf_ref = np.zeros((len(texts), len(terms)), np.int64)
    dl_ref = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else []
        dl_ref[i] = len(toks)
        for tok in toks:
            j = idx.get(tok)
            if j is not None:
                tf_ref[i, j] += 1
    tf, dl = _term_freqs(pa.array(texts, pa.string()), terms)
    assert (tf == tf_ref).all() and (dl == dl_ref).all()


def test_partial_token_counts_parity():
    texts = _corpus(seed=5)
    ref: dict = {}
    for t in texts:
        for tok in (t or "").split(" "):
            ref[tok] = ref.get(tok, 0) + 1
    out = partial_token_counts_table(pa.array(texts, pa.string()))
    got = dict(zip(out.column("token").to_pylist(),
                   out.column("c").to_pylist()))
    assert got == ref


def test_distinct_pair_df_parity():
    texts = _corpus(seed=7)
    ref: dict = {}
    for t in texts:
        for tok in set((t or "").split(" ")):
            ref[tok] = ref.get(tok, 0) + 1
    out = distinct_pair_df_table(pa.array(texts, pa.string()))
    got = dict(zip(out.column("term").to_pylist(),
                   out.column("c").to_pylist()))
    assert got == ref


def test_token_lengths_both_conventions():
    texts = _corpus(seed=9)
    col = pa.array(texts, pa.string())
    got0 = token_lengths(col, empty_as_token=False)
    got1 = token_lengths(pc.fill_null(col, ""), empty_as_token=True)
    ref0 = np.asarray([len(t.split(" ")) if t else 0 for t in texts])
    ref1 = np.asarray([len((t or "").split(" ")) for t in texts])
    assert (got0 == ref0).all() and (got1 == ref1).all()


def test_quality_and_gopher_vectorized_parity():
    """Vectorized quality/gopher kernels vs the per-row Counter loops
    they replaced (adversarial corpus: empties, nulls, repeats,
    newline duplicates)."""
    from collections import Counter

    from open_thoughts_ray.ops.textstats import (
        gopher_repetition_batch,
        quality_stats_batch,
    )

    rng = np.random.default_rng(17)
    texts = []
    for i in range(2000):
        m = int(rng.integers(0, 50))
        if m == 0:
            texts.append("" if i % 3 else None)
            continue
        t = " ".join(f"w{int(x)}" for x in rng.integers(0, 25, m))
        if i % 5 == 0:
            t += "\nline one\nline one\nother"
        if i % 11 == 0:
            t = t + " " + t
        texts.append(t)
    batch = pa.table({"text": pa.array(texts, pa.string())})

    qs = quality_stats_batch(batch)
    g = gopher_repetition_batch(batch)
    q = lambda v: np.floor(np.asarray(v) * 1e6) / 1e6
    for i, t in enumerate(texts):
        toks = t.split(" ") if t else []
        nt = len(toks)
        assert qs.column("n_tokens")[i].as_py() == nt
        assert qs.column("n_unique")[i].as_py() == len(set(toks))
        tb = dt = dl = 0.0
        if nt >= 2:
            tb = 2.0 * max(Counter(zip(toks, toks[1:])).values()) / nt
        if nt >= 3:
            c3 = Counter(zip(toks, toks[1:], toks[2:]))
            dt = sum(v for v in c3.values() if v > 1) / (nt - 2)
        lines = t.split("\n") if t else []
        if lines:
            dl = (len(lines) - len(set(lines))) / len(lines)
        assert g.column("top_bigram_frac")[i].as_py() == q([tb])[0]
        assert g.column("dup_trigram_frac")[i].as_py() == q([dt])[0]
        assert g.column("dup_line_frac")[i].as_py() == q([dl])[0]
