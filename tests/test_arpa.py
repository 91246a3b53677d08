"""KenLM-style ARPA n-gram LM: modified Kneser-Ney estimation, format
round-trip, backoff scoring, and distributed-count bit parity.

models/arpa.py is the real-format twin of the Jelinek–Mercer stand-in
(models/ngram_lm.py): ARPA interchange files, Chen & Goodman modified-KN
discounts, standard backoff lookup.
"""

from __future__ import annotations

import numpy as np
import pytest

from open_thoughts_ray.models.arpa import (ArpaLM, count_ngrams,
                                           count_ngrams_distributed)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat chased the dog around the yard",
    "dogs and cats are pets",
    "the mat was on the floor",
    "the cat on the mat was warm",
    "a dog chased a cat",
]


@pytest.mark.parametrize("order", [2, 3])
def test_kn_distribution_sums_to_one(order):
    """The acid test for interpolated-KN + backoff conversion: for
    EVERY context, sum over vocab ∪ {<unk>} of p(w|h) must be exactly
    1 (backoff weight = leftover interpolation mass)."""
    lm = ArpaLM.fit(CORPUS, order=order)
    vocab = [w for (w,) in lm.tables[0] if w not in ("<unk>", "<s>")]
    for n in range(1, order):
        for ctx in lm.tables[n - 1]:
            s = sum(10.0 ** lm.logprob_word(ctx, w) for w in vocab)
            s += 10.0 ** lm.logprob_word(ctx, "zz_unseen")
            assert abs(s - 1.0) < 1e-10, (ctx, s)


def test_backoff_lookup_on_handwritten_arpa():
    """Hand-written ARPA file (spec example shape): listed bigram used
    directly, unlisted one scored as backoff(context) · p(word)."""
    text = """
\\data\\
ngram 1=3
ngram 2=1

\\1-grams:
-0.3979400\ta\t-0.3010300
-0.3010300\tb
-1.0000000\t<unk>

\\2-grams:
-0.0457575\ta b

\\end\\
"""
    lm = ArpaLM.read_arpa(text)
    assert lm.order == 2
    assert abs(lm.logprob_word(("a",), "b") - (-0.0457575)) < 1e-9
    # (a, a) unlisted: backoff(a) + p(a) = -0.30103 + -0.39794
    assert abs(lm.logprob_word(("a",), "a") - (-0.6989700)) < 1e-6
    # unknown word: backoff(a) + p(<unk>)
    assert abs(lm.logprob_word(("a",), "qq") - (-1.3010300)) < 1e-6


@pytest.mark.parametrize("order", [2, 3])
def test_arpa_roundtrip(order):
    lm = ArpaLM.fit(CORPUS, order=order)
    lm2 = ArpaLM.read_arpa(lm.to_arpa())
    a = lm.perplexity_batch(CORPUS)
    b = lm2.perplexity_batch(CORPUS)
    # 7-decimal log10 quantization in the text format
    assert np.allclose(a, b, rtol=1e-5)
    # a rewritten file is byte-identical (canonical sort order)
    assert lm2.to_arpa() == lm.to_arpa()


def test_in_domain_beats_gibberish_and_unk_is_finite():
    lm = ArpaLM.fit(CORPUS, order=2)
    good = lm.perplexity("the cat sat on the mat")
    bad = lm.perplexity("mat floor zzz qqq flurble on cat the")
    assert good < bad
    assert np.isfinite(bad) and bad < 1e6  # no -99 sentinel leakage
    assert np.isfinite(lm.perplexity("totally unseen words only"))


def test_fit_is_deterministic():
    a = ArpaLM.fit(CORPUS, order=3).to_arpa()
    b = ArpaLM.fit(list(CORPUS), order=3).to_arpa()
    assert a == b


@pytest.mark.parametrize("order", [2, 3])
def test_scalar_and_batch_agree(order):
    """The vectorized packed-key kernel must agree bit-for-bit with the
    scalar backoff recursion on every path: listed ngrams, backoff
    through listed/unlisted contexts, OOV tokens anywhere in the
    context window, empty text, and punctuation-only text."""
    lm = ArpaLM.fit(CORPUS, order=order)
    texts = CORPUS + [
        "the cat zorple on the mat",      # OOV mid-sentence
        "zorple the cat",                 # OOV sentence-initial
        "the cat zorple zorple dog",      # adjacent OOVs
        "zorple",                         # single OOV
        "",                               # empty → unk-ppl special case
        "...",                            # strips to empty
        "the",                            # single in-vocab token
        "cat mat dog the a on sat",       # shuffled vocab, unseen ngrams
    ]
    batch = lm.perplexity_batch(texts)
    for i, s in enumerate(texts):
        assert batch[i] == np.float32(lm.perplexity(s)), (order, s)


def test_batch_is_batch_boundary_independent():
    lm = ArpaLM.fit(CORPUS, order=3)
    texts = CORPUS + ["zorple the cat", ""]
    whole = lm.perplexity_batch(texts)
    split = np.concatenate([lm.perplexity_batch(texts[:3]),
                            lm.perplexity_batch(texts[3:])])
    assert np.array_equal(whole, split)


def test_yaml_train_arpa_then_score(ray_session, tmp_path):
    """YAML grammar: train_arpa fits + writes the ARPA file from a
    corpus input; arpa_perplexity loads it and scores/filters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray import yaml_pipeline as Y

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(len(CORPUS))),
                             "text": CORPUS}), src)
    model = tmp_path / "lm.arpa"
    train_doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(src)}},
        {"id": "fit", "input_ids": ["src"],
         "config": {"type": "train_arpa", "order": 2,
                    "output_path": str(model)}},
    ]}
    art = Y.run_pipeline(train_doc).to_pandas()
    assert art.n_bytes[0] > 0 and model.exists()
    # the written file is the canonical serialization of the serial fit
    assert model.read_text() == ArpaLM.fit(CORPUS, order=2).to_arpa()

    score_doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(src)}},
        {"id": "ppl", "input_ids": ["src"],
         "config": {"type": "arpa_perplexity", "arpa_path": str(model),
                    "input_column": "text"}},
    ]}
    out = Y.run_pipeline(score_doc).to_pandas().sort_values("doc_id")
    lm = ArpaLM.read_arpa(model.read_text())
    assert np.array_equal(out.arpa_ppl.to_numpy(),
                          lm.perplexity_batch(CORPUS))
    # ppl_max filter drops high-perplexity rows
    score_doc["operators"][1]["config"]["ppl_max"] = float(
        np.median(out.arpa_ppl))
    kept = Y.run_pipeline(score_doc).to_pandas()
    assert 0 < len(kept) < len(CORPUS)


def test_distributed_counts_bit_parity(ray_session):
    """count_ngrams_distributed must reproduce the serial counter
    exactly, at any block count — and therefore the fitted ARPA model
    is byte-identical."""
    import pandas as pd
    import ray.data as rd

    serial = count_ngrams(CORPUS, 3)
    df = pd.DataFrame({"text": CORPUS})
    for blocks in (1, 7):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        dist = count_ngrams_distributed(ds, "text", 3)
        assert dist == serial, blocks
    assert (ArpaLM.from_counts(dist, 3).to_arpa()
            == ArpaLM.fit(CORPUS, order=3).to_arpa())


def test_count_ngrams_batch_parity():
    """The Arrow-kernel batch counter (count_ngrams_batch) must equal
    the serial dict counter as a multiset, including boundary markers,
    punctuation trim, empty/whitespace-only rows, and the <s>-never-
    predicted unigram rule."""
    import collections

    from open_thoughts_ray.models.arpa import count_ngrams_batch

    texts = list(CORPUS) + [
        "", "   ", "...", '"quoted"  token,', "\t tabs\nand newlines ",
        "<s> literal markers </s>", "MiXeD CaSe!!", "a", "a a a",
    ]
    for order in (1, 2, 3):
        serial = collections.Counter(count_ngrams(texts, order))
        t = count_ngrams_batch(texts, order)
        vec = collections.Counter()
        for g, n in zip(t.column("gram").to_pylist(),
                        t.column("n").to_pylist()):
            vec[tuple(g.split("\x1f"))] += n
        assert serial == vec, order
