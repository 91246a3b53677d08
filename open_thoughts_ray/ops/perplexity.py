"""Perplexity-scoring actor-pool stage (KenLM-style quality signal).

Same actor-pool shape as the langid stage: LM loaded once per actor from
a broadcast ref, batches scored in ``__call__``.  Cost is ∝ tokens, not
rows — the caption-length skew called out in the north rule — so the
pipeline uses a smaller ``batch_size`` here and lets Ray's streaming
executor balance batches across the pool (a length-aware repartition
helper lives in ops.relational.repartition_by_length for extreme skew).
"""

from __future__ import annotations

import pyarrow as pa


class PerplexityScorer:
    def __init__(self, model_ref=None, model_bytes: bytes | None = None,
                 text_column: str = "caption"):
        from ..models.ngram_lm import BigramLM

        if model_bytes is None:
            import ray

            model_bytes = ray.get(model_ref)
        self.lm = BigramLM.from_bytes(model_bytes)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ppl = self.lm.perplexity_batch(texts)
        return batch.append_column("ppl", pa.array(ppl, pa.float32()))


def train_bigram_lm_distributed(ds, text_col: str = "text",
                                order_col: str = "doc_id") -> bytes:
    """Distributed BigramLM fit — `BigramLM.train` at 100-TB scale with
    NO driver text collect, bit-identical to the serial fit over the
    corpus sorted ascending by ``order_col``.

    The model is pure counts (interpolated unigram/bigram with a
    first-appearance-ordered vocab), and counts are mergeable sums, so
    the fit distributes exactly (the train_text_classifier_distributed
    pattern, ops/embed.py):

    1. one ``map_batches`` pass emits per-batch SPARSE partials — one
       row per distinct token (typ 0: unigram count + min first-seen
       position ``order·2³² + tok_idx``) and per distinct bigram
       (typ 1: count over (prev, tok) token STRINGS — ids are
       order-dependent, strings are not);
    2. one ``groupby(prev, tok)`` shuffle folds them (Sum counts, Min
       positions) — payload O(batches × distinct grams/batch), never
       corpus-sized;
    3. the driver sorts tokens by global first-seen position (exactly
       the serial fit's insertion order), scatters the counts, and
       serializes via the canonical ``to_bytes``.

    Driver state is O(V + #distinct bigrams) — the model itself.
    ``order_col`` must be an integer column < 2³¹ with ≤ 2³² tokens per
    row (position packing)."""
    import numpy as np

    from ray.data.aggregate import Min, Sum

    from ..models.ngram_lm import BigramLM, tokenize

    def partial(t: pa.Table) -> pa.Table:
        uni: dict[str, int] = {}
        first: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for did, txt in zip(t.column(order_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            toks = tokenize(txt or "")
            prev = None
            for j, tok in enumerate(toks):
                pos = (int(did) << 32) | j
                if tok not in first or pos < first[tok]:
                    first[tok] = pos
                uni[tok] = uni.get(tok, 0) + 1
                if prev is not None:
                    key = (prev, tok)
                    bi[key] = bi.get(key, 0) + 1
                prev = tok
        typ, prev_out, tok_out, cnt, pos_out = [], [], [], [], []
        for tok, c in uni.items():
            typ.append(0)
            prev_out.append("")
            tok_out.append(tok)
            cnt.append(c)
            pos_out.append(first[tok])
        for (p, w), c in bi.items():
            typ.append(1)
            prev_out.append(p)
            tok_out.append(w)
            cnt.append(c)
            pos_out.append(0)
        return pa.table({
            "typ": pa.array(typ, pa.int8()),
            "prev": pa.array(prev_out, pa.string()),
            "tok": pa.array(tok_out, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "pos": pa.array(pos_out, pa.int64()),
        })

    agg = (ds.select_columns([order_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["typ", "prev", "tok"])
           .aggregate(Sum("cnt", alias_name="n"),
                      Min("pos", alias_name="p"))
           .to_pandas())  # O(V + #distinct bigrams): the model's own size
    if agg.empty:
        return BigramLM.train([]).to_bytes()
    u = agg[agg["typ"] == 0]
    order = np.argsort(u["p"].to_numpy(), kind="stable")
    words = u["tok"].to_numpy(dtype=object)[order]
    vocab = {w: i for i, w in enumerate(words)}
    uni = np.zeros(len(vocab), dtype=np.float64)
    uni[[vocab[w] for w in u["tok"]]] = u["n"].to_numpy(dtype=np.float64)
    V = len(vocab)
    b = agg[agg["typ"] == 1]
    bi = {vocab[p] * V + vocab[w]: float(c)
          for p, w, c in zip(b["prev"], b["tok"], b["n"])}
    return BigramLM(vocab, uni, bi, int(uni.sum())).to_bytes()
