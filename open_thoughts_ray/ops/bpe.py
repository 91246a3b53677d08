"""BPE tokenizer training over a document corpus.

Sennrich et al. 2016 byte-pair encoding, Ray-Data-first with the same
split the classifier/LM trainers use (ops/embed.py, ops/perplexity.py):
the CORPUS-sized work — word frequency counting — is one per-batch
partial pass folded by a grouped Sum (shuffle carries (word, count)
partials, never rows), and the MODEL-sized work — the merge loop — runs
on the driver over the {word: count} dict (≈10M entries for web text,
the same order as the vocabulary any tokenizer trainer must hold).

Determinism: the merge chosen each round is (max pair count, then
lexicographically smallest pair) — no insertion-order dependence, so
the trained merge list is a pure function of the word-count multiset
and therefore identical under any partitioning (asserted in tests).

``bpe_encode`` applies the merges greedily in training order — the
standard BPE segmenter; the end-of-word marker ``</w>`` keeps suffixes
distinct from prefixes.
"""

from __future__ import annotations

import pyarrow as pa

EOW = "</w>"


def word_counts(ds, text_col: str = "text"):
    """Dataset[(word, n)] — distributed word frequencies (single-space
    split, the corpus convention)."""
    from ray.data.aggregate import Sum

    from .dedup_text import _auto_partitions

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for x in t.column(text_col).to_pylist():
            for w in (x or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table({"word": pa.array(list(counts.keys()), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word", num_partitions=_auto_partitions(None)) \
        .aggregate(Sum("n", alias_name="n"))


def merges_from_word_counts(counts: dict[str, int],
                            num_merges: int) -> list[tuple[str, str]]:
    """Serial BPE merge loop over a word-frequency dict (driver-side,
    model-sized).  Returns the ordered merge list."""
    seqs: list[list[str]] = [list(w) + [EOW] for w in counts]
    ns = list(counts.values())
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, n in zip(seqs, ns):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        # deterministic: max count, ties -> lexicographically SMALLEST
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for i, seq in enumerate(seqs):
            j = 0
            out = []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[i] = out
    return merges


def train_bpe(ds, text_col: str = "text", num_merges: int = 100,
              max_driver_words: int = 10_000_000) -> list[tuple[str, str]]:
    """Distributed-count BPE training: one word-count shuffle, then the
    merge loop on the bounded {word: count} dict."""
    wc = word_counts(ds, text_col).to_pandas()  # bounded: word vocab
    if len(wc) > max_driver_words:
        raise ValueError(
            f"word vocabulary {len(wc)} exceeds max_driver_words="
            f"{max_driver_words}; pre-truncate rare words first")
    counts = dict(zip(wc["word"], wc["n"].astype(int)))
    return merges_from_word_counts(counts, num_merges)


def bpe_encode(text: str | None, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy BPE segmentation applying merges in training order."""
    out: list[str] = []
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in (text or "").split(" "):
        if not w:
            continue
        seq = list(w) + [EOW]
        while len(seq) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(seq, seq[1:])):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            seq = seq[:best_i] + [seq[best_i] + seq[best_i + 1]] \
                + seq[best_i + 2:]
        out.extend(seq)
    return out


def bpe_token_count_batch(batch: pa.Table, merges, text_col: str = "text",
                          out: str = "n_bpe_tokens") -> pa.Table:
    """Per-row token count under a trained merge list — the vocabulary
    fit metric (tokens/byte) curation tracks per corpus slice."""
    counts = [len(bpe_encode(x, merges))
              for x in batch.column(text_col).to_pylist()]
    return batch.append_column(out, pa.array(counts, pa.int64()))
