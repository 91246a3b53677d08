"""KenLM-style n-gram LM: modified Kneser-Ney estimation + ARPA format.

Closes the "KenLM-style perplexity scorer" north-star surface with the
real public artifacts instead of the Jelinek–Mercer stand-in
(models/ngram_lm.py, which stays the flagship's pinned scorer):

* **Estimation** is interpolated modified Kneser-Ney (Chen & Goodman
  1999, the algorithm KenLM's ``lmplz`` implements): three discounts
  D1/D2/D3+ per order derived from the count-of-counts
  (Y = n1/(n1+2·n2); Dk = k − (k+1)·Y·n_{k+1}/n_k), lower orders
  estimated from CONTINUATION counts (distinct left extensions), and
  the unigram level interpolated with uniform 1/(V+1) so ``<unk>``
  carries mass.
* **Persistence** is the ARPA text format (SRILM/KenLM interchange:
  ``\\data\\`` header with per-order ngram counts, per-order sections of
  ``log10(p) TAB ngram TAB log10(backoff)``, ``\\end\\``) — a model
  written here is readable by KenLM/SRILM tooling and vice versa for
  the supported orders.
* **Scoring** is standard ARPA backoff:
  p(w|h) = p(h,w) if the ngram is listed, else backoff(h)·p(w|h′) —
  vectorized for orders ≤ 3 via packed int64 keys + searchsorted (the
  same kernel shape as BigramLM.perplexity_batch).

Determinism: counts are exact integers, the KN arithmetic runs in one
fixed order over sorted ngram keys, and scoring is elementwise — so a
distributed count collection (``count_ngrams_distributed``: map_batches
partials + one grouped sum) feeds the SAME ``fit`` and yields a model
bit-identical to the serial path at any parallelism
(tests/test_arpa.py).

Scale note: the count table is the only thing that shuffles (thin
(ngram-key, count) rows, pre-aggregated per batch); the fitted model is
O(distinct ngrams) on the driver — at 100-TB corpora cap the vocab
(``max_vocab``) or prune singleton ngrams (``min_count``), both
standard KenLM practice.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

LOG10 = math.log(10.0)
# sentinel log10 prob ARPA uses for entries with "no probability"
# (unigrams listed only as contexts); we follow SRILM's -99.
NO_PROB = -99.0


def tokenize(text: str) -> list[str]:
    """Same normalization as the stand-in LM (ngram_lm.tokenize) so the
    two scorers are drop-in comparable."""
    out = []
    for t in text.lower().split():
        t = t.strip(".,!?;:\"'")
        if t:
            out.append(t)
    return out


# --------------------------------------------------------------- counts


def count_ngrams(sentences: list[str], order: int) -> dict[tuple, int]:
    """Exact n-gram counts for ALL orders 1..order, keyed by token
    tuple.  Sentence boundaries use ``<s>``/``</s>`` (KenLM's
    convention): ``<s>`` appears only as context, ``</s>`` only as a
    predicted word."""
    counts: dict[tuple, int] = {}
    for s in sentences:
        toks = ["<s>"] + tokenize(s) + ["</s>"]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                if n == 1 and g == ("<s>",):
                    continue  # <s> is never predicted
                counts[g] = counts.get(g, 0) + 1
    return counts


def count_ngrams_batch(texts, order: int) -> "pa.Table":
    """Vectorized twin of ``count_ngrams`` for one batch: returns a
    ``(gram, n)`` Arrow table whose multiset equals the serial dict
    exactly (tests/test_arpa.py parity property).  One
    ``utf8_split_whitespace`` pass, punctuation trim, lexsort-inserted
    ``<s>``/``</s>`` markers, shifted-slice ``binary_join_element_wise``
    n-gram assembly, and ``value_counts`` — no per-token Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    R = len(col)
    empty = pa.table({"gram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if R == 0:
        return empty
    # tokenize(): lower, whitespace-run split, strip edge punctuation,
    # drop tokens that strip to empty — same rules, Arrow kernels
    lists = pc.utf8_split_whitespace(
        pc.fill_null(pc.utf8_lower(col), ""))
    flat = pc.list_flatten(lists)
    nn = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    row = np.repeat(np.arange(R, dtype=np.int64), nn)
    tok = pc.utf8_trim(flat, ".,!?;:\"'")
    keep = pc.not_equal(tok, "").to_numpy(zero_copy_only=False)
    tok, row = tok.filter(pa.array(keep)), row[keep]
    cnt = np.bincount(row, minlength=R)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    # splice in per-sentence <s>/</s> markers by index arithmetic (one
    # Arrow take, no Python-object round trip): token i of row r lands
    # at output slot i + 2r + 1; row r's <s> at starts[r] + 2r, its
    # </s> one slot past the row's last token.
    T = len(tok)
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    comb = pa.concat_arrays([tok, pa.array(["<s>", "</s>"], pa.string())])
    total = T + 2 * R
    srt_pos = starts + 2 * np.arange(R, dtype=np.int64)
    end_pos = srt_pos + cnt + 1
    idx = np.empty(total, np.int64)
    row2 = np.empty(total, np.int64)
    idx[srt_pos], idx[end_pos] = T, T + 1
    row2[srt_pos] = row2[end_pos] = np.arange(R, dtype=np.int64)
    if T:
        tok_out = np.arange(T, dtype=np.int64) + 2 * row + 1
        idx[tok_out] = np.arange(T, dtype=np.int64)
        row2[tok_out] = row
    tok2 = comb.take(pa.array(idx))
    # the serial counter skips EVERY ("<s>",) unigram — spliced marker
    # or literal token alike — so mask by value, not by slot
    not_s = pc.not_equal(tok2, "<s>").to_numpy(zero_copy_only=False)
    parts = []
    for n in range(1, order + 1):
        if total < n:
            break
        m = total - n + 1
        valid = row2[:m] == row2[n - 1:]
        if n == 1:
            joined = tok2
            valid = valid & not_s  # <s> never predicted
        else:
            joined = pc.binary_join_element_wise(
                *[tok2.slice(k, m) for k in range(n)], "\x1f")
        vc = pc.value_counts(joined.filter(pa.array(valid)))
        if len(vc):
            parts.append(pa.table({"gram": vc.field("values"),
                                   "n": vc.field("counts").cast(pa.int64())}))
    return pa.concat_tables(parts) if parts else empty


def count_ngrams_distributed(ds, text_col: str, order: int,
                             batch_format: str = "pyarrow"):
    """Distributed twin of ``count_ngrams``: per-batch exact partials
    (vectorized ``count_ngrams_batch``, emitted as thin (ngram, n)
    rows) + one grouped Sum.  Returns the same dict the serial counter
    builds — integer sums are order-free, so the result is
    parallelism-independent."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return count_ngrams_batch(t.column(text_col), order)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("gram").aggregate(Sum("n", alias_name="n")).to_pandas())
    return {tuple(g.split("\x1f")): int(n)
            for g, n in zip(agg["gram"], agg["n"])}


# ------------------------------------------------------------ estimation


def _discounts(counts_at_order: list[int]) -> tuple[float, float, float]:
    """Modified-KN discounts (D1, D2, D3+) from the count-of-counts of
    one order.  Degenerate corpora (missing n1..n4) fall back to the
    classic 0.75 absolute discount."""
    n = [0, 0, 0, 0, 0]
    for c in counts_at_order:
        if 1 <= c <= 4:
            n[c] += 1
    if n[1] == 0 or n[2] == 0:
        return 0.75, 0.75, 0.75
    y = n[1] / (n[1] + 2.0 * n[2])
    d1 = 1.0 - 2.0 * y * n[2] / n[1]
    d2 = 2.0 - 3.0 * y * n[3] / n[2] if n[3] else 1.0
    d3 = 3.0 - 4.0 * y * n[4] / n[3] if n[3] and n[4] else 1.5
    # floor at 0.1: a zero discount gives gamma(h)=0 for some context,
    # i.e. a log10-backoff of -inf — unseen continuations become
    # impossible.  Any D in (0, k] keeps the distribution exactly
    # normalized, so the floor trades a hair of likelihood for finite
    # backoff everywhere (small-corpus robustness; large corpora never
    # clamp).  Ceilings keep (c - D) >= 0.
    return (min(max(d1, 0.1), 1.0), min(max(d2, 0.1), 2.0),
            min(max(d3, 0.1), 3.0))


def _apply_discount(c: int, d: tuple[float, float, float]) -> float:
    if c <= 0:
        return 0.0
    if c == 1:
        return d[0]
    if c == 2:
        return d[1]
    return d[2]


@dataclass
class ArpaLM:
    """An ARPA backoff model: per-order {ngram-tuple: (log10 p,
    log10 backoff)} plus the vocab.  Build with ``fit``, ``read_arpa``
    or ``from_counts``; score with ``perplexity_batch``."""

    order: int
    # table[n-1][gram] = (log10_prob, log10_backoff)
    tables: list[dict[tuple, tuple[float, float]]]
    vocab: dict[str, int] = field(default_factory=dict)

    # -------------------------------------------------------------- fit
    @classmethod
    def from_counts(cls, counts: dict[tuple, int], order: int) -> "ArpaLM":
        by_order: list[dict[tuple, int]] = [dict() for _ in range(order)]
        for g, c in counts.items():
            if len(g) <= order:
                by_order[len(g) - 1][g] = c

        # continuation counts: for order n < highest, the KN "count" of
        # gram g is |{v : (v,)+g seen}| (distinct left extensions)
        adj: list[dict[tuple, int]] = [dict() for _ in range(order)]
        adj[order - 1] = dict(by_order[order - 1])
        for n in range(order - 1, 0, -1):
            cont: dict[tuple, int] = {}
            for g in by_order[n]:  # (n+1)-grams
                cont[g[1:]] = cont.get(g[1:], 0) + 1
            # grams never seen as a right-suffix (only <s>-initial ones,
            # since <s> follows nothing) keep raw counts — as KenLM does
            adj[n - 1] = {g: cont.get(g, c)
                          for g, c in by_order[n - 1].items()}

        disc = [_discounts(list(adj[n].values())) for n in range(order)]

        # interpolated probabilities, lowest order first
        v_plus_1 = len(adj[0]) + 1  # vocab + <unk> (<s> never predicted)

        # unigram level: continuation counts interpolated with uniform
        tot1 = sum(adj[0].values())
        d1 = disc[0]
        n_types = [0, 0, 0]
        for c in adj[0].values():
            n_types[0 if c == 1 else 1 if c == 2 else 2] += 1
        gamma1 = (d1[0] * n_types[0] + d1[1] * n_types[1]
                  + d1[2] * n_types[2]) / tot1 if tot1 else 1.0
        p_interp: dict[tuple, float] = {}
        for g, c in sorted(adj[0].items()):
            p_interp[g] = ((c - _apply_discount(c, d1)) / tot1
                           + gamma1 / v_plus_1) if tot1 else 1.0 / v_plus_1
        p_unk = gamma1 / v_plus_1 if tot1 else 1.0 / v_plus_1

        gammas: list[dict[tuple, float]] = [dict() for _ in range(order)]
        gammas[0] = {(): gamma1}
        for n in range(2, order + 1):
            d = disc[n - 1]
            # per-context totals + type counts over the ADJUSTED counts
            ctx_tot: dict[tuple, int] = {}
            ctx_types: dict[tuple, list[int]] = {}
            for g, c in adj[n - 1].items():
                h = g[:-1]
                ctx_tot[h] = ctx_tot.get(h, 0) + c
                t = ctx_types.setdefault(h, [0, 0, 0])
                t[0 if c == 1 else 1 if c == 2 else 2] += 1
            gam: dict[tuple, float] = {}
            for h, tot in ctx_tot.items():
                t = ctx_types[h]
                gam[h] = (d[0] * t[0] + d[1] * t[1] + d[2] * t[2]) / tot
            gammas[n - 1] = gam
            for g, c in sorted(adj[n - 1].items()):
                h = g[:-1]
                lower = p_interp.get(g[1:], p_unk)
                p_interp[g] = ((c - _apply_discount(c, d)) / ctx_tot[h]
                               + gam[h] * lower)

        # assemble ARPA tables: backoff weight attaches to every gram
        # that appears as a context one order up
        tables: list[dict[tuple, tuple[float, float]]] = \
            [dict() for _ in range(order)]
        for n in range(1, order + 1):
            grams = set(adj[n - 1])
            if n < order:
                grams |= set(gammas[n])  # contexts need a row for backoff
            for g in sorted(grams):
                p = p_interp.get(g)
                lp = math.log10(p) if p is not None and p > 0 else NO_PROB
                bo = gammas[n].get(g, 1.0) if n < order else 1.0
                lbo = math.log10(bo) if bo > 0 else NO_PROB
                tables[n - 1][g] = (lp, lbo)

        words = sorted({w for (w,) in tables[0]} | {"<unk>"})
        vocab = {w: i for i, w in enumerate(words)}
        if ("<unk>",) not in tables[0]:
            tables[0][("<unk>",)] = (math.log10(p_unk), 0.0)
        return cls(order=order, tables=tables, vocab=vocab)

    @classmethod
    def fit(cls, sentences: list[str], order: int = 2) -> "ArpaLM":
        return cls.from_counts(count_ngrams(sentences, order), order)

    # ---------------------------------------------------------- scoring
    def logprob_word(self, context: tuple, word: str) -> float:
        """log10 p(word | context) via ARPA backoff (reference scalar
        path; the batch kernel must agree bit-for-bit)."""
        context = tuple(context[-(self.order - 1):]) if self.order > 1 else ()
        g = context + (word,)
        ent = self.tables[len(g) - 1].get(g) if len(g) <= self.order else None
        if ent is not None and ent[0] != NO_PROB:
            return ent[0]
        if not context:
            unk = self.tables[0].get(("<unk>",))
            return unk[0] if unk else NO_PROB
        # back off: multiply by backoff(context) and shorten
        ctx_ent = self.tables[len(context) - 1].get(context)
        bo = ctx_ent[1] if ctx_ent else 0.0
        return bo + self.logprob_word(context[1:], word)

    def perplexity(self, text: str) -> float:
        toks = ["<s>"] + tokenize(text) + ["</s>"]
        if len(toks) == 2:
            unk = self.tables[0].get(("<unk>",), (NO_PROB, 0.0))
            return float(10.0 ** (-unk[0]))
        ll = 0.0
        for i in range(1, len(toks)):
            ctx = tuple(toks[max(0, i - self.order + 1): i])
            ll += self.logprob_word(ctx, toks[i])
        n = len(toks) - 1
        return float(10.0 ** (-ll / n))

    # -------------------------------------------------- batch scoring
    def _score_arrays(self):
        """Packed-key lookup arrays for the vectorized scorer (orders
        ≤ 3), built lazily once per model instance.  Key packing is
        id-arithmetic base V (= len of the sorted unigram word list), so
        an int64 holds a trigram key iff V**3 < 2**63 — checked by the
        caller, which falls back to the scalar path otherwise."""
        if hasattr(self, "_sa"):
            return self._sa
        words = sorted({w for (w,) in self.tables[0]})
        wmap = {w: i for i, w in enumerate(words)}
        V = len(words)
        uni_lp = np.empty(V, dtype=np.float64)
        uni_bo = np.empty(V, dtype=np.float64)
        for w, i in wmap.items():
            lp, lbo = self.tables[0][(w,)]
            uni_lp[i], uni_bo[i] = lp, lbo
        sa = {"wmap": wmap, "V": V, "uni_lp": uni_lp, "uni_bo": uni_bo}
        if self.order >= 2:
            t = self.tables[1]
            k = np.fromiter(
                (wmap[a] * V + wmap[b] for (a, b) in t),
                dtype=np.int64, count=len(t))
            lp = np.fromiter((v[0] for v in t.values()),
                             dtype=np.float64, count=len(t))
            bo = np.fromiter((v[1] for v in t.values()),
                             dtype=np.float64, count=len(t))
            o = np.argsort(k)
            sa["bi_k"], sa["bi_lp"], sa["bi_bo"] = k[o], lp[o], bo[o]
        if self.order >= 3:
            t = self.tables[2]
            k = np.fromiter(
                ((wmap[a] * V + wmap[b]) * V + wmap[c] for (a, b, c) in t),
                dtype=np.int64, count=len(t))
            lp = np.fromiter((v[0] for v in t.values()),
                             dtype=np.float64, count=len(t))
            o = np.argsort(k)
            sa["tri_k"], sa["tri_lp"] = k[o], lp[o]
        self._sa = sa
        return sa

    @staticmethod
    def _lookup(sorted_keys: np.ndarray, vals: np.ndarray,
                keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hit_mask, values) for ``keys`` against a sorted key array;
        misses get 0.0 (callers mask on hit before using)."""
        out = np.zeros(len(keys), dtype=np.float64)
        if len(sorted_keys) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=bool), out
        pos = np.clip(np.searchsorted(sorted_keys, keys),
                      0, len(sorted_keys) - 1)
        hit = sorted_keys[pos] == keys
        out[hit] = vals[pos[hit]]
        return hit, out

    def perplexity_batch(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch scorer for orders 2–3 (packed int64 keys +
        searchsorted, the same kernel shape as
        ``BigramLM.perplexity_batch``); other orders (or vocabularies too
        large for trigram key packing) delegate to the scalar path.

        Bit parity with ``perplexity``: per-token log-probs are the same
        float64 dict values combined in the same association order
        (``bo2 + (bo1 + u)``), per-text sums run in token order via
        ``np.bincount``, so results never depend on batch boundaries or
        which code path scored them (tests/test_arpa.py property test).
        """
        sa = self._score_arrays() if self.order in (2, 3) else None
        if sa is None or (self.order == 3 and sa["V"] ** 3 >= 2 ** 63):
            return np.asarray([self.perplexity(t) for t in texts],
                              dtype=np.float32)
        V, wmap = sa["V"], sa["wmap"]
        unk = self.tables[0].get(("<unk>",))
        unk_lp = unk[0] if unk else NO_PROB
        tok_lists = [["<s>"] + tokenize(t) + ["</s>"] for t in texts]
        lens = np.asarray([len(t) for t in tok_lists], dtype=np.int64)
        n_texts = len(texts)
        # empty text rows: scalar path returns unk-based ppl directly
        out = np.full(n_texts, 10.0 ** (-unk_lp), dtype=np.float64)
        total = int(lens.sum())
        if total == 0:
            return out.astype(np.float32)
        get = wmap.get
        wid = np.fromiter(
            (get(t, -1) for lst in tok_lists for t in lst),
            dtype=np.int64, count=total)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        owner = np.repeat(np.arange(n_texts), lens)
        local = np.arange(total) - starts[owner]  # index within its text
        scored = local >= 1
        w = wid[scored]
        prev = wid[np.flatnonzero(scored) - 1]
        # unigram term: listed prob unless missing/NO_PROB, else <unk>
        u = np.full(len(w), unk_lp, dtype=np.float64)
        kw = w >= 0
        ulp = sa["uni_lp"][w[kw]]
        u[kw] = np.where(ulp != NO_PROB, ulp, unk_lp)
        # backoff(prev): listed weight, 0.0 for unlisted contexts
        bo1 = np.zeros(len(w), dtype=np.float64)
        kp = prev >= 0
        bo1[kp] = sa["uni_bo"][prev[kp]]
        # bigram level: hit with a real prob wins, else bo1 + u
        lp2 = bo1 + u
        both = kw & kp
        if both.any():
            hit, blp = self._lookup(sa["bi_k"], sa["bi_lp"],
                                    prev[both] * V + w[both])
            use = hit & (blp != NO_PROB)
            tgt = np.flatnonzero(both)[use]
            lp2[tgt] = blp[use]
        if self.order == 2:
            lp = lp2
        else:
            lp = lp2.copy()
            # trigram context exists from the text's 2nd scored token on
            idx = np.flatnonzero(scored)
            has2 = local[scored] >= 2
            prev2 = np.full(len(w), -1, dtype=np.int64)
            prev2[has2] = wid[idx[has2] - 2]
            all3 = has2 & kp & kw & (prev2 >= 0)
            if all3.any():
                pk = prev2[all3] * V + prev[all3]
                hit3, tlp = self._lookup(sa["tri_k"], sa["tri_lp"],
                                         pk * V + w[all3])
                bhit, bo2 = self._lookup(sa["bi_k"], sa["bi_bo"], pk)
                use3 = hit3 & (tlp != NO_PROB)
                sel = np.flatnonzero(all3)
                lp[sel] = np.where(use3, tlp, bo2 + lp2[all3])
            # positions with a 2-token context but an unlisted/OOV piece
            # still back off through bo2 (0.0 when the context is unlisted)
            part3 = has2 & ~all3
            if part3.any():
                # any OOV member means the trigram can't be listed; the
                # bigram-context backoff weight needs valid (prev2, prev)
                pmask = part3 & kp & (prev2 >= 0)
                bo2p = np.zeros(len(w), dtype=np.float64)
                if pmask.any():
                    _, b = self._lookup(sa["bi_k"], sa["bi_bo"],
                                        prev2[pmask] * V + prev[pmask])
                    bo2p[pmask] = b
                sel = np.flatnonzero(part3)
                lp[sel] = bo2p[part3] + lp2[part3]
        ll = np.bincount(owner[scored], weights=lp, minlength=n_texts)
        nz = lens > 2
        ntok = lens - 1
        out[nz] = 10.0 ** (-ll[nz] / ntok[nz])
        return out.astype(np.float32)

    # ------------------------------------------------------ persistence
    def to_arpa(self) -> str:
        lines = ["\\data\\"]
        for n in range(1, self.order + 1):
            lines.append(f"ngram {n}={len(self.tables[n - 1])}")
        for n in range(1, self.order + 1):
            lines.append("")
            lines.append(f"\\{n}-grams:")
            for g in sorted(self.tables[n - 1]):
                lp, lbo = self.tables[n - 1][g]
                if n < self.order and lbo != 0.0:
                    lines.append(f"{lp:.7f}\t{' '.join(g)}\t{lbo:.7f}")
                else:
                    lines.append(f"{lp:.7f}\t{' '.join(g)}")
        lines += ["", "\\end\\", ""]
        return "\n".join(lines)

    @classmethod
    def read_arpa(cls, text: str) -> "ArpaLM":
        lines = iter(text.splitlines())
        for ln in lines:
            if ln.strip() == "\\data\\":
                break
        else:
            raise ValueError("not an ARPA file: missing \\data\\")
        sizes = []
        for ln in lines:
            ln = ln.strip()
            if not ln:
                break
            if ln.startswith("ngram "):
                sizes.append(int(ln.split("=")[1]))
        order = len(sizes)
        if order == 0:
            raise ValueError("ARPA header lists no ngram orders")
        tables: list[dict[tuple, tuple[float, float]]] = \
            [dict() for _ in range(order)]
        cur = 0
        for ln in lines:
            ln = ln.strip()
            if not ln:
                continue
            if ln == "\\end\\":
                break
            if ln.startswith("\\") and ln.endswith("-grams:"):
                cur = int(ln[1:].split("-")[0])
                continue
            parts = ln.split("\t") if "\t" in ln else ln.split()
            if "\t" in ln:
                lp = float(parts[0])
                grams = tuple(parts[1].split(" "))
                lbo = float(parts[2]) if len(parts) > 2 else 0.0
            else:
                lp = float(parts[0])
                if len(parts) == cur + 2:  # prob + toks + backoff
                    grams, lbo = tuple(parts[1:-1]), float(parts[-1])
                else:
                    grams, lbo = tuple(parts[1:]), 0.0
            if len(grams) != cur:
                raise ValueError(f"bad {cur}-gram line: {ln!r}")
            tables[cur - 1][grams] = (lp, lbo)
        words = sorted({w for (w,) in tables[0]} | {"<unk>"})
        return cls(order=order, tables=tables,
                   vocab={w: i for i, w in enumerate(words)})
