"""Single-process pure-Python oracle for the flagship quality filter.

Plays the role of the "reference labels" in BASELINE.json: a sequential,
loop-per-row implementation of exactly the rules the Ray pipeline
implements (RuleConfig is the shared spec; model artifacts are shared
bytes).  The Ray pipeline is correct iff its distributed execution agrees
with this oracle row-for-row (keep/drop F1 ≥ 0.99, scrubbed caption exact
match, dup-group equality).

Deliberately naive: plain dicts, plain loops, no numpy vectorization in
the decision path, no Ray — so agreement is meaningful evidence.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..common.hashing import int64_to_uint64
from ..ops.scrub import SCRUB_RULES
from ..ops.text_rules import RuleConfig
from ..fixtures.textgen import STOPWORDS, SYMBOLS


def _tokens(text: str) -> list[str]:
    out = []
    for tok in text.lower().split():
        tok = tok.strip(".,!?;:\"'")
        if tok and any(c.isalpha() for c in tok):
            out.append(tok)
    return out


def _scrub(text: str) -> str:
    for _name, pattern, repl in SCRUB_RULES:
        text = re.sub(pattern, repl, text)
    return text


def _rule_reason(caption: str, lang: str, ppl: float, cfg: RuleConfig) -> str:
    if not caption.strip():
        return "empty"
    if len(caption) < cfg.min_chars:
        return "too_short"
    if len(caption) > cfg.max_chars:
        return "too_long"
    if lang not in cfg.allowed_langs:
        return "lang"
    if ppl > cfg.ppl_max:
        return "ppl"
    toks = _tokens(caption)
    if toks:
        if 1.0 - len(set(toks)) / len(toks) > cfg.rep_max:
            return "repetition"
    n_sym = sum(1 for ch in caption if ch in set(SYMBOLS))
    if n_sym / max(1, len(toks)) > cfg.sym_max:
        return "symbol"
    stop = sum(1 for t in toks if t in set(STOPWORDS))
    if (stop / len(toks) if toks else 0.0) < cfg.stop_min:
        return "stopword"
    return ""


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _band_vals(h: int, bands: int) -> list[tuple[int, int]]:
    width = 64 // bands
    mask = (1 << width) - 1
    return [(b, (h >> (b * width)) & mask) for b in range(bands)]


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def near_dup_groups(
    ids: list[str], phashes_u64: list[int], cfg: RuleConfig, max_bucket: int = 512,
    window: int = 64,
) -> dict[str, str]:
    """image_id → canonical image_id (min id of its near-dup component).

    Banded LSH over the 64-bit phash: `cfg.dup_bands` equal-width bands;
    any pair sharing a band value is a candidate; candidates verified with
    Hamming ≤ cfg.dup_hamming_max; components via union-find; canonical =
    lexicographic min image_id.  Oversized buckets fall back to a sorted
    neighbor window (deterministic) — the same policy as the Ray stage.
    """
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, h in enumerate(phashes_u64):
        for bv in _band_vals(h, cfg.dup_bands):
            buckets.setdefault(bv, []).append(i)
    uf = _UnionFind()
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda i: (phashes_u64[i], ids[i]))
        if len(members) <= max_bucket:
            pairs = (
                (a, b)
                for ai, a in enumerate(members)
                for b in members[ai + 1 :]
            )
        else:
            pairs = (
                (members[ai], members[ai + d])
                for ai in range(len(members))
                for d in range(1, min(window, len(members) - ai - 1) + 1)
            )
        for a, b in pairs:
            if _hamming(phashes_u64[a], phashes_u64[b]) <= cfg.dup_hamming_max:
                uf.union(ids[a], ids[b])
    out = {}
    for i in ids:
        if i in uf.parent:
            out[i] = uf.find(i)
    return out


def oracle_labels(images: pa.Table, langid, lm, cfg: RuleConfig | None = None) -> pa.Table:
    """Full oracle pass → labels table (FIXTURES.md F1 'images_labels').

    Columns: image_id, keep, drop_reason, scrubbed_caption, dup_group,
    lang, lang_conf, ppl.
    """
    cfg = cfg or RuleConfig()
    ids = images.column("image_id").to_pylist()
    captions = images.column("caption").to_pylist()
    phash = [int64_to_uint64(v) for v in images.column("phash").to_pylist()]

    langs, confs, ppls, reasons, scrubbed = [], [], [], [], []
    import numpy as np

    for cap in captions:
        lang, conf = langid.predict_one(cap)
        # round-trip through float32: the pipeline's ppl column is f32,
        # so the rule threshold must see the identical value
        ppl = float(np.float32(lm.perplexity(cap)))
        langs.append(lang)
        confs.append(conf)
        ppls.append(ppl)
        reasons.append(_rule_reason(cap, lang, ppl, cfg))
        scrubbed.append(_scrub(cap))

    kept_idx = [i for i, r in enumerate(reasons) if r == ""]
    canon = near_dup_groups(
        [ids[i] for i in kept_idx], [phash[i] for i in kept_idx], cfg
    )
    keep, dup_group = [], []
    for i, r in enumerate(reasons):
        if r:
            keep.append(False)
            dup_group.append("")
        else:
            c = canon.get(ids[i], ids[i])
            dup_group.append(c)
            if c != ids[i]:
                keep.append(False)
                reasons[i] = "near_dup"
            else:
                keep.append(True)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "keep": pa.array(keep, pa.bool_()),
            "drop_reason": pa.array(reasons, pa.string()),
            "scrubbed_caption": pa.array(scrubbed, pa.string()),
            "dup_group": pa.array(dup_group, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "lang_conf": pa.array([float(c) for c in confs], pa.float32()),
            "ppl": pa.array([float(p) for p in ppls], pa.float32()),
        }
    )


def write_labels_table(images_dir: str, out_dir: str | None = None) -> str:
    """Materialize the oracle labels as a Lance-style table next to the
    images (FIXTURES.md F1 'images_labels') — one labels fragment per
    image fragment, same ids."""
    import os

    import pyarrow.parquet as pq

    from ..io import lance_table
    from ..models import artifacts

    out_dir = out_dir or os.path.join(images_dir, "_labels")
    langid = artifacts.load_langid()
    lm = artifacts.load_lm()
    paths = lance_table.fragment_paths(images_dir)
    tables = [pq.read_table(p) for p in paths]
    # oracle must run GLOBALLY (near-dup groups span fragments), then the
    # labels are sliced back along the original fragment boundaries
    labels = oracle_labels(pa.concat_tables(tables), langid, lm)
    frags = []
    off = 0
    for i, t in enumerate(tables):
        frags.append(
            lance_table.write_fragment(out_dir, i, labels.slice(off, t.num_rows))
        )
        off += t.num_rows
    lance_table.write_manifest(out_dir, frags, {"kind": "images_labels"})
    return out_dir
