"""Fuzzy-ratio (Indel / RapidFuzz ``fuzz.ratio``) dedup + decontamination.

The reference's v1 dedup is an all-pairs ``fuzz.ratio`` scan over unique
texts on a multiprocessing pool (open_thoughts/deduplicate.py:12-55) and
its source decontamination verifies candidates with the same ratio
(_A1_Source/utils.py:91-195).  Rebuilt with the LSH-candidate pattern:
MinHash bands generate candidate pairs (one narrow shuffle), and the
exact Indel ratio verifies ONLY candidates — O(N·bands) shuffle +
O(#candidates · len²) verify instead of O(N²) scans.

``fuzz.ratio`` semantics: 100 · (1 − dist_indel/(|a|+|b|)) where
dist_indel is edit distance with insert/delete only (no substitution)
= |a| + |b| − 2·LCS(a, b).  The LCS kernel is a numpy-vectorized DP row
(cur = running-max trick) — no per-cell Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import union_find_canonical
from .dedup_text import _drop_ids_filter


def lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(|a|) numpy rows of |b|.

    Recurrence dp[i][j]=max(dp[i-1][j], dp[i][j-1], dp[i-1][j-1]+eq)
    collapses to cur = maximum.accumulate(max(prev, shift(prev)+eq))
    because cur[j] = max(t[0..j]) when t[j] = max(prev[j], prev[j-1]+eq).
    """
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a  # inner vector = the shorter string
    bc = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(bc) + 1, dtype=np.int32)
    t = np.empty(len(bc) + 1, dtype=np.int32)
    for ch in a:
        code = np.uint32(ord(ch))
        t[0] = 0
        np.add(prev[:-1], bc == code, out=t[1:], casting="unsafe")
        np.maximum(t[1:], prev[1:], out=t[1:])
        np.maximum.accumulate(t, out=prev)
    return int(prev[-1])


def indel_ratio(a: str, b: str) -> float:
    """RapidFuzz ``fuzz.ratio`` (Indel similarity) in [0, 100]."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return 100.0 * 2.0 * lcs_length(a, b) / (la + lb)


def indel_verify_kernel(ratio_threshold: float):
    """Pair kernel for the distributed verify path: exact Indel ratio ≥
    threshold, computed per pair on the workers."""

    def kernel(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
        return np.asarray(
            [indel_ratio(a, b) >= ratio_threshold
             for a, b in zip(texts_a, texts_b)], dtype=bool)

    return kernel


def fuzzy_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                ratio_threshold: float = 90.0, k: int = 64, bands: int = 16,
                shingle_n: int = 3, max_bucket: int = 256,
                num_partitions: int | None = None, source_fetch=None,
                max_driver_pairs: int = 2_000_000):
    """Near-dup collapse with exact Indel-ratio verification; survivors =
    min id per component (deduplicate.py:12-55 semantics without the
    O(N²) scan).

    MinHash-LSH candidates → candidate texts from a pruned re-read
    (optionally a predicate-pushdown ``source_fetch``) → Indel ratio on
    candidate pairs only → components → filter.  Candidate structures on
    the driver are O(#near-dups); above ``max_driver_pairs`` the whole
    verify+component path runs distributed (pairverify joins + label
    propagation — VERDICT r2 #2), and the driver never sees a pair."""
    import ray

    from .dedup_text import _auto_partitions, minhash_pairs_dataset

    num_partitions = _auto_partitions(num_partitions)
    pairs_ds = minhash_pairs_dataset(ds, id_col, text_col, k, bands,
                                     shingle_n, max_bucket,
                                     num_partitions).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ds
    if n_pairs > max_driver_pairs:
        from .dedup_text import _dedup_drop_by_components
        from .pairverify import verify_pairs_distributed

        edges = verify_pairs_distributed(
            pairs_ds, ds, id_col, text_col,
            indel_verify_kernel(ratio_threshold), num_partitions)
        return _dedup_drop_by_components(ds, id_col, edges, num_partitions)
    pairs = pairs_ds.to_pandas()
    pairs = pairs.drop_duplicates()
    cand_ids = set(pairs["a"]).union(pairs["b"])
    if source_fetch is not None:
        cand_tbl = source_fetch(cand_ids)
    else:
        from .dedup_text import _keep_ids_filter

        cand_tbl = _keep_ids_filter(
            ds.select_columns([id_col, text_col]), id_col, cand_ids
        ).to_pandas()
    text_by_id = {str(i): t for i, t in zip(cand_tbl[id_col], cand_tbl[text_col])}
    ea, eb = [], []
    for a, b in zip(pairs["a"], pairs["b"]):
        if indel_ratio(text_by_id[a], text_by_id[b]) >= ratio_threshold:
            ea.append(a)
            eb.append(b)
    if not ea:
        return ds
    canon = union_find_canonical(ea, eb)
    drop = {m for m, c in canon.items() if m != c}
    return _drop_ids_filter(ds, id_col, drop)


def decontaminate_fuzzy_ratio(ds, benchmark_texts: list[str],
                              text_column: str = "text",
                              ratio_threshold: float = 90.0,
                              ngram_n: int = 8,
                              candidate_overlap: float = 0.2,
                              mode: str = "drop"):
    """Decontamination with Indel-ratio verification
    (_A1_Source/utils.py:91-195: n-gram candidate screen, then
    ``fuzz.ratio`` ≥ threshold confirms the match).

    The benchmark index is broadcast once; per row the cheap inverted-
    n-gram screen nominates candidate benchmark rows, and only those pay
    the O(len²) ratio kernel."""
    import ray

    from .decontaminate import _normalize, _ngrams, build_benchmark_index

    index = build_benchmark_index(benchmark_texts, ngram_n)
    index["texts"] = [_normalize(t) for t in benchmark_texts]
    ref = ray.put(index)

    def _matches(idx: dict, text: str) -> bool:
        norm = _normalize(text)
        if norm in idx["exact"]:
            return True
        toks = norm.split()
        hits: dict[int, int] = {}
        for g in _ngrams(toks, idx["n"]):
            for row in idx["inv"].get(g, ()):
                hits[row] = hits.get(row, 0) + 1
        for row, c in hits.items():
            if c / idx["sizes"][row] >= candidate_overlap:
                if indel_ratio(norm, idx["texts"][row]) >= ratio_threshold:
                    return True
        return False

    # plain tasks + per-worker broadcast cache (ops/bcast.py)
    def f_task(batch: pa.Table, *, ref) -> pa.Table:
        from .bcast import cached_get

        idx = cached_get(ref)
        flags = np.asarray(
            [_matches(idx, t) for t in batch.column(text_column).to_pylist()],
            dtype=bool,
        )
        if mode == "annotate":
            return batch.append_column("contaminated",
                                       pa.array(flags, pa.bool_()))
        return batch.filter(pa.array(~flags))

    return ds.map_batches(f_task, batch_format="pyarrow",
                          fn_kwargs={"ref": ref}, num_cpus=0.5)
