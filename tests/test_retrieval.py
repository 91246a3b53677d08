"""BM25 retrieval + hash-split: naive-reference equality and DuckDB
oracle parity on synthetic corpora."""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops.retrieval import (
    B,
    K1,
    bm25_topk,
    corpus_term_stats,
)

QUERIES = {0: ["alpha", "beta"], 1: ["gamma", "delta", "alpha"]}


def _corpus(seed=11, n=300):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
        for _ in range(n)
    ]
    texts.append("")  # empty doc edge case
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _naive_bm25(df, queries, k=10):
    """Row-at-a-time reference: same micro-unit formula, brute force."""
    toks = {r.doc_id: (r.text.split(" ") if r.text else [])
            for r in df.itertuples()}
    n_docs = len(df)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    terms = sorted({t for ts in queries.values() for t in ts})
    df_t = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    idf = {t: math.log((n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
           for t in terms}
    rows = []
    for qid, ts in queries.items():
        scored = []
        for did, tk in toks.items():
            micro = 0
            hit = False
            for t in ts:
                tf = tk.count(t)
                if tf == 0:
                    continue
                hit = True
                contrib = (idf[t] * (tf * (K1 + 1.0))
                           / (tf + K1 * ((1.0 - B) + B * len(tk) / avgdl)))
                micro += int(math.floor(contrib * 1000000.0))
            if hit:
                scored.append((did, micro))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (did, s) in enumerate(scored[:k], 1):
            rows.append((qid, did, s, rank))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "score_micro",
                                       "rank"])


def test_corpus_term_stats_matches_direct(ray_session):
    import ray

    df = _corpus()
    terms = sorted({t for ts in QUERIES.values() for t in ts})
    ds = ray.data.from_pandas(df).repartition(8)
    n_docs, sum_dl, dfv = corpus_term_stats(ds, terms)
    assert n_docs == len(df)
    assert sum_dl == sum(len(t.split(" ")) if t else 0 for t in df.text)
    for j, t in enumerate(terms):
        expect = sum(1 for x in df.text if t in (x.split(" ") if x else []))
        assert dfv[j] == expect


def test_bm25_matches_naive_reference(ray_session):
    import ray

    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(8)
    got = (bm25_topk(ds, QUERIES, k=10).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    want = (_naive_bm25(df, QUERIES, k=10)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "doc_id": "int64"}), want.astype(
            {"query_id": "int64", "doc_id": "int64"}))


def test_bm25_duckdb_oracle_parity(ray_session):
    """The generated oracle SQL reproduces the Ray result bit-for-bit."""
    import ray

    import __ray_entry__ as entrymod

    df = _corpus(seed=23, n=400)
    ds = ray.data.from_pandas(df).repartition(8)
    # the synthetic vocab here differs from the sf corpus, so point the
    # oracle generator at QUERIES for this table
    voc_queries = QUERIES
    got = (bm25_topk(ds, voc_queries, k=10).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))

    old = entrymod._BM25_QUERIES
    try:
        entrymod._BM25_QUERIES = voc_queries
        sql = entrymod._bm25_oracle()
    finally:
        entrymod._BM25_QUERIES = old
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(sql).df()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "doc_id": "int64",
                    "score_micro": "int64", "rank": "int64"}),
        want.astype({"query_id": "int64", "doc_id": "int64",
                     "score_micro": "int64", "rank": "int64"}))


def test_hash_split_deterministic_and_sql_parity(ray_session):
    import ray

    from open_thoughts_ray.ops.columns import hash_split_batch

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = (ds.map_batches(hash_split_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # pure function of the id
    for r in got.head(50).itertuples():
        b = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 100
        assert r.bucket == b
        assert r.split == ("train" if b < 80 else "val" if b < 90 else "test")
    # roughly 80/10/10
    frac = got.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.06
    con = duckdb.connect()
    con.register("documents", df)
    import __ray_entry__ as entrymod

    want = (con.sql(entrymod.oracle_sql()["hash_split_documents"]).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"bucket": "int64"}), want.astype({"bucket": "int64"}))


def test_chunk_tokens_fanout_and_sql_parity(ray_session):
    import ray

    from open_thoughts_ray.ops.packing import chunk_tokens

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=n))
             for n in [1, 31, 32, 33, 56, 57, 200, 5]]
    texts.append("")  # emits no chunks
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    got = (chunk_tokens(ds, chunk_size=32, stride=24).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    # boundary semantics: n<=32 → 1 chunk; 33 → 2; 56 → 2 (2nd has 32);
    # 57 → 3 (3rd short); 200 → ceil(168/24)+1 = 8
    counts = got.groupby("doc_id").size().to_dict()
    assert counts == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 8, 7: 1}
    # every chunk re-joins to the right token slice
    row = got[(got.doc_id == 6) & (got.chunk_id == 3)].iloc[0]
    toks = texts[6].split(" ")
    assert row.chunk_text == " ".join(toks[72:104])
    assert row.n_chunk_tokens == 32

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(entrymod.oracle_sql()["chunk_documents"]).df()
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype(
        {"doc_id": "int64", "chunk_id": "int64", "n_chunk_tokens": "int64"}))


def test_tfidf_top_terms_matches_direct_and_join_path(ray_session):
    import math

    import ray.data as rd

    from collections import Counter

    from open_thoughts_ray.ops.retrieval import tfidf_top_terms

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["apple apple banana common",
                 "banana cherry common common",
                 "cherry date common apple"],
    })
    got = (tfidf_top_terms(rd.from_pandas(df), k=2).to_pandas()
           .sort_values(["doc_id", "score", "term"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    # direct computation
    n = len(df)
    dfc = Counter(t for s in df.text for t in set(s.split(" ")))
    expect = []
    for i, s in zip(df.doc_id, df.text):
        tf = Counter(s.split(" "))
        scored = sorted(((c * math.log(n / dfc[t]), t)
                         for t, c in tf.items()),
                        key=lambda x: (-x[0], x[1]))[:2]
        for sc, t in scored:
            expect.append((i, t, math.floor(sc * 1e6) / 1e6))
    exp = pd.DataFrame(expect, columns=["doc_id", "term", "score"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    joined = (tfidf_top_terms(rd.from_pandas(df), k=2, max_driver_vocab=0,
                              num_partitions=4).to_pandas()
              .sort_values(["doc_id", "score", "term"],
                           ascending=[True, False, True])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(joined, exp, check_dtype=False)


def test_termcount_and_rrf_fuse(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.retrieval import (bm25_topk, rrf_fuse,
                                                 termcount_topk)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["hash hash join extra", "join only once",
                 "hash join hash join", "nothing relevant"],
    })
    queries = {0: ["hash", "join"]}
    tc = termcount_topk(rd.from_pandas(df), queries, k=3).to_pandas()
    # doc 2 has 4 hits, doc 0 has 3, doc 1 has 1; doc 3 absent
    assert tc.sort_values("rank")["doc_id"].tolist() == [2, 0, 1]
    assert tc.sort_values("rank")["tcount"].tolist() == [4, 3, 1]

    bm = bm25_topk(rd.from_pandas(df), queries, k=3)
    fused = rrf_fuse(bm, termcount_topk(rd.from_pandas(df), queries, k=3),
                     k=3).to_pandas().sort_values("rank")
    assert len(fused) == 3
    assert set(fused["doc_id"]) <= {0, 1, 2}
    # fused micro-score = sum of floor(1e9/(60+rank)) over both lists
    bmr = {r.doc_id: r.rank for r in bm.to_pandas().itertuples()}
    tcr = {r.doc_id: r.rank for r in tc.itertuples()}
    for r in fused.itertuples():
        exp = int(1e9 // (60 + bmr[r.doc_id])) + int(1e9 // (60 + tcr[r.doc_id]))
        assert r.rrf_micro == exp


def test_hybrid_rrf_single_pass_equals_two_pass(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.retrieval import (bm25_topk, hybrid_rrf_topk,
                                                 rrf_fuse, termcount_topk)

    rng = np.random.RandomState(5)
    words = ["hash", "join", "scan", "sort", "merge", "other"]
    texts = [" ".join(rng.choice(words, size=rng.randint(4, 15)))
             for _ in range(50)]
    df = pd.DataFrame({"doc_id": range(50), "text": texts})
    queries = {0: ["hash", "join"], 1: ["sort"]}

    two = rrf_fuse(bm25_topk(rd.from_pandas(df), queries, k=5),
                   termcount_topk(rd.from_pandas(df), queries, k=5),
                   k=5).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    one = hybrid_rrf_topk(rd.from_pandas(df), queries, k=5).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, two, check_dtype=False)


def test_ctfidf_top_terms_per_class(ray_session):
    import math

    import ray.data as rd

    from collections import Counter

    from open_thoughts_ray.ops.retrieval import ctfidf_top_terms_per_class

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s2"],
        "text": ["apple apple shared", "apple shared",
                 "banana banana shared", "banana shared shared"],
    })
    got = (ctfidf_top_terms_per_class(rd.from_pandas(df), "source", "text",
                                      k=2).to_pandas()
           .sort_values(["source", "score", "term"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    # direct computation
    classes = sorted(df.source.unique())
    tf = Counter()
    classes_per_term = {}
    for s, t in zip(df.source, df.text):
        for tok in t.split(" "):
            tf[(s, tok)] += 1
    for (s, tok) in tf:
        classes_per_term.setdefault(tok, set()).add(s)
    rows = []
    for s in classes:
        scored = sorted(
            ((c * math.log(len(classes) / len(classes_per_term[tok])), tok)
             for (cs, tok), c in tf.items() if cs == s),
            key=lambda x: (-x[0], x[1]))[:2]
        for sc, tok in scored:
            rows.append((s, tok, math.floor(sc * 1e6) / 1e6))
    exp = pd.DataFrame(rows, columns=["source", "term", "score"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the class-exclusive term dominates its class
    assert got[got.source == "s1"].iloc[0]["term"] == "apple"
    assert got[got.source == "s2"].iloc[0]["term"] == "banana"


def test_tfidf_and_ctfidf_empty_input(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.retrieval import (ctfidf_top_terms_per_class,
                                                 tfidf_top_terms)

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype=int),
                                         "source": pd.Series([], dtype=str),
                                         "text": pd.Series([], dtype=str)}))
    assert tfidf_top_terms(empty).count() == 0
    assert ctfidf_top_terms_per_class(empty).count() == 0


def test_ranking_eval_metrics(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.retrieval import ranking_eval

    gold = pd.DataFrame({"query_id": [0, 0, 1, 1],
                         "doc_id": [10, 11, 20, 21]})
    # q0: first hit at rank 2, 1 of 2 recalled; q1: no hits
    sys = pd.DataFrame({"query_id": [0, 0, 1],
                        "doc_id": [99, 10, 98],
                        "rank": [1, 2, 1]})
    t = ranking_eval(rd.from_pandas(sys), rd.from_pandas(gold), k=10)
    assert t.column("n_queries")[0].as_py() == 2
    assert t.column("recall_at_k")[0].as_py() == 0.25   # (1/2 + 0)/2
    assert t.column("mrr")[0].as_py() == 0.25           # (1/2 + 0)/2


def test_bm25_micro_score_numpy_duckdb_bit_parity():
    """Property sweep (r4 driver-gate flake): the per-(doc,term) BM25
    micro score must agree BIT-FOR-BIT between the vectorized numpy
    kernel and DuckDB scalar SQL over a wide random grid, including
    floor-boundary-adjacent combos.  The rational formulation has zero
    float additions, so any disagreement is a real regression."""
    import duckdb
    import math

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n = 50_000
    tf = rng.integers(1, 500, n).astype(np.int64)
    dl = (tf + rng.integers(0, 5_000, n)).astype(np.int64)
    df = rng.integers(1, 10_000, n).astype(np.int64)
    n_docs = (df + rng.integers(1, 1_000_000, n)).astype(np.int64)
    avg = rng.integers(5, 2_000, n).astype(np.int64)
    sum_dl = n_docs * avg  # plausible corpus totals

    # numpy kernel — the exact expression from ops/retrieval.bm25_topk
    idf = np.asarray([math.log((2 * int(N) + 2) / (2 * int(d) + 1))
                      for N, d in zip(n_docs, df)], dtype=np.float64)
    nu = (22 * tf * sum_dl).astype(np.float64)
    dd = (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs) \
        .astype(np.float64)
    mine = np.floor(((1000000.0 * idf) * nu) / dd).astype(np.int64)

    con = duckdb.connect()
    con.register("g", pd.DataFrame({
        "tf": tf, "dl": dl, "df": df, "n_docs": n_docs,
        "sum_dl": sum_dl}))
    theirs = con.execute("""
        SELECT CAST(floor(
            ((1000000.0 * ln(CAST(2 * n_docs + 2 AS DOUBLE)
                             / CAST(2 * df + 1 AS DOUBLE)))
             * CAST(22 * tf * sum_dl AS DOUBLE))
            / CAST(10 * tf * sum_dl + 3 * sum_dl
                   + 9 * dl * n_docs AS DOUBLE)
        ) AS BIGINT) AS micro FROM g
    """).fetchnumpy()["micro"]
    assert (mine == theirs).all(), \
        f"{(mine != theirs).sum()} of {n} micro scores differ"


def test_tfidf_large_vocab_path_string_doc_ids(ray_session):
    """VERDICT r4 #7: the explode/join large-vocab path must handle
    STRING doc ids (crc32 partition key) and agree exactly with the
    broadcast small-vocab path."""
    import numpy as np
    import ray.data as rd

    from open_thoughts_ray.ops.retrieval import tfidf_top_terms

    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{int(v)}" for v in rng.integers(0, 80, 25))
             for _ in range(120)]
    t = pa.table({
        "doc_id": pa.array([f"doc-{i:04d}" for i in range(120)],
                           pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(6)
    small = tfidf_top_terms(ds, k=3).to_pandas()
    large = tfidf_top_terms(ds, k=3, max_driver_vocab=0).to_pandas()
    key = ["doc_id", "term"]
    s = small.sort_values(key).reset_index(drop=True)
    l = large.sort_values(key).reset_index(drop=True)
    assert s.equals(l)
    assert len(s) == 3 * 120


def test_js_divergence_exact_int_totals(ray_session):
    """VERDICT r4 #7: corpus totals fold as exact int64 Sums — the JS
    value must equal a pure-Python-integer serial reference bit-for-bit
    (same ln calls, same mixture scale c = B·a + A·b over 2AB)."""
    import math

    import numpy as np
    import ray.data as rd

    from open_thoughts_ray.ops.consensus import js_divergence

    rng = np.random.default_rng(13)

    def corpus(seed_off):
        return [" ".join(f"w{int(v)}"
                         for v in rng.integers(seed_off, seed_off + 50, 30))
                for _ in range(80)]

    ta, tb = corpus(0), corpus(20)  # overlapping vocabularies
    dsa = rd.from_arrow(pa.table({"text": pa.array(ta, pa.string())})) \
        .repartition(4)
    dsb = rd.from_arrow(pa.table({"text": pa.array(tb, pa.string())})) \
        .repartition(4)
    got = js_divergence(dsa, dsb)

    def counts(texts):
        c: dict = {}
        for t in texts:
            for tok in (t or "").split(" "):
                c[tok] = c.get(tok, 0) + 1
        return c

    ca, cb = counts(ta), counts(tb)
    A, B = sum(ca.values()), sum(cb.values())  # exact Python ints
    SA = sum(v * math.log(v) for v in ca.values())
    SB = sum(v * math.log(v) for v in cb.values())
    toks = set(ca) | set(cb)
    SC = sum((B * ca.get(t, 0) + A * cb.get(t, 0))
             * math.log(B * ca.get(t, 0) + A * cb.get(t, 0))
             for t in toks)
    two_ab = (2 * A) * B
    h_m = np.log(two_ab) - SC / two_ab
    ref = float(h_m - 0.5 * ((np.log(A) - SA / A) + (np.log(B) - SB / B)))
    # summation ORDER of the float partials differs across partitions,
    # so allow ulp-scale drift only — far below the 1e-6 quantization
    assert got == pytest.approx(ref, abs=1e-12)
    assert 0.0 < got < math.log(2)
