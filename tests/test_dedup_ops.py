import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.ops.dedup import exact_dedup, label_propagation, union_find_canonical
from open_thoughts_ray.ops.dedup_text import (
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard,
    simhash64,
    simhash_dedup,
)


def test_union_find_canonical():
    canon = union_find_canonical(["b", "c", "x"], ["a", "b", "y"])
    assert canon["a"] == "a" and canon["b"] == "a" and canon["c"] == "a"
    assert canon["x"] == "x" and canon["y"] == "x"


def test_exact_dedup_keep_first(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "id": [5, 1, 3, 2, 4],
        "key": ["a", "a", "b", "b", "c"],
        "payload": list("vwxyz"),
    })
    out = exact_dedup(rd.from_pandas(df), ["key"], "id").to_pandas().sort_values("key")
    assert list(out.id) == [1, 2, 4]  # min id per key survives


def test_minhash_similarity_estimate():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    c = "completely different content with nothing shared at all whatsoever here"
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    assert est_ab > 0.5 > est_ac


def test_minhash_lsh_dedup_finds_planted(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog while the calm "
            "river flows past the old stone bridge in the quiet valley")
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": f"unique document number {i} about topic "
                                          + " ".join(f"w{i}{j}" for j in range(12))})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base.replace("quiet", "silent")})
    rows.append({"doc_id": 102, "text": base})
    out = minhash_lsh_dedup(rd.from_pandas(pd.DataFrame(rows)), threshold=0.6).to_pandas()
    ids = set(out.doc_id)
    assert 100 in ids and 101 not in ids and 102 not in ids
    assert all(i in ids for i in range(30))


def test_simhash_dedup_finds_planted(ray_session):
    import ray.data as rd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [{"doc_id": i, "text": f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(15))}
            for i in range(20)]
    rows.append({"doc_id": 50, "text": base})
    rows.append({"doc_id": 51, "text": base.replace("kappa", "kappa2")})
    out = simhash_dedup(rd.from_pandas(pd.DataFrame(rows)), hamming_max=6).to_pandas()
    ids = set(out.doc_id)
    assert 50 in ids and 51 not in ids


def test_simhash_identical_texts():
    assert simhash64("a b c") == simhash64("a b c")
    assert simhash64("a b c") != simhash64("x y z")


def test_minhash_md5_earlier_matches_bruteforce(ray_session):
    """hasher='md5' + semantics='earlier' (the SQL-checked path) must
    equal the all-pairs rule: drop iff some smaller id shares a band AND
    signature agreement ≥ threshold."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import (_hash_family,
                                                  minhash_signatures_batch)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat sleeps on the warm windowsill in the afternoon sun")
    rows = [{"doc_id": i, "text": f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(15))}
            for i in range(25)]
    rows.append({"doc_id": 50, "text": base})
    rows.append({"doc_id": 51, "text": base.replace("cat", "kitten")})
    rows.append({"doc_id": 52, "text": base})
    df = pd.DataFrame(rows)
    out = minhash_lsh_dedup(rd.from_pandas(df), threshold=0.7, hasher="md5",
                            semantics="earlier").to_pandas()
    k, bands = 64, 16
    r = k // bands
    sig = minhash_signatures_batch(list(df.text), k, 3, _hash_family(k), "md5")
    ids = list(df.doc_id)
    expect = set()
    for i in range(len(ids)):
        dropped = False
        for j in range(i):
            share = any((sig[i, b * r:(b + 1) * r] == sig[j, b * r:(b + 1) * r]).all()
                        for b in range(bands))
            if share and (sig[i] == sig[j]).mean() >= 0.7:
                dropped = True
                break
        if not dropped:
            expect.add(ids[i])
    assert set(out.doc_id) == expect
    assert 50 in expect and 52 not in expect


def test_simhash_md5_scalar_batch_parity():
    from open_thoughts_ray.ops.dedup_text import simhash64_batch

    texts = ["a b c", "a b c d", "", "x", "hello world hello", "a a a b",
             "the quick brown fox jumps over the lazy dog"]
    scalar = [simhash64(t, hasher="md5") for t in texts]
    batch = simhash64_batch(texts, hasher="md5")
    assert [int(v) for v in batch] == scalar
    # md5 orientation contract the SQL oracle relies on: output bit k is
    # the sign-of-sum of input bit k
    import hashlib

    t = "alpha beta alpha"
    v = [0] * 64
    for tok in t.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for k in range(64):
            v[k] += 1 if (h >> k) & 1 else -1
    expect = sum((1 << k) for k in range(64) if v[k] > 0)
    assert simhash64(t, hasher="md5") == expect


def test_simhash_dedup_earlier_semantics_matches_bruteforce(ray_session):
    """semantics='earlier' (the SQL-checked path) must equal the
    all-pairs first-seen rule: drop iff hamming ≤ t to ANY smaller id."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup_text import simhash64_batch

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [{"doc_id": i, "text": f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(15))}
            for i in range(25)]
    rows.append({"doc_id": 50, "text": base})
    rows.append({"doc_id": 51, "text": base.replace("kappa", "kappa2")})
    rows.append({"doc_id": 52, "text": base})
    df = pd.DataFrame(rows)
    out = simhash_dedup(rd.from_pandas(df), hamming_max=3, hasher="md5",
                        semantics="earlier").to_pandas()
    h = simhash64_batch(list(df.text), hasher="md5")
    ids = list(df.doc_id)
    expect = set()
    for i in range(len(ids)):
        if not any(bin(int(h[i]) ^ int(h[j])).count("1") <= 3
                   for j in range(i)):
            expect.add(ids[i])
    assert set(out.doc_id) == expect
    assert 50 in expect and 52 not in expect


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "v w x y z") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e f", "a b c d e g") < 1.0


def test_label_propagation_components(ray_session):
    import ray.data as rd

    nodes = rd.from_pandas(pd.DataFrame({"id": list("abcdexy")}))
    edges = rd.from_pandas(pd.DataFrame({"a": ["b", "c", "d", "x"],
                                         "b": ["a", "b", "e", "y"]}))
    out = label_propagation(nodes, edges).to_pandas().set_index("id")["label"].to_dict()
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["d"] == out["e"]
    assert out["x"] == out["y"] == "x"


def test_cross_band_edge_survives_skewed_lowest_band(ray_session):
    """Regression (ADVICE r1): a Hamming-2 pair whose LOWEST agreeing
    band has an oversized bucket (pair outside the neighbor window there)
    must still be detected via a higher band.  The old emit-only-from-
    the-lowest-band optimization silently lost this edge."""
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import near_dup_edges

    base = 0x0000_1234_5678_9ABC  # low 48 bits shared by x and y
    x = (0x1000 << 48) | base
    y = (0x1003 << 48) | base  # differs from x in 2 bits, all in band 3
    rows = [("x", x), ("y", y)]
    # fillers: same band-0 value, numerically BETWEEN x and y (band3 is
    # the numeric high part), Hamming-far from both in bands 1-2
    for i, mid in enumerate((0x1001, 0x1002)):
        for j in range(3):
            filler = (mid << 48) | ((0xBEE0 + 0x1111 * (i * 3 + j)) << 16) | (base & 0xFFFF)
            rows.append((f"f{i}{j}", filler))
    df = pd.DataFrame({
        "image_id": [r[0] for r in rows],
        "phash": np.array([r[1] for r in rows], dtype=np.uint64).view(np.int64),
    })
    edges = near_dup_edges(
        rd.from_pandas(df), bands=4, hamming_max=2, max_bucket=3, window=1,
        num_partitions=4,
    ).to_pandas()
    pairs = set(map(tuple, edges[["a", "b"]].itertuples(index=False)))
    assert ("x", "y") in pairs or ("y", "x") in pairs


def test_minhash_batch_matches_single():
    from open_thoughts_ray.ops.dedup_text import (
        _hash_family,
        minhash_signature,
        minhash_signatures_batch,
    )

    fam = _hash_family(64)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "x y",
        "one two three four five six seven eight nine ten",
    ]
    batch = minhash_signatures_batch(texts, 64, 3, fam)
    for i, t in enumerate(texts):
        assert (batch[i] == minhash_signature(t, 64, 3, fam)).all()


def test_minhash_oversized_bucket_window_fallback():
    """Oversized LSH buckets must use a neighbor window, not silently
    truncate members (ADVICE r1)."""
    from open_thoughts_ray.ops.dedup_text import minhash_partition_pairs

    n = 10
    g = pd.DataFrame({
        "band_key": [7] * n,
        "id": [f"d{i:02d}" for i in range(n)],
    })
    out = minhash_partition_pairs(g, max_bucket=4, window=2).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].itertuples(index=False)))
    # adjacent ids are within the window even though the bucket (10) far
    # exceeds max_bucket (4)
    for i in range(n - 1):
        assert (f"d{i:02d}", f"d{i+1:02d}") in pairs
    # all-pairs was NOT used (far pair absent) — the skew cap is active
    assert ("d00", "d09") not in pairs


def test_near_dup_keep_best_quality_winner(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import near_dup_keep_best

    # cluster {a,b,c}: phashes within hamming<=3, best quality wins
    df = pd.DataFrame({
        "image_id": ["a", "b", "c", "d", "e"],
        "phash": [0x0F0F0F0F0F0F0F0F,
                  0x0F0F0F0F0F0F0F0E,          # 1 bit from a
                  0x0F0F0F0F0F0F0F0C,          # 2 bits from a
                  0x7777777777777777,          # isolated
                  -0x1234567887654321],        # isolated
        "quality": [100, 500, 300, 10, 20],
    })
    got = near_dup_keep_best(rd.from_pandas(df), bands=2, hamming_max=3,
                             num_partitions=4).to_pandas()
    assert sorted(got["image_id"]) == ["b", "d", "e"]

    dist = near_dup_keep_best(rd.from_pandas(df), bands=2, hamming_max=3,
                              num_partitions=4,
                              max_driver_edges=0).to_pandas()
    assert sorted(dist["image_id"]) == ["b", "d", "e"]


def test_near_dup_keep_best_tie_breaks_min_id(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import near_dup_keep_best

    df = pd.DataFrame({
        "image_id": ["z2", "z1", "z3"],
        "phash": [0x00000000000000FF] * 3,   # one exact cluster
        "quality": [7, 7, 5],
    })
    got = near_dup_keep_best(rd.from_pandas(df), bands=2, hamming_max=3,
                             num_partitions=4).to_pandas()
    assert got["image_id"].tolist() == ["z1"]


def test_delta_ingest_dedup(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import delta_ingest_dedup

    seen = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["alpha beta gamma", "delta epsilon"]})
    new = pd.DataFrame({"doc_id": [10, 11, 12],
                        "text": ["alpha beta gamma",      # exact re-crawl
                                 "fresh unseen content",
                                 "delta epsilon FOOTER"]})  # prefix match
    # full-text fingerprint: only the exact copy drops
    out = delta_ingest_dedup(rd.from_pandas(new), rd.from_pandas(seen),
                             num_partitions=4).to_pandas()
    assert sorted(out["doc_id"]) == [11, 12]
    # 2-token-prefix fingerprint: the footer-appended re-fetch drops too
    out2 = delta_ingest_dedup(rd.from_pandas(new), rd.from_pandas(seen),
                              num_partitions=4,
                              prefix_tokens=2).to_pandas()
    assert sorted(out2["doc_id"]) == [11]


def test_fingerprint_components_transitive_merge(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import fingerprint_components

    # doc 0 and 1 share a PREFIX; doc 1 and 2 share a SUFFIX → one
    # transitive component {0,1,2}; doc 3 isolated; numeric-min labels
    # (doc 10 in the component checks zero-pad ordering vs '2')
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 10],
        "text": ["p1 p2 p3 mid xa xb xc",
                 "p1 p2 p3 other s1 s2 s3",
                 "zz yy ww other s1 s2 s3",
                 "totally different doc here entirely now",
                 "p1 p2 p3 trailing words vary wildly"],
    })
    got = (fingerprint_components(rd.from_pandas(df), num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["component"].tolist() == [0, 0, 0, 3, 0]


def test_snapshot_diff_classes(ray_session):
    import ray.data as rd

    from open_thoughts_ray.ops.dedup import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["same one", "will change", "gets removed"]})
    new = pd.DataFrame({"doc_id": [1, 2, 4],
                        "text": ["same one", "has changed", "brand new"]})
    t = snapshot_diff(rd.from_pandas(old), rd.from_pandas(new),
                      num_partitions=4)
    assert t.column("n_added").to_pylist() == [1]
    assert t.column("n_removed").to_pylist() == [1]
    assert t.column("n_changed").to_pylist() == [1]
    assert t.column("n_unchanged").to_pylist() == [1]
