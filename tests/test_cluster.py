import numpy as np
import pandas as pd
import pytest


def _blobs(n_per=80, k=4, dim=16, spread=0.05, seed=5):
    """Well-separated unit-norm clusters with a few near-duplicates."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(k):
        pts = centers[c] + spread * rng.standard_normal((n_per, dim))
        rows.append(pts)
    m = np.vstack(rows)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.arange(len(m))
    return pd.DataFrame({"vec_id": ids,
                         "embedding": [v.astype(np.float32).tolist()
                                       for v in m]})


def _to_ds(df, blocks=5):
    import ray.data as rd

    return rd.from_pandas(df, override_num_blocks=blocks)


def test_kmeans_fit_matches_serial_reference(ray_session):
    """The distributed partial-sum Lloyd must be BIT-IDENTICAL to a
    single-process replay of the same fixed-point recipe — int64
    quantized assignments and sums are order-free, so equality is
    exact, not allclose (the property the golden-fixture gate needs)."""
    from open_thoughts_ray.ops.cluster import (_quantize, _seed_centroids,
                                               kmeans_fit)

    df = _blobs()
    m = np.stack(df.embedding.to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    ds = _to_ds(df)
    got = kmeans_fit(ds, k=4, iters=6, seed=11)

    # serial reference with the identical init + quantization recipe
    thin = ds.select_columns(["embedding"]).materialize()
    cent = _seed_centroids(thin, "embedding", 4, 11, 4096)
    qm = _quantize(m)
    for _ in range(6):
        a = (qm @ _quantize(cent).T).argmax(axis=1)
        new = cent.copy()
        for c in range(4):
            members = qm[a == c]
            if len(members):
                v = members.sum(axis=0).astype(np.float64)
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[c] = v / nrm
        if np.allclose(new, cent, atol=1e-12):
            cent = new
            break
        cent = new

    assert got.shape == cent.shape
    assert np.array_equal(got, cent)


def test_kmeans_fit_block_count_invariant(ray_session):
    """Different block counts (≈ different parallelism) must give the
    bit-identical fit — the regression canary for the order-free int64
    reduction."""
    from open_thoughts_ray.ops.cluster import kmeans_fit

    df = _blobs(seed=17)
    a = kmeans_fit(_to_ds(df, blocks=1), k=4, iters=5, seed=11)
    b = kmeans_fit(_to_ds(df, blocks=13), k=4, iters=5, seed=11)
    assert np.array_equal(a, b)


def test_semantic_dedup_block_count_invariant(ray_session):
    from open_thoughts_ray.ops.cluster import semantic_dedup

    df = _blobs(spread=0.02, seed=23)
    a = sorted(semantic_dedup(_to_ds(df, blocks=2), k=4, threshold=0.999,
                              iters=5, seed=11).to_pandas().vec_id)
    b = sorted(semantic_dedup(_to_ds(df, blocks=11), k=4, threshold=0.999,
                              iters=5, seed=11).to_pandas().vec_id)
    assert a == b


def test_kmeans_assign_separates_blobs(ray_session):
    from open_thoughts_ray.ops.cluster import kmeans_assign, kmeans_fit

    df = _blobs()
    ds = _to_ds(df)
    cent = kmeans_fit(ds, k=4, iters=6, seed=11)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    lab = out["cluster"].to_numpy()
    # each ground-truth blob of 80 must land in exactly one cluster
    for b in range(4):
        assert len(set(lab[b * 80:(b + 1) * 80])) == 1
    assert len(set(lab[::80])) == 4


@pytest.mark.parametrize("chunk", [4096, 7])
def test_semantic_dedup_matches_bruteforce_on_separated_blobs(ray_session,
                                                              chunk):
    """With well-separated clusters every near-dup pair is
    intra-cluster, so SemDeDup must equal the exact all-pairs rule:
    drop iff some lower-id row has cosine ≥ t."""
    from open_thoughts_ray.ops.cluster import semantic_dedup

    df = _blobs(spread=0.02, seed=9)
    m = np.stack(df.embedding.to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    t = 0.999
    sims = m @ m.T
    brute = [i for i in range(len(m))
             if not (sims[i, :i] >= t).any()]

    out = semantic_dedup(_to_ds(df), k=4, threshold=t, iters=6, seed=11,
                         chunk=chunk)
    got = sorted(out.to_pandas()["vec_id"].tolist())
    assert got == brute
    assert len(got) < len(df)  # some dups actually collapsed
