"""Similarity-search tests: brute-force exactness + IVF recall."""

import numpy as np
import pyarrow as pa

from anycrawl_ray.functions.ann import (
    IVFIndex,
    TopKMerger,
    batch_topk,
    embedding_matrix,
    kmeans_lite,
)
from anycrawl_ray.functions.dedup import l2_normalize


def make_vectors(n=200, d=16, seed=3):
    rng = np.random.RandomState(seed)
    return np.arange(n), rng.randn(n, d)


def brute_topk(ids, mat, q, k):
    sims = l2_normalize(mat) @ (q / np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


def test_embedding_matrix_roundtrip():
    mat = np.arange(12, dtype=np.float64).reshape(4, 3)
    t = pa.table({"embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32()))})
    out = embedding_matrix(t)
    assert out.shape == (4, 3)
    assert np.allclose(out, mat)


def test_partial_topk_merge_equals_bruteforce():
    ids, mat = make_vectors()
    q = mat[0]
    expected = brute_topk(ids, mat, q, 10)
    merger = TopKMerger(10)
    for lo in range(0, len(ids), 64):  # simulate per-batch partial top-k
        bi, bs = batch_topk(ids[lo : lo + 64], mat[lo : lo + 64], q, 10)
        merger.offer(bi, bs)
    got = merger.result()
    assert [i for i, _ in got] == [i for i, _ in expected]
    assert np.allclose([s for _, s in got], [s for _, s in expected])


def test_kmeans_deterministic():
    _, mat = make_vectors()
    c1 = kmeans_lite(mat, 8)
    c2 = kmeans_lite(mat, 8)
    assert np.allclose(c1, c2)


def test_ivf_recall():
    ids, mat = make_vectors(n=500)
    q = mat[42]
    exact = {i for i, _ in brute_topk(ids, mat, q, 10)}
    idx = IVFIndex(ids, mat, n_cells=8)
    got = {i for i, _ in idx.search(q, 10, nprobe=4)}
    assert len(exact & got) >= 8  # >=80% recall probing half the cells
    full = {i for i, _ in idx.search(q, 10, nprobe=8)}
    assert full == exact  # probing all cells == exact


def test_ann_ivf_query_recall_vs_exact(ray_session):
    """Driver entry q_ann_ivf vs exact q_ann_cosine. On sf0.01 (unclustered
    vectors — max pairwise cos ~0.51) fractional-probe recall is inherently
    limited: gate at >=80% like test_ivf_recall. On a CLUSTERED corpus (the
    case IVF exists for) the gate is >=90% (next test)."""
    from anycrawl_ray.queries import q_ann_cosine, q_ann_ivf

    exact = q_ann_cosine("/root/testdata/sf0.01")
    approx = q_ann_ivf("/root/testdata/sf0.01")
    e = set(exact.column("vec_id").to_pylist())
    a = set(approx.column("vec_id").to_pylist())
    assert len(e & a) >= 8
    # scores of common hits are exact cosines (same arithmetic)
    ec = dict(zip(exact.column("vec_id").to_pylist(), exact.column("cos").to_pylist()))
    ac = dict(zip(approx.column("vec_id").to_pylist(), approx.column("cos").to_pylist()))
    for v in e & a:
        assert abs(ec[v] - ac[v]) < 1e-9


def test_ann_ivf_query_recall_clustered(ray_session, tmp_path):
    """>=90% recall on a corpus with real cluster structure (8 Gaussian
    clusters; the query's neighbors live in its own cluster)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from anycrawl_ray.queries import q_ann_cosine, q_ann_ivf

    rng = np.random.RandomState(5)
    centers = rng.randn(8, 32) * 4
    vecs = np.concatenate(
        [centers[i % 8] + rng.randn(1, 32) * 0.5 for i in range(2000)]
    )
    t = pa.table(
        {"vec_id": pa.array(range(2000), pa.int64()),
         "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)],
                               pa.list_(pa.float32()))}
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    exact = q_ann_cosine(str(tmp_path))
    approx = q_ann_ivf(str(tmp_path))
    e = set(exact.column("vec_id").to_pylist())
    a = set(approx.column("vec_id").to_pylist())
    assert len(e & a) >= 9


def test_ann_indexed_equals_streamed_ivf(ray_session):
    """The persisted-index path probes the same cells with the same
    centroids as the streamed q_ann_ivf — result sets must be identical."""
    from anycrawl_ray.queries import q_ann_indexed, q_ann_ivf

    sf = "/root/testdata/sf0.01"
    a = q_ann_ivf(sf)
    b = q_ann_indexed(sf)
    assert a.column("vec_id").to_pylist() == b.column("vec_id").to_pylist()
    assert a.column("cos").to_pylist() == b.column("cos").to_pylist()


def test_kmeans_distributed_matches_dense_numpy(ray_session):
    """Streaming sufficient-statistics Lloyd == dense in-memory Lloyd."""
    import pyarrow.parquet as pq
    from anycrawl_ray.functions.ann import embedding_matrix, kmeans_distributed
    from anycrawl_ray.queries import _read

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = embedding_matrix(t)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    k = 8
    cents = mat[ids < k].copy()
    for _ in range(3):
        a = np.argmin(((mat[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = mat[m].mean(axis=0)
    a = np.argmin(((mat[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1)
    counts = np.bincount(a, minlength=k)

    ds = _read(sf, "embeddings", ["vec_id", "embedding"])
    init = mat[ids < k].copy()
    got_c, got_n = kmeans_distributed(ds, init, iters=3, batch_size=128)
    assert np.allclose(got_c, cents, atol=1e-9)
    assert got_n.tolist() == counts.tolist()


def test_ann_pq_recall_vs_exact(ray_session):
    """PQ+ADC+exact-rerank top-10 must recover >= 9 of the exact top-10
    (rerank makes surviving candidates exact, so only candidate-set misses
    can cost recall)."""
    from anycrawl_ray.queries import q_ann_cosine, q_ann_pq

    sf = "/root/testdata/sf0.01"
    exact = q_ann_cosine(sf)
    approx = q_ann_pq(sf)
    e = set(exact.column("vec_id").to_pylist())
    a = set(approx.column("vec_id").to_pylist())
    assert len(e & a) >= 9, (sorted(e), sorted(a))
    # surviving overlap rows carry EXACT cosines — values must agree
    em = dict(zip(exact.column("vec_id").to_pylist(),
                  exact.column("cos").to_pylist()))
    for vid, cos in zip(approx.column("vec_id").to_pylist(),
                        approx.column("cos").to_pylist()):
        if vid in em:
            assert abs(em[vid] - cos) < 1e-9
