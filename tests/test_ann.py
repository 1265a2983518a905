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
