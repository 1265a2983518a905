"""Dedup operator tests — minhash/simhash verified against brute force."""

import numpy as np
import pyarrow as pa
import pytest

from anycrawl_ray.functions import dedup as dd


BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the patient grey owl watches from a tall oak tree near the "
    "river bend and counts every passing cloud in the warm afternoon sky "
    "before gliding home across the quiet meadow at dusk"
)


def make_docs():
    """Docs with known near-dups: d1~d0 (1-word edit), d3~d2, d5 unique."""
    return {
        "d0": BASE,
        "d1": BASE.replace("lazy", "sleepy"),
        "d2": "completely different content about ray data pipelines and arrow",
        "d3": "completely different content about ray data pipelines and parquet",
        "d4": "yet another unrelated string of words for testing purposes only",
        "d5": " ".join(f"w{i}" for i in range(30)),
    }


def brute_force_pairs(docs, threshold):
    sh = {k: np.unique(dd.shingle_hashes(v)) for k, v in docs.items()}
    ids = sorted(docs)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = dd.jaccard(sh[ids[i]], sh[ids[j]])
            if jac >= threshold:
                out.append((ids[i], ids[j]))
    return set(out), sh


def test_minhash_signature_similarity_tracks_jaccard():
    a, b = dd._perm_params(128)
    docs = make_docs()
    s0 = dd.minhash_signature(np.unique(dd.shingle_hashes(docs["d0"])), a, b)
    s1 = dd.minhash_signature(np.unique(dd.shingle_hashes(docs["d1"])), a, b)
    s2 = dd.minhash_signature(np.unique(dd.shingle_hashes(docs["d2"])), a, b)
    sim01 = (s0 == s1).mean()
    sim02 = (s0 == s2).mean()
    assert sim01 > 0.5 > sim02  # near-dup agrees on most perms, unrelated doesn't


def test_minhash_lsh_finds_true_pairs_exactly():
    docs = make_docs()
    true_pairs, sh = brute_force_pairs(docs, threshold=0.5)
    assert len(true_pairs) >= 2  # fixture sanity: d0-d1 and d2-d3

    table = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    hasher = dd.MinHasher(num_perms=64, k=3)
    sigs = hasher(table)
    bands = dd.band_rows(sigs, bands=32)
    cand = dd.candidate_pairs_from_buckets(bands)
    verified = {(a, b) for a, b, _ in dd.verify_pairs(cand, sh, threshold=0.5)}
    # exact-verify makes precision 1.0; banding (16 bands x 4 rows) makes
    # recall 1.0 at jaccard >= 0.5 on this fixture
    assert verified == true_pairs


def test_simhash_near_dup_small_hamming():
    docs = make_docs()
    h = dd.simhash64_batch(list(docs.values()))
    ids = list(docs)
    d = {k: v for k, v in zip(ids, h)}
    ham = lambda x, y: int(dd.hamming64(np.array([d[x]]), np.array([d[y]]))[0])
    assert ham("d0", "d1") < ham("d0", "d2")
    assert ham("d2", "d3") < ham("d2", "d4")
    assert ham("d0", "d0") == 0


def test_simhash_bands_block_near_dups():
    docs = make_docs()
    h = dd.simhash64_batch([docs["d0"], docs["d1"]])
    bands = dd.simhash_bands(h)
    # hamming(d0,d1) is small -> at least one 16-bit band identical
    assert (bands[0] == bands[1]).any()


def test_jaccard_edges():
    e = np.array([], dtype=np.uint64)
    x = np.array([1, 2, 3], dtype=np.uint64)
    assert dd.jaccard(e, e) == 1.0
    assert dd.jaccard(x, e) == 0.0
    assert dd.jaccard(x, x) == 1.0


def test_cosine_pairs_and_normalize():
    mat = np.array([[1.0, 0.0], [0.99, 0.01], [0.0, 1.0]])
    ids = np.array([10, 20, 30])
    n = dd.l2_normalize(mat)
    pairs = dd.cosine_pairs_block(ids, n, ids, n, threshold=0.95)
    keys = {(a, b) for a, b, _ in pairs}
    assert (10, 20) in keys and (10, 30) not in keys


# ---------------------------------------------------------------------------
# Distributed path (band rows in map_batches -> one co-partitioned groupby)
# ---------------------------------------------------------------------------


def test_band_hash_matrix_matches_band_rows():
    docs = make_docs()
    hasher = dd.MinHasher(num_perms=64, k=3)
    sigs_t = hasher(pa.table({"doc_id": list(docs), "text": list(docs.values())}))
    legacy = dd.band_rows(sigs_t, bands=32)
    sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in sigs_t.column("signature").to_pylist()])
    mat = dd.band_hash_matrix(sigs, bands=32)
    assert mat.shape == (len(docs), 32)
    legacy_hashes = np.asarray(legacy.column("band_hash")).reshape(len(docs), 32)
    assert (mat == legacy_hashes.astype(np.uint64)).all()


def _int_docs_table():
    docs = make_docs()
    return pa.table(
        {"doc_id": pa.array(list(range(len(docs))), pa.int64()),
         "text": list(docs.values())}
    ), docs


def test_minhash_distributed_matches_legacy(ray_session):
    import ray.data as rd
    from anycrawl_ray.queries import minhash_dedup_dataset

    table, docs = _int_docs_table()
    # legacy driver-side path
    hasher = dd.MinHasher(num_perms=64, k=3)
    cand = dd.candidate_pairs_from_buckets(dd.band_rows(hasher(table), bands=32))
    sh = {
        d: s
        for d, s in zip(
            table.column("doc_id").to_pylist(),
            dd.shingle_hashes_batch(table.column("text").to_pylist()),
        )
    }
    legacy = {(a, b) for a, b, _ in dd.verify_pairs(cand, sh, threshold=0.5)}

    out = minhash_dedup_dataset(rd.from_arrow(table), n_parts=4)
    got = set(zip(out.column("a_id").to_pylist(), out.column("b_id").to_pylist()))
    assert got == legacy and len(got) >= 2


def test_minhash_join_verify_matches_broadcast(ray_session):
    import ray.data as rd
    from anycrawl_ray.queries import minhash_dedup_dataset

    table, _ = _int_docs_table()
    a = minhash_dedup_dataset(rd.from_arrow(table), n_parts=4, verify="broadcast")
    b = minhash_dedup_dataset(rd.from_arrow(table), n_parts=4, verify="join")
    assert a.to_pydict() == b.to_pydict()


def brute_force_simhash_pairs(ids, texts, max_hamming=3):
    h = dd.simhash64_batch(texts)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if int(dd.hamming64(h[i : i + 1], h[j : j + 1])[0]) <= max_hamming:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_simhash_distributed_full_recall_on_hot_bucket(ray_session):
    """A degenerate band bucket (>64 docs sharing one 16-bit band value) must
    NOT drop true hamming<=3 pairs — the round-1 cap did (ADVICE).

    Brute force over all pairs is the recall oracle. Only pairs that share at
    least one band are reachable by blocking, and hamming<=3 over 4x16-bit
    bands guarantees a shared band (pigeonhole), so distributed == brute."""
    import ray.data as rd
    from anycrawl_ray.queries import simhash_dedup_dataset

    # 240 docs over 35 near-identical variants -> degenerate >64-doc band
    # buckets plus controlled near-dup pairs
    base = " ".join(f"tok{i}" for i in range(40))
    texts = []
    for i in range(240):
        # vary two rare words -> small hamming perturbations of a shared hash
        texts.append(base + f" uniq{i % 7} tail{i % 5}")
    ids = list(range(240))
    brute = brute_force_simhash_pairs(ids, texts)
    assert brute, "fixture must contain true near-dup pairs"

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}))
    out = simhash_dedup_dataset(ds, n_parts=4)
    got = set(zip(out.column("a_id").to_pylist(), out.column("b_id").to_pylist()))
    assert got == brute  # full recall, no hot-bucket drop

    # sanity: the fixture really does produce an over-64 bucket somewhere
    h = dd.simhash64_batch(texts)
    bands = dd.simhash_bands(h)
    from collections import Counter

    counts = Counter((b, int(v)) for row in bands for b, v in enumerate(row))
    assert max(counts.values()) > 64


def test_embedding_lsh_recall_on_clustered_corpus(ray_session):
    """Hyperplane-LSH scale path vs exact brute force at cos>=0.95 on a
    clustered corpus: precision 1.0 (exact verify) and recall >=0.9."""
    import ray.data as rd

    from anycrawl_ray.queries import embedding_lsh_dedup_dataset

    rng = np.random.RandomState(11)
    centers = rng.randn(40, 32) * 6
    rows, ids = [], []
    for i in range(600):
        rows.append(centers[i % 40] + rng.randn(32) * 0.12)
        ids.append(i)
    mat = np.asarray(rows)
    nm = dd.l2_normalize(mat)
    sims = nm @ nm.T
    brute = {
        (a, b)
        for a in range(600)
        for b in range(a + 1, 600)
        if sims[a, b] >= 0.95
    }
    assert len(brute) >= 50, "fixture must contain near-dup pairs"

    t = pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64()))}
    )
    out = embedding_lsh_dedup_dataset(rd.from_arrow(t), threshold=0.95, n_parts=4)
    got = set(zip(out.column("a_id").to_pylist(), out.column("b_id").to_pylist()))
    assert got <= brute  # exact verify -> no false positives
    assert len(got) >= 0.9 * len(brute)
    # cos values are exact (same arithmetic as the brute force)
    for a, b, c in zip(out.column("a_id").to_pylist(),
                       out.column("b_id").to_pylist(),
                       out.column("cos").to_pylist()):
        assert abs(c - round(float(sims[a, b]), 6)) < 1e-9


def test_minhash_incremental_equals_filtered_full(ray_session):
    """Index(old) + shard(new) must equal full recompute filtered to
    new-touching pairs — the exactness claim of the incremental path."""
    import tempfile

    import ray.data as rd

    from anycrawl_ray.queries import (
        minhash_dedup_dataset,
        minhash_dedup_incremental,
        write_minhash_index,
    )

    sf = "/root/testdata/sf0.01/documents.parquet"
    split = 400
    docs = rd.read_parquet(sf, columns=["doc_id", "text"])
    full = minhash_dedup_dataset(rd.read_parquet(sf, columns=["doc_id", "text"]))
    idx_dir = tempfile.mkdtemp(prefix="mh_idx_test_")
    write_minhash_index(docs.filter(expr=f"doc_id < {split}"), idx_dir)
    inc = minhash_dedup_incremental(
        rd.read_parquet(sf, columns=["doc_id", "text"]).filter(
            expr=f"doc_id >= {split}"),
        idx_dir,
        rd.read_parquet(sf, columns=["doc_id", "text"]),
    )
    want = [
        (a, b, j)
        for a, b, j in zip(full.column("a_id").to_pylist(),
                           full.column("b_id").to_pylist(),
                           full.column("jaccard").to_pylist())
        if a >= split or b >= split
    ]
    got = list(zip(inc.column("a_id").to_pylist(),
                   inc.column("b_id").to_pylist(),
                   inc.column("jaccard").to_pylist()))
    assert got == want
    assert len(got) > 0  # fixture must actually exercise the path


def test_jaccard_pairs_batch_matches_scalar():
    """Vectorized pair verify == scalar jaccard on random sorted-unique
    sides, bytes and ndarray input forms, including empty sides."""
    rng = np.random.RandomState(7)
    sides_a, sides_b = [], []
    for _ in range(200):
        na, nb = rng.randint(0, 40), rng.randint(0, 40)
        pool = rng.choice(10_000, size=60, replace=False).astype(np.uint64)
        sides_a.append(np.unique(pool[:na]))
        sides_b.append(np.unique(pool[20:20 + nb]))
    expect = np.array([dd.jaccard(a, b) for a, b in zip(sides_a, sides_b)])
    got_arr = dd.jaccard_pairs_batch(sides_a, sides_b)
    got_bytes = dd.jaccard_pairs_batch([a.tobytes() for a in sides_a],
                                       [b.tobytes() for b in sides_b])
    assert np.allclose(got_arr, expect)
    assert np.allclose(got_bytes, expect)
    assert dd.jaccard_pairs_batch([], []).shape == (0,)


def test_jaccard_pairs_batch_high_dup_speedup():
    """On a heavy-dup partition (5k pairs x ~200 shingles) the batched
    kernel must beat the per-pair shape it replaced (frombuffer +
    intersect1d-jaccard per pair). Best-of-3 warm timings each — this
    host's first-touch page cost swings cold runs 2-4x."""
    import time

    rng = np.random.RandomState(11)
    base = np.unique(rng.randint(0, 1 << 30, size=240).astype(np.uint64))
    sides_a = [base[rng.rand(len(base)) < 0.9].tobytes() for _ in range(5000)]
    sides_b = [base[rng.rand(len(base)) < 0.9].tobytes() for _ in range(5000)]

    def replaced():
        return np.array([
            dd.jaccard(np.frombuffer(a, np.uint64),
                       np.frombuffer(b, np.uint64))
            for a, b in zip(sides_a, sides_b)
        ])

    def batched():
        return dd.jaccard_pairs_batch(sides_a, sides_b)

    batched(), replaced()  # warm both paths
    t_batch, t_scalar = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        got = batched()
        t_batch.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        want = replaced()
        t_scalar.append(time.perf_counter() - t0)
    assert np.allclose(got, want)
    assert min(t_batch) < min(t_scalar), (t_batch, t_scalar)
