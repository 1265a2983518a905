"""Dedup operator tests — minhash/simhash verified against brute force."""

import numpy as np
import pyarrow as pa
import pytest

from anycrawl_ray.functions import dedup as dd


BASE = "the quick brown fox jumps over the lazy dog again and again today"


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
