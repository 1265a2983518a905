"""Deduplication operators for training-data pipelines.

Five dedup families, each expressed Ray-Data-first:

- exact:     within-batch combiner dedup, then groupby(key) min(doc_id) —
             the partial/final pattern (no full-table Python sets)
- minhash:   shingle -> minhash signature (map_batches, vectorized) -> band ->
             LSH bucket groupby -> candidate pairs -> exact-Jaccard verify
- simhash:   64-bit simhash (bit votes over stable token hashes) -> 16-bit
             band blocking -> hamming-distance verify
- ngram:     exact n-gram Jaccard all-pairs via broadcast small side
             (ray.put once, read per batch) — the O(n^2/p) baseline
- embedding: cosine near-dup over list<float> columns via blocked matmul

Scale notes (100 TB): candidate-pair verification here re-reads shingles from
a broadcast corpus (fine at sandbox scale); the scale path co-partitions
doc shingles by doc_id and verifies inside a hash-join stage instead. Band
tables shuffle only (band_id, band_hash, doc_id) — ~24 bytes/row — never the
documents themselves.

Public algorithms: MinHash (Broder 1997), LSH banding (Indyk-Motwani / MMDS
ch.3), SimHash (Charikar 2002).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

HASH_SEED = 7777
_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Stable uint64 hashes of k-token shingles (whitespace tokens)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return pl.Series(shingles).hash(seed=HASH_SEED).to_numpy().astype(np.uint64)


def shingle_hashes_batch(texts: list[str], k: int = 3) -> list[np.ndarray]:
    return [np.unique(shingle_hashes(t, k)) for t in texts]


def _perm_params(num_perms: int, seed: int = 99) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perms, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perms,) signature: min((a*h + b) mod 2^61-1) per permutation."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHasher:
    """map_batches actor: (doc_id, text) -> (doc_id, signature list<uint64>).

    Permutation params are built once per actor (stateful setup in __init__).
    """

    def __init__(self, num_perms: int = 64, k: int = 3):
        self.a, self.b = _perm_params(num_perms)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [
            minhash_signature(np.unique(shingle_hashes(t, self.k)), self.a, self.b)
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def band_rows(sig_table: pa.Table, bands: int = 32) -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) LSH bucket rows."""
    doc_ids = sig_table.column("doc_id").to_pylist()
    sigs = sig_table.column("signature").to_pylist()
    num_perms = len(sigs[0]) if sigs else 0
    r = max(1, num_perms // bands)
    out_band, out_hash, out_doc = [], [], []
    for d, s in zip(doc_ids, sigs):
        arr = np.asarray(s, dtype=np.uint64)
        for bi in range(bands):
            chunk = arr[bi * r : (bi + 1) * r]
            with np.errstate(over="ignore"):
                h = np.uint64(1469598103934665603)
                for v in chunk:  # FNV-style fold of the band rows
                    h = (h ^ v) * np.uint64(1099511628211)
            out_band.append(bi)
            out_hash.append(int(h))
            out_doc.append(d)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
            "doc_id": out_doc,
        }
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def candidate_pairs_from_buckets(
    band_table: pa.Table, max_bucket: int = 64
) -> set[tuple]:
    """Unique doc-id pairs sharing any LSH bucket (pairs within small groups).

    Buckets larger than ``max_bucket`` are skipped — the hot-bucket defense
    (a degenerate bucket of B docs contributes B^2/2 candidate pairs; on
    low-entropy corpora that explodes quadratically while contributing mostly
    sub-threshold pairs, which other, more selective bands still catch).
    """
    df = pl.from_arrow(band_table)
    # one vectorized group-agg, then Python only over the qualifying buckets
    # (iterating 100k+ tiny groups in Python dominates otherwise)
    grouped = (
        df.group_by(["band", "band_hash"])
        .agg(pl.col("doc_id").alias("ids"), pl.len().alias("n"))
        .filter((pl.col("n") >= 2) & (pl.col("n") <= max_bucket))
    )
    pairs: set[tuple] = set()
    for ids in grouped["ids"].to_list():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def verify_pairs(
    pairs: set[tuple], shingles_by_doc: dict, threshold: float
) -> list[tuple]:
    out = []
    for a_id, b_id in sorted(pairs):
        j = jaccard(shingles_by_doc[a_id], shingles_by_doc[b_id])
        if j >= threshold:
            out.append((a_id, b_id, j))
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit simhash per text: sign of per-bit votes over token hashes."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        h = pl.Series(toks).hash(seed=HASH_SEED).to_numpy().astype(np.uint64)
        bits = np.unpackbits(h.view(np.uint8).reshape(len(h), 8), axis=1)  # (m, 64)
        votes = bits.astype(np.int32).sum(axis=0) * 2 - len(h)  # +1/-1 votes
        bitvec = (votes > 0).astype(np.uint8)
        out[i] = np.packbits(bitvec).view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_bands(h: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """(n, n_bands) 16-bit band values — equal band => hamming candidate."""
    shifts = [np.uint64(16 * i) for i in range(n_bands)]
    return np.stack([(h >> s) & np.uint64(0xFFFF) for s in shifts], axis=1)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_pairs_block(
    ids_a: np.ndarray, mat_a: np.ndarray, ids_b: np.ndarray, mat_b: np.ndarray,
    threshold: float,
) -> list[tuple]:
    """All (a, b) with cosine >= threshold, a < b; mat rows L2-normalized."""
    sims = mat_a @ mat_b.T
    ai, bi = np.where(sims >= threshold)
    out = []
    for i, j in zip(ai, bi):
        if ids_a[i] < ids_b[j]:
            out.append((int(ids_a[i]), int(ids_b[j]), float(sims[i, j])))
    return out


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-12)
