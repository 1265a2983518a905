"""Approximate-membership filters for the URL-seen set (numpy, no deps).

The reference keeps EXACT seen sets (Crawlee RequestQueue uniqueKey index /
the coordinator's in-memory ``visited`` Set —
reference packages/scrape/src/utils/crawlCoordinator.ts:26). At 10^10-URL
frontier scale an exact in-memory set per shard does not fit, so the rebuild's
fast path is a cuckoo filter per shard (~2 bytes/key at 95% load), with a
bloom filter as the spill fallback (BASELINE.json north_rule). Exactness is
preserved by verifying filter *positives* against the shard's exact backing
store before declaring "seen" (SURVEY.md §2.5 note, §7.5.3).

Partial-key cuckoo hashing per Fan et al., "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014): 4-slot buckets, 16-bit fingerprints,
i2 = i1 XOR hash(fp).
"""

from __future__ import annotations

import numpy as np

_FP_SEED = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (vectorized)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


class CuckooFilter:
    """Vectorized-contains / per-item-insert cuckoo filter over uint64 keys."""

    BUCKET_SIZE = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0):
        n_buckets = 1
        while n_buckets * self.BUCKET_SIZE < capacity / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.buckets = np.zeros((n_buckets, self.BUCKET_SIZE), dtype=np.uint16)
        self.size = 0
        self.overflowed = False  # set on failed insert -> caller switches to bloom
        self._rng = np.random.RandomState(seed)

    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        keys = keys.astype(np.uint64, copy=False)
        fp = ((keys >> np.uint64(48)) | np.uint64(1)).astype(np.uint16)  # nonzero
        i1 = (keys & self.mask).astype(np.int64)
        alt = _splitmix64(fp.astype(np.uint64) * _FP_SEED)
        i2 = ((i1.astype(np.uint64) ^ alt) & self.mask).astype(np.int64)
        return fp, i1, i2

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_and_index(keys)
        hit1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def insert_many(self, keys: np.ndarray) -> None:
        fp, i1, i2 = self._fp_and_index(keys)
        for k in range(len(keys)):
            self._insert_one(int(fp[k]), int(i1[k]), int(i2[k]))

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        for idx in (i1, i2):
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return
        # evict loop
        idx = i1 if self._rng.rand() < 0.5 else i2
        cur = np.uint16(fp)
        for _ in range(self.MAX_KICKS):
            slot = self._rng.randint(self.BUCKET_SIZE)
            cur, self.buckets[idx][slot] = self.buckets[idx][slot], cur
            with np.errstate(over="ignore"):
                alt = int(_splitmix64(np.uint64(cur) * _FP_SEED) & self.mask)
            idx = idx ^ alt
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.size += 1
                return
        self.overflowed = True  # dropped fingerprint: filter may now false-negative
        self.size += 1


class BloomFilter:
    """Spill-fallback filter: flat bit array, k derived hashes per key."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = 1 << int(np.ceil(np.log2(m)))
        self.k = max(1, int(round(self.n_bits / capacity * np.log(2)))) if capacity else 1
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        self.mask = np.uint64(self.n_bits - 1)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        h1 = keys
        h2 = _splitmix64(keys)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx[i] = (h1 + np.uint64(i) * h2) & self.mask
        return idx

    def insert_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        hits = (self.bits[byte] & bit) != 0
        return hits.all(axis=0)
