"""Bloom-prefiltered exact semi-join — the shuffle-free join-pruning
primitive for "big table WHERE key IN (small table)" at 100 TB.

A plain semi-join either broadcasts the small side's exact key set to every
task (fine until the set is tens of millions of keys) or shuffles the big
side (all-to-all). The bloom pattern sits between: a bits-per-key-sized
filter (10 bits/key ~ 1% fp) is built once from the small side, broadcast
once via ``ray.put``, and every map task drops the overwhelming majority of
non-matching rows with a few vectorized hash probes — BEFORE any exact
verify. The exact verify then only touches candidates:

- here (sandbox scale) the exact key set also broadcasts, so verify happens
  in the same map pass and the output is exactly the semi-join;
- at extreme scale, swap the exact set for a candidate-only co-partitioned
  join (the `verify_pairs_join` pattern in functions/dedup.py) — the bloom
  still removes the bulk of the big side before the shuffle.

Hashing is closed-form splitmix64 double-hashing (h1 + i*h2, Kirsch &
Mitzenmacher 2006, public), so filter contents are deterministic across
workers, runs and cluster sizes. Bloom filters: Bloom 1970 (public).

Reference anchor: the reference's seen-set bloom spill
(state/seen.py <- packages/scrape/src/managers/Queue.ts's dedup role) uses
the same filter math for URL membership; this module generalizes it to a
keyed join primitive over int64 key columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .sketch import splitmix64


class IntBloom:
    """Vectorized bloom filter over int64/uint64 keys."""

    def __init__(self, n_keys: int, bits_per_key: int = 10):
        self.n_bits = max(64, int(n_keys * bits_per_key))
        self.k = max(1, int(round(bits_per_key * np.log(2))))
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via splitmix double hashing."""
        h1 = splitmix64(keys.astype(np.uint64))
        h2 = splitmix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None])
                    % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys: np.ndarray) -> "IntBloom":
        pos = self._positions(keys).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask; no false negatives, ~2^-k false positives."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1)


def bloom_semijoin(
    big: rd.Dataset, key_col: str, small_keys: np.ndarray, *,
    bits_per_key: int = 12, exact: bool = True,
) -> rd.Dataset:
    """Rows of ``big`` whose ``key_col`` is in ``small_keys``.

    One broadcast (bloom + optionally the sorted exact key array in the same
    plasma object), one streaming map_batches — no shuffle. With
    ``exact=False`` the output is the bloom-candidate superset (callers
    verifying downstream, e.g. via a candidate-only join).
    """
    keys = np.unique(np.asarray(small_keys, dtype=np.int64))
    bloom = IntBloom(len(keys), bits_per_key).add(keys)
    bcast = ray.put((bloom, keys if exact else None))

    def f(t: pa.Table) -> pa.Table:
        bl, exact_keys = ray.get(bcast)
        col = t.column(key_col).to_numpy(zero_copy_only=False)
        mask = bl.contains(col)
        if exact_keys is not None and mask.any():
            idx = np.flatnonzero(mask)
            pos = np.clip(np.searchsorted(exact_keys, col[idx]), 0,
                          len(exact_keys) - 1)
            mask[idx] = exact_keys[pos] == col[idx]
        return t.filter(pa.array(mask))

    return big.map_batches(f, batch_format="pyarrow", batch_size=4096)
