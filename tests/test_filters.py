"""Cuckoo/bloom filter unit tests (state/cuckoo.py)."""

import numpy as np

from anycrawl_ray.state.cuckoo import BloomFilter, CuckooFilter, _splitmix64


def keys(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(1, 2**63, size=n).astype(np.uint64)


def test_splitmix_deterministic():
    a = _splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    b = _splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=10_000)
    k = keys(8_000)
    f.insert_many(k)
    assert not f.overflowed
    assert f.contains_many(k).all()  # no false negatives pre-overflow


def test_cuckoo_false_positive_rate():
    f = CuckooFilter(capacity=10_000)
    f.insert_many(keys(8_000, seed=1))
    probe = keys(20_000, seed=2)
    fp = f.contains_many(probe).mean()
    assert fp < 0.02  # 16-bit fingerprints, 4-slot buckets -> ~2*4/2^16 per probe


def test_cuckoo_overflow_flag():
    f = CuckooFilter(capacity=64)
    f.insert_many(keys(1000, seed=3))
    assert f.overflowed  # way past capacity -> must signal spill


def test_bloom_membership():
    b = BloomFilter(capacity=10_000)
    k = keys(10_000, seed=4)
    b.insert_many(k)
    assert b.contains_many(k).all()  # blooms never false-negative
    fp = b.contains_many(keys(20_000, seed=5)).mean()
    assert fp < 0.05
