"""Heavy-hitters (MG candidates + exact recount) and bloom-semijoin tests."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.functions import heavyhitters as hh
from anycrawl_ray.functions.bloomjoin import IntBloom, bloom_semijoin


def _mk_docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


# ---------------------------------------------------------------------------
# Misra-Gries summary kernel
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 50), min_size=1, max_size=400),
       st.integers(4, 32))
@settings(max_examples=60, deadline=None)
def test_mg_guarantee_and_bounds(vals, m):
    """After folding exact counts in arbitrary chunks: every item with true
    count > err survives, and stored <= true <= stored + err."""
    toks = [f"t{v}" for v in vals]
    true = Counter(toks)
    acc = {"c": {}, "err": 0, "n": 0}
    rng = np.random.RandomState(7)
    order = list(true.items())
    rng.shuffle(order)
    third = max(1, len(order) // 3)
    for i in range(0, len(order), third):
        chunk = order[i : i + third]
        acc = hh.mg_merge_counts(acc, [t for t, _ in chunk],
                                 [n for _, n in chunk], m)
    assert len(acc["c"]) <= m
    for t, n in true.items():
        if n > acc["err"]:
            assert t in acc["c"], (t, n, acc["err"])
        if t in acc["c"]:
            assert acc["c"][t] <= n <= acc["c"][t] + acc["err"]


def test_top_k_exact_matches_counter(ray_session):
    rng = np.random.RandomState(3)
    # zipf-ish corpus with vocab far above m to force trimming
    vocab = [f"w{i:04d}" for i in range(3000)]
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=200, p=weights)) for _ in range(60)
    ]
    got = hh.top_k_exact(_mk_docs(texts), k=25, m=256)
    true = Counter(" ".join(texts).split())
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert list(zip(got.column("token").to_pylist(),
                    got.column("n").to_pylist())) == want


def test_top_k_exact_raises_when_unprovable(ray_session):
    # every token unique: kth count 1 <= err once trimming starts
    texts = [" ".join(f"u{i}_{j}" for j in range(300)) for i in range(10)]
    with pytest.raises(RuntimeError, match="MG guarantee"):
        hh.top_k_exact(_mk_docs(texts), k=5, m=16)


def test_top_k_exact_small_vocab_no_trim(ray_session):
    texts = ["a a a b b c"] * 5
    got = hh.top_k_exact(_mk_docs(texts), k=2, m=64)
    assert got.column("token").to_pylist() == ["a", "b"]
    assert got.column("n").to_pylist() == [15, 10]


# ---------------------------------------------------------------------------
# bloom semi-join
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(-10**9, 10**9), max_size=200),
       st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(probe, keys):
    ks = np.unique(np.array(keys, dtype=np.int64))
    bl = IntBloom(len(ks)).add(ks)
    mask = bl.contains(np.array(probe, dtype=np.int64))
    member = np.isin(np.array(probe, dtype=np.int64), ks)
    assert (mask | ~member).all()  # member => bloom-positive


def test_bloom_fp_rate_sane():
    rng = np.random.RandomState(5)
    keys = rng.randint(0, 10**12, size=20_000).astype(np.int64)
    bl = IntBloom(len(keys), bits_per_key=12).add(keys)
    probe = rng.randint(10**12, 2 * 10**12, size=50_000).astype(np.int64)
    fp = bl.contains(probe).mean()
    assert fp < 0.02, fp  # 12 bits/key ~ 0.3% expected


def test_bloom_semijoin_exact(ray_session):
    rng = np.random.RandomState(11)
    big_keys = rng.randint(0, 500, size=5000).astype(np.int64)
    big = rd.from_arrow(pa.table({
        "k": pa.array(big_keys, pa.int64()),
        "v": pa.array(np.arange(5000), pa.int64()),
    }))
    small = np.arange(0, 500, 7, dtype=np.int64)
    out = bloom_semijoin(big, "k", small).take_all()
    got = sorted((r["k"], r["v"]) for r in out)
    want = sorted(
        (int(k), int(v)) for k, v in zip(big_keys, np.arange(5000))
        if k in set(small.tolist())
    )
    assert got == want


def test_bloom_semijoin_superset_mode(ray_session):
    rng = np.random.RandomState(13)
    big_keys = rng.randint(0, 10**9, size=3000).astype(np.int64)
    big = rd.from_arrow(pa.table({"k": pa.array(big_keys, pa.int64())}))
    small = big_keys[:50]
    cand = bloom_semijoin(big, "k", small, exact=False).take_all()
    got = {r["k"] for r in cand}
    assert set(small.tolist()) <= got  # candidates are a superset
