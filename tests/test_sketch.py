"""HyperLogLog sketch gates: accuracy at scale, exact merge associativity,
determinism across runs/partitionings, and the AggregateFn end-to-end vs the
exact COUNT(DISTINCT) answer."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray.functions.sketch import HLL, splitmix64  # noqa: E402
from anycrawl_ray import queries as q  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_accuracy_large_and_small():
    rng = np.random.default_rng(7)
    vals = rng.choice(20_000_000, size=500_000, replace=False).astype(np.int64)
    est = HLL(12).add_hashes(splitmix64(vals)).estimate()
    assert abs(est - 500_000) / 500_000 < 0.05  # 3x the 1.6% standard error
    # small range: linear counting is near-exact
    est_small = HLL(12).add_hashes(splitmix64(np.arange(50, np.int64(150)))).estimate()
    assert abs(est_small - 100) <= 5


def test_merge_is_register_max_and_order_free():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**62, size=90_000).astype(np.int64)
    h = splitmix64(vals)
    whole = HLL(12).add_hashes(h)
    # three shards, merged in a different order
    a = HLL(12).add_hashes(h[:30_000])
    b = HLL(12).add_hashes(h[30_000:60_000])
    c = HLL(12).add_hashes(h[60_000:])
    merged = c.merge(a).merge(b)
    assert (merged.regs == whole.regs).all()
    assert merged.estimate() == whole.estimate()


def test_duplicates_do_not_move_the_estimate():
    vals = np.arange(1000, dtype=np.int64)
    once = HLL(12).add_hashes(splitmix64(vals))
    thrice = HLL(12).add_hashes(splitmix64(np.tile(vals, 3)))
    assert (once.regs == thrice.regs).all()


def test_aggregatefn_vs_exact_daily(ray_session):
    approx = q.q_approx_distinct(SF).to_pandas().set_index("day")["approx_users"]
    exact = q.q_daily_active_users(SF).to_pandas().set_index("day")["active_users"]
    assert sorted(approx.index) == sorted(exact.index)
    for d in exact.index:
        e, a = int(exact[d]), int(approx[d])
        assert abs(a - e) <= max(2, 0.05 * e), (d, a, e)
    # deterministic across runs (closed-form hash, no RNG)
    again = q.q_approx_distinct(SF).to_pandas().set_index("day")["approx_users"]
    assert (approx == again).all()
