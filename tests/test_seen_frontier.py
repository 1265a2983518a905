"""Seen-set shard actors + frontier FIFO/spill/restore."""

import numpy as np
import pyarrow as pa

from anycrawl_ray.frontier import Frontier
from anycrawl_ray.state.seen import SeenSet, SeenShardCore, stable_hash64


def urls(n, prefix="http://h.test/p/"):
    return [f"{prefix}{i:05d}" for i in range(n)]


def test_shard_core_check_and_add():
    c = SeenShardCore(0, capacity=1 << 12)
    u = urls(100)
    h = stable_hash64(u)
    first = c.check_and_add(u, h)
    assert first.all()
    again = c.check_and_add(u, h)
    assert not again.any()
    # in-batch duplicate: first occurrence wins
    dup = ["http://h.test/x", "http://h.test/x"]
    m = c.check_and_add(dup, stable_hash64(dup))
    assert m.tolist() == [True, False]


def test_shard_core_spill_to_bloom_keeps_exactness():
    c = SeenShardCore(0, capacity=256)
    u = urls(2000)
    c.check_and_add(u, stable_hash64(u))
    assert c.stats()["filter"] == "bloom"  # overflowed -> spilled
    assert c.contains(u, stable_hash64(u)).all()
    fresh = urls(500, prefix="http://other.test/q/")
    assert not c.contains(fresh, stable_hash64(fresh)).any()  # exact-verify kills bloom FPs


def test_shard_dump_restore_roundtrip():
    c = SeenShardCore(3, capacity=1 << 12)
    u = urls(50)
    c.check_and_add(u, stable_hash64(u))
    t = c.dump()
    assert t.num_rows == 50
    c2 = SeenShardCore(3, capacity=1 << 12)
    c2.restore(t)
    assert not c2.check_and_add(u, stable_hash64(u)).any()


def test_seen_set_actors(ray_session):
    s = SeenSet(n_shards=3)
    try:
        u = urls(500)
        assert s.check_and_add(u).all()
        assert s.contains(u).all()
        assert not s.check_and_add(u).any()
        assert s.total() == 500
        # dump/restore across a fresh actor set
        t = s.dump()
        s2 = SeenSet(n_shards=3)
        try:
            s2.restore(t)
            assert not s2.check_and_add(u).any()
            mixed = [u[0], "http://new.test/1", u[1]]
            assert s2.check_and_add(mixed).tolist() == [False, True, False]
        finally:
            s2.shutdown()
    finally:
        s.shutdown()


def test_frontier_fifo_and_wave():
    f = Frontier()
    for i in range(10):
        f.push(f"http://h{i % 2}.test/p/{i}", depth=0)
    assert len(f) == 10
    w = f.pop_wave(3)
    assert [r[3] for r in w] == [0, 1, 2]
    assert len(f) == 7


def test_frontier_per_host_cap_defers_in_order():
    f = Frontier()
    seq = [("http://a.test/1", 0), ("http://a.test/2", 0), ("http://a.test/3", 0),
           ("http://b.test/1", 0)]
    for u, d in seq:
        f.push(u, d)
    w = f.pop_wave(3, per_host_cap=1)
    assert [r[0] for r in w] == ["http://a.test/1", "http://b.test/1"]
    # deferred a.test/2, a.test/3 stay ordered at head
    w2 = f.pop_wave(4, per_host_cap=0)
    assert [r[0] for r in w2] == ["http://a.test/2", "http://a.test/3"]
    assert len(f) == 0


def test_frontier_spill_roundtrip(tmp_path):
    f = Frontier(spill_threshold=50, segment_rows=25, spill_dir=str(tmp_path))
    n = 200
    for i in range(n):
        f.push(f"http://h.test/p/{i:04d}", depth=1)
    assert len(f) == n
    got = []
    while len(f):
        got.extend(r[0] for r in f.pop_wave(17))
    assert got == [f"http://h.test/p/{i:04d}" for i in range(n)]  # global FIFO across spill


def test_frontier_dump_restore():
    f = Frontier()
    for i in range(20):
        f.push(f"http://h.test/p/{i}", depth=i % 3)
    f.pop_wave(5)
    t = f.dump()
    f2 = Frontier()
    f2.restore(t)
    assert len(f2) == 15
    assert f2.pop_wave(1)[0][0] == "http://h.test/p/5"
    assert f2._next_seq == 20


def test_pop_wave_admit_scans_past_deep_deferral():
    """The admit path must scan the WHOLE frontier for admissible hosts,
    exactly like pop_wave/per_host_cap — an early break after 4*batch_size
    deferrals formed a different wave (round-1 ADVICE)."""
    from anycrawl_ray.frontier import Frontier

    def build():
        f = Frontier("j")
        f.push("http://a.test/0", 0, 0)
        for i in range(1, 200):  # 199 capped-host rows before the admissible one
            f.push(f"http://a.test/{i}", 0, 0)
        f.push("http://b.test/0", 0, 0)
        return f

    f1 = build()
    ref_wave = f1.pop_wave(16, per_host_cap=1)
    assert [r[0] for r in ref_wave] == ["http://a.test/0", "http://b.test/0"]

    counts: dict[str, int] = {}

    def admit(hosts):
        out = []
        for h in hosts:
            ok = counts.get(h, 0) < 1
            if ok:
                counts[h] = counts.get(h, 0) + 1
            out.append(ok)
        return out

    f2 = build()
    wave = f2.pop_wave_admit(16, admit)
    assert [r[0] for r in wave] == [r[0] for r in ref_wave]
    assert len(f2) == len(f1)  # deferred rows kept, order preserved
