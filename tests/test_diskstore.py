"""Disk-backed exact seen store (state/diskstore.py) — VERDICT r2 Next #10.

Pins: (1) byte-exact equivalence with a plain Python set under forced
memtable flushes and randomized dup-heavy batches; (2) the capacity contract
(memtable heap stays bounded, overflow rows live in mmap'd segments on
disk); (3) dump/restore checkpoint compatibility; (4) bloom-spill interplay;
(5) end-to-end crawl-order conformance with the store enabled.
"""

import os
import random

import numpy as np

from anycrawl_ray.state.diskstore import DiskSegmentStore
from anycrawl_ray.state.seen import SeenShardCore, stable_hash64


def urls(n, prefix="http://h.test/p/"):
    return [f"{prefix}{i:05d}" for i in range(n)]


def test_segment_store_flush_and_probe(tmp_path):
    st = DiskSegmentStore(str(tmp_path))
    u1, u2 = urls(300), urls(300, prefix="http://o.test/q/")
    st.flush(u1, stable_hash64(u1))
    st.flush(u2, stable_hash64(u2))
    assert st.stats() == {"segments": 2, "rows": 600, "compactions": 0}
    assert st.contains_batch(u1, stable_hash64(u1)).all()
    assert st.contains_batch(u2, stable_hash64(u2)).all()
    fresh = urls(100, prefix="http://fresh.test/")
    assert not st.contains_batch(fresh, stable_hash64(fresh)).any()
    # mixed probe batch
    mix = [u1[5], fresh[0], u2[7], fresh[1]]
    assert st.contains_batch(mix, stable_hash64(mix)).tolist() == [
        True, False, True, False]


def test_segment_files_on_disk_and_reset(tmp_path):
    st = DiskSegmentStore(str(tmp_path))
    u = urls(100)
    st.flush(u, stable_hash64(u))
    files = [f for f in os.listdir(tmp_path) if f.endswith(".arrow")]
    assert len(files) == 1
    # a fresh store over the same dir discards stale segments (crash restart)
    st2 = DiskSegmentStore(str(tmp_path))
    assert st2.stats()["rows"] == 0
    assert not st2.contains_batch(u, stable_hash64(u)).any()


def test_compaction_bounds_fanout_and_keeps_membership(tmp_path):
    """Size-tiered compaction merges the smallest segments once the count
    hits the threshold; membership and row counts are unchanged and dead
    segment files are removed from disk."""
    st = DiskSegmentStore(str(tmp_path), compact_threshold=4)
    batches = []
    for b in range(6):
        u = urls(50, prefix=f"http://c{b}.test/")
        batches.append(u)
        st.flush(u, stable_hash64(u))
    s = st.stats()
    assert s["rows"] == 300
    assert s["compactions"] >= 1
    assert s["segments"] < 6
    files = [f for f in os.listdir(tmp_path) if f.endswith(".arrow")]
    assert len(files) == s["segments"]  # dead segments unlinked
    for u in batches:
        assert st.contains_batch(u, stable_hash64(u)).all()
    fresh = urls(100, prefix="http://fresh.test/")
    assert not st.contains_batch(fresh, stable_hash64(fresh)).any()


def test_compaction_respects_merge_bound(tmp_path):
    """compact_max_rows bounds the merge working set: oversized segments are
    left alone, small ones merge."""
    st = DiskSegmentStore(str(tmp_path), compact_threshold=3,
                          compact_max_rows=120)
    big = urls(500, prefix="http://big.test/")
    st.flush(big, stable_hash64(big))
    for b in range(2):
        u = urls(40, prefix=f"http://s{b}.test/")
        st.flush(u, stable_hash64(u))
    s = st.stats()
    # the two 40-row segments merged; the 500-row one was out of budget
    assert s["compactions"] == 1
    assert s["segments"] == 2
    assert st.contains_batch(big, stable_hash64(big)).all()


def test_segment_store_without_blooms(tmp_path):
    st = DiskSegmentStore(str(tmp_path), bloom_per_segment=False)
    u = urls(200)
    st.flush(u, stable_hash64(u))
    assert st.contains_batch(u, stable_hash64(u)).all()
    fresh = urls(50, prefix="http://f.test/")
    assert not st.contains_batch(fresh, stable_hash64(fresh)).any()


def test_shard_with_store_matches_python_set(tmp_path):
    """Randomized dup-heavy batches through a tiny memtable (forces many
    flushes) must produce the same masks as a plain set."""
    rng = random.Random(7)
    core = SeenShardCore(0, capacity=1 << 14,
                         store_dir=str(tmp_path), memtable_cap=64)
    ref: set[str] = set()
    pool = urls(3000)
    for _ in range(40):
        batch = [pool[rng.randrange(len(pool))] for _ in range(rng.randrange(1, 200))]
        got = core.check_and_add(batch, stable_hash64(batch))
        want = []
        for u in batch:
            want.append(u not in ref)
            ref.add(u)
        assert got.tolist() == want
        probe = [pool[rng.randrange(len(pool))] for _ in range(50)]
        gc = core.contains(probe, stable_hash64(probe))
        assert gc.tolist() == [u in ref for u in probe]
    # capacity contract: memtable bounded, the rest is on disk
    st = core.stats()
    assert st["memtable"] <= 64
    assert st["n"] == len(ref)
    assert st["disk"]["rows"] == len(ref) - st["memtable"]
    assert st["disk"]["segments"] >= 2


def test_shard_store_bloom_spill_stays_exact(tmp_path):
    """Cuckoo overflow with segments on disk: bloom rebuilds from segment
    hash columns (no URL strings) and membership stays exact."""
    core = SeenShardCore(0, capacity=256,
                         store_dir=str(tmp_path), memtable_cap=128)
    u = urls(2000)
    core.check_and_add(u, stable_hash64(u))
    assert core.stats()["filter"] == "bloom"
    assert core.contains(u, stable_hash64(u)).all()
    assert not core.check_and_add(u, stable_hash64(u)).any()
    fresh = urls(500, prefix="http://other.test/q/")
    assert not core.contains(fresh, stable_hash64(fresh)).any()


def test_shard_store_dump_restore_roundtrip(tmp_path):
    core = SeenShardCore(2, capacity=1 << 12,
                         store_dir=str(tmp_path / "a"), memtable_cap=32)
    u = urls(500)
    core.check_and_add(u, stable_hash64(u))
    t = core.dump()
    assert t.num_rows == 500
    assert t.column("url").to_pylist() == sorted(u)  # deterministic bytes
    # restore into a store-backed shard: memtable empty, one segment
    c2 = SeenShardCore(2, capacity=1 << 12,
                       store_dir=str(tmp_path / "b"), memtable_cap=32)
    c2.restore(t)
    assert c2.stats()["memtable"] == 0
    assert c2.stats()["disk"]["rows"] == 500
    assert not c2.check_and_add(u, stable_hash64(u)).any()
    # restore into a classic in-memory shard also works (compat)
    c3 = SeenShardCore(2, capacity=1 << 12)
    c3.restore(t)
    assert not c3.check_and_add(u, stable_hash64(u)).any()


def test_crawl_conformance_with_disk_seen_store(ray_session, small_corpus, tmp_path):
    """End-to-end: run_crawl with the disk store (tiny memtable, every shard
    flushes) produces the exact reference order."""
    from anycrawl_ray.corpus import CorpusIndex
    from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
    from anycrawl_ray.refmodel import (
        CrawlOptions, SyntheticFetcher, run_reference_crawl)

    seed = "http://h00.example.test/p/0000"
    opts = CrawlOptions(limit=80, strategy="all")
    out = run_crawl(
        seed, opts, small_corpus,
        CrawlRunConfig(job_id="diskseen", n_fetch_workers=2, n_seen_shards=2,
                       seen_store_dir=str(tmp_path / "seen"),
                       seen_memtable_cap=16),
    )
    golden = run_reference_crawl(
        seed, opts, SyntheticFetcher(CorpusIndex(small_corpus)))
    assert out.order == golden.order
    assert out.visited_count == len(golden.visited)
