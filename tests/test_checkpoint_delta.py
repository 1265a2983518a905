"""O(delta) checkpoints (VERDICT r3 wrong #1 / next #1).

Pins the shape, not just the behavior: checkpointing a disk-backed seen
shard or a spill-enabled frontier must hard-link immutable segments (zero
new bytes) and write only the bounded memtable/head as fresh bytes — never
re-materialize total state through the driver. Restore must round-trip
membership/order byte-exactly, including in-flight tombstones.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from anycrawl_ray.frontier import Frontier
from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
from anycrawl_ray.refmodel import CrawlOptions
from anycrawl_ray.state.seen import SeenShardCore, stable_hash64

SEED = "http://h00.example.test/p/0000"


def _tree_files(d):
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = os.stat(p)
    return out


def _new_bytes(before: dict, after: dict) -> int:
    """Bytes in `after` that are NEW (name not present before, or inode
    changed). Hard links to pre-existing segment files cost zero."""
    total = 0
    for name, st in after.items():
        old = before.get(name)
        if old is None or old.st_ino != st.st_ino:
            total += st.st_size
    return total


# -- seen shard ------------------------------------------------------------


def _fill(core, n, start=0):
    urls = [f"http://h{i % 7}.example.test/p/{start + i:06d}" for i in range(n)]
    core.check_and_add(urls, stable_hash64(urls))
    return urls


def test_seen_shard_checkpoint_is_delta_sized(tmp_path):
    core = SeenShardCore(0, store_dir=str(tmp_path / "store"),
                         memtable_cap=200)
    _fill(core, 2000)  # ~10 segment flushes
    ck = str(tmp_path / "ck")

    core.checkpoint_to(ck, version=1)
    first = _tree_files(ck)
    # every store segment arrived as a hard link (st_nlink >= 2), not a copy
    seg_files = [n for n in first if "seg" in n]
    assert seg_files, "fixture must have flushed segments"
    assert all(first[n].st_nlink >= 2 for n in seg_files)
    full_size = sum(st.st_size for st in first.values())

    _fill(core, 60, start=10_000)  # small delta, stays in the memtable
    core.checkpoint_to(ck, version=2)
    second = _tree_files(ck)
    delta_bytes = _new_bytes(first, second)
    # new bytes = the versioned memtable only — far below total state
    assert 0 < delta_bytes < full_size / 5, (delta_bytes, full_size)
    assert any("memtable-000002" in n for n in second)


def test_seen_shard_checkpoint_restore_roundtrip(tmp_path):
    core = SeenShardCore(3, store_dir=str(tmp_path / "store"),
                         memtable_cap=100)
    urls = _fill(core, 500)
    ck = str(tmp_path / "ck")
    manifest = core.checkpoint_to(ck, version=7)
    assert manifest["shard"] == 3
    assert manifest["rows"] == 500

    fresh = SeenShardCore(3, store_dir=str(tmp_path / "store2"),
                          memtable_cap=100)
    fresh.restore_from_checkpoint(os.path.join(ck, "shard003"),
                                  manifest["files"], exclude=[])
    probe = urls[::37] + ["http://h0.example.test/never-seen"]
    got = fresh.contains(probe, stable_hash64(probe))
    want = core.contains(probe, stable_hash64(probe))
    assert got.tolist() == want.tolist()
    assert not got[-1]


def test_seen_tombstones_refetch_exactly_once(tmp_path):
    core = SeenShardCore(0, store_dir=str(tmp_path / "store"),
                         memtable_cap=50)
    urls = _fill(core, 200)
    ck = str(tmp_path / "ck")
    manifest = core.checkpoint_to(ck, version=1)

    pending = urls[5:8]  # "in flight at checkpoint time"
    fresh = SeenShardCore(0, store_dir=str(tmp_path / "store2"),
                          memtable_cap=50)
    fresh.restore_from_checkpoint(os.path.join(ck, "shard000"),
                                  manifest["files"], exclude=pending)
    h = stable_hash64(pending)
    # logically unseen until re-fetched
    assert fresh.contains(pending, h).tolist() == [False] * 3
    assert fresh.stats()["n"] == 200 - 3
    # first check_and_add wins (reported NEW exactly once)...
    assert fresh.check_and_add(pending, h).tolist() == [True] * 3
    # ...then it is seen again, exactly like any other URL
    assert fresh.contains(pending, h).tolist() == [True] * 3
    assert fresh.check_and_add(pending, h).tolist() == [False] * 3
    assert fresh.stats()["n"] == 200


# -- frontier ----------------------------------------------------------------


def _mk_frontier(tmp_path, name):
    return Frontier("job", spill_threshold=100, segment_rows=50,
                    spill_dir=str(tmp_path / name))


def test_frontier_checkpoint_links_spill_segments(tmp_path):
    fr = _mk_frontier(tmp_path, "spill")
    # spill triggers once the head is full at push time — two pushes
    fr.push_batch([f"http://h0.example.test/p/{i}" for i in range(150)], 1)
    fr.push_batch([f"http://h0.example.test/p/{i + 150}" for i in range(250)], 1)
    assert fr._segments, "fixture must have spilled"
    ck = str(tmp_path / "ck")
    manifest = fr.checkpoint_to(ck, round_no=1)
    files = _tree_files(ck)
    for name in manifest["segments"]:
        assert files[name].st_nlink >= 2  # linked, zero new bytes
    # only head/tail were written fresh
    fresh_names = [n for n in files if files[n].st_nlink == 1]
    assert set(fresh_names) <= {manifest["head"], manifest.get("tail")}

    # second checkpoint after a small push: spilled segments link-skip,
    # new bytes are the head/tail versions only
    fr.push_batch([f"http://h1.example.test/q/{i}" for i in range(10)], 2)
    manifest2 = fr.checkpoint_to(ck, round_no=2)
    files2 = _tree_files(ck)
    # spilled segments were NOT rewritten: same inode as the first checkpoint
    for name in manifest["segments"]:
        assert files2[name].st_ino == files[name].st_ino
    # the only fresh files are the versioned head/tail (bounded by
    # spill_threshold/segment_rows — never total queue state)
    new_names = {n for n, st in files2.items()
                 if n not in files or files[n].st_ino != st.st_ino}
    assert new_names <= {manifest2["head"], manifest2.get("tail")}
    assert manifest2["head"] != manifest["head"]  # versioned, crash-safe


def test_frontier_checkpoint_restore_roundtrip(tmp_path):
    fr = _mk_frontier(tmp_path, "spill")
    urls = [f"http://h{i % 5}.example.test/p/{i}" for i in range(333)]
    fr.push_batch(urls[:150], 1)
    fr.push_batch(urls[150:], 1)
    assert fr._segments, "fixture must have spilled"
    ck = str(tmp_path / "ck")
    manifest = fr.checkpoint_to(ck, round_no=3)

    fresh = _mk_frontier(tmp_path, "spill2")
    fresh.restore_from_checkpoint(ck, manifest)
    fresh._next_seq = fr._next_seq
    assert len(fresh) == len(fr)
    got, want = [], []
    while True:
        a, b = fresh.pop_wave(64), fr.pop_wave(64)
        got.extend(a)
        want.extend(b)
        if not a and not b:
            break
    assert got == want
    # the checkpoint's own files survive consumption of the live copies
    assert all(os.path.exists(os.path.join(ck, n))
               for n in manifest["segments"])


def test_frontier_checkpoint_pending_rows_prepended(tmp_path):
    fr = _mk_frontier(tmp_path, "spill")
    fr.push_batch(["http://h0.example.test/a", "http://h0.example.test/b"], 1)
    pending = [("http://h0.example.test/z", 0, 0, -1)]
    ck = str(tmp_path / "ck")
    manifest = fr.checkpoint_to(ck, round_no=1, pending_rows=pending)
    fresh = _mk_frontier(tmp_path, "spill2")
    fresh.restore_from_checkpoint(ck, manifest)
    wave = fresh.pop_wave(10)
    assert [r[0] for r in wave] == [
        "http://h0.example.test/z",
        "http://h0.example.test/a",
        "http://h0.example.test/b",
    ]


# -- full pipeline (at-scale config: disk seen + spill frontier) -------------


def test_crawl_resume_with_segment_checkpoints(ray_session, small_corpus,
                                               tmp_path):
    """Crash/resume equivalence under the at-scale config — both segment
    checkpoint paths active — and the checkpoint carries NO legacy
    total-state seen table."""
    opts = CrawlOptions(limit=40, strategy="all")
    full = run_crawl(SEED, opts, small_corpus, CrawlRunConfig())

    ck = str(tmp_path / "ck")
    cfg = CrawlRunConfig(
        checkpoint_dir=ck, checkpoint_every=1, n_seen_shards=2,
        seen_store_dir=str(tmp_path / "seen"), seen_memtable_cap=8,
    )
    partial = run_crawl(SEED, opts, small_corpus,
                        __import__("dataclasses").replace(
                            cfg, stop_after_rounds=2))
    assert partial.rounds == 2
    # segment mode: no monolithic seen/frontier tables in the checkpoint
    names = os.listdir(ck)
    assert not any(n.startswith("seen.") for n in names)
    assert not any(n.startswith("frontier.") for n in names)
    assert os.path.isdir(os.path.join(ck, "seen_segs"))
    assert os.path.isdir(os.path.join(ck, "frontier_segs"))

    resumed = run_crawl(SEED, opts, small_corpus, cfg, resume=True)
    assert resumed.order_table().to_pydict() == full.order_table().to_pydict()
    assert resumed.completed == full.completed
    assert resumed.visited_count == full.visited_count


def test_relaxed_resume_with_disk_seen_tombstones(ray_session, small_corpus,
                                                  tmp_path):
    """Relaxed-mode crash with chunks in flight + disk-backed seen: the
    pending URLs ride the checkpoint as tombstones and each page lands
    exactly once across the crash."""
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    opts = CrawlOptions(limit=60, strategy="all")
    spans_full = str(tmp_path / "spans_full")
    full = run_crawl_relaxed(
        SEED, opts, small_corpus,
        CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2,
                       spans_out_dir=spans_full),
    )

    ck = str(tmp_path / "ck_rel")
    spans = str(tmp_path / "spans_rel")
    base = CrawlRunConfig(
        n_fetch_workers=2, n_seen_shards=2, checkpoint_dir=ck,
        checkpoint_every=1, spans_out_dir=spans, dataset_batch_size=8,
        seen_store_dir=str(tmp_path / "seen"), seen_memtable_cap=8,
    )
    import dataclasses as _dc

    partial = run_crawl_relaxed(
        SEED, opts, small_corpus, _dc.replace(base, stop_after_rounds=2)
    )
    assert partial.rounds == 2
    resumed = run_crawl_relaxed(SEED, opts, small_corpus, base, resume=True)

    assert resumed.completed == full.completed
    assert resumed.failed == full.failed
    assert resumed.visited_count == full.visited_count
    t = pq.read_table(spans)
    t_full = pq.read_table(spans_full)
    assert t.num_rows == t_full.num_rows
    assert sorted(t.column("url").to_pylist()) == sorted(
        t_full.column("url").to_pylist())
