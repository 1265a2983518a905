"""Sharded URL-seen-set actors — the crawl's membership state.

Replaces the reference's per-job exact seen structures (Crawlee uniqueKey
index, reference packages/scrape/src/engines/Base.ts:464-473; coordinator
``visited`` Set, utils/crawlCoordinator.ts:26,43-44) with N shard actors:

- routing: ``shard = stable_hash64(url) % n_shards`` — partition-stable, so a
  URL always lands on the same shard (no cross-shard dup possible).
- fast path: cuckoo filter per shard; *negative* => definitely new (no exact
  probe needed); *positive* => verified against the shard's exact backing set
  (false positives never drop URLs — SURVEY.md §7.5.3).
- spill: when the cuckoo overflows, the shard flips to a bloom filter rebuilt
  from the exact set (north_rule "bloom fallback for spill").
- checkpoint: disk-backed shards checkpoint O(delta) via ``checkpoint_to``
  (hard-linked immutable segments + the bounded memtable as one new segment
  file; in-flight URLs become tombstones on restore); in-memory shards keep
  the legacy full ``dump()``/``restore()`` Arrow round-trip (SEEN_SCHEMA).
  Filters are rebuilt deterministically on restore (SURVEY.md §7.5.6).

Hashing uses polars' stable 64-bit string hash (vectorized, process-stable for
a fixed seed) — no per-row Python hashing on the hot path.
"""

from __future__ import annotations

import os

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from ..schema import SEEN_SCHEMA
from .cuckoo import BloomFilter, CuckooFilter

HASH_SEED = 1234


def stable_hash64(urls: list[str] | pa.Array) -> np.ndarray:
    """Vectorized stable uint64 hash of URL strings."""
    s = pl.Series(urls if isinstance(urls, list) else urls.to_pylist())
    return s.hash(seed=HASH_SEED).to_numpy().astype(np.uint64)


class SeenShardCore:
    """Plain-Python shard logic (actor-wrapped below; also used inline for
    single-process conformance debugging).

    ``store_dir`` (optional) bounds the exact backing store's heap footprint:
    the in-memory set becomes a MEMTABLE capped at ``memtable_cap`` entries;
    on overflow it is flushed to an immutable sorted mmap'd segment on local
    disk (state/diskstore.py) and cleared. Membership stays byte-exact —
    filter-positive probes verify against memtable + segments. Without
    ``store_dir`` behavior is the original unbounded in-memory set (the right
    call for conformance tests and small jobs)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 18,
                 store_dir: str | None = None, memtable_cap: int = 1 << 20):
        self.shard_id = shard_id
        self.capacity = capacity
        self.exact: set[str] = set()
        self.cuckoo: CuckooFilter | None = CuckooFilter(capacity, seed=shard_id)
        self.bloom: BloomFilter | None = None
        self.memtable_cap = memtable_cap
        # tombstones: URLs physically present in restored segments but
        # logically UNSEEN (they were in flight at checkpoint time and must
        # be re-fetched exactly once on resume). Bounded by the dispatch
        # window. First check_and_add wins and clears the tombstone.
        self.tombstones: set[str] = set()
        self.store = None
        if store_dir is not None:
            from .diskstore import DiskSegmentStore

            self.store = DiskSegmentStore(store_dir)

    # -- filter plumbing -------------------------------------------------
    def _filter_contains(self, hashes: np.ndarray) -> np.ndarray:
        if self.cuckoo is not None:
            return self.cuckoo.contains_many(hashes)
        return self.bloom.contains_many(hashes)

    def _filter_insert(self, hashes: np.ndarray) -> None:
        if self.cuckoo is not None:
            self.cuckoo.insert_many(hashes)
            if self.cuckoo.overflowed or self.cuckoo.size > self.capacity:
                self._spill_to_bloom()
        else:
            self.bloom.insert_many(hashes)

    def _spill_to_bloom(self) -> None:
        """Cuckoo exceeded capacity: rebuild membership as a bloom over the
        exact store (growable by powers of two on future pressure). Segment
        hashes are read from the mmap'd hash columns — no URL strings are
        materialized for the rebuild."""
        self.cuckoo = None
        n = len(self.exact) + (self.store.n_rows if self.store else 0)
        self.bloom = BloomFilter(max(self.capacity * 4, n * 2))
        if self.exact:
            self.bloom.insert_many(stable_hash64(list(self.exact)))
        if self.store is not None and self.store.n_rows:
            self.bloom.insert_many(self.store.all_hashes())

    def _maybe_flush(self) -> None:
        """Memtable overflow -> one immutable sorted segment on disk."""
        if self.store is None or len(self.exact) < self.memtable_cap:
            return
        urls = list(self.exact)
        self.store.flush(urls, stable_hash64(urls))
        self.exact.clear()

    # -- public API ------------------------------------------------------
    def check_and_add(self, urls: list[str], hashes: np.ndarray) -> np.ndarray:
        """True where url was NOT seen before this call (first occurrence wins
        within the batch). Mirrors pop-time ``visited.has/add`` (:43-44)."""
        out = np.zeros(len(urls), dtype=bool)
        maybe = self._filter_contains(hashes)
        # filter-positives verify against the disk segments in ONE batched
        # vectorized probe; filter-negatives are definitely absent from disk
        # (every insert also went into the filter)
        disk_known = np.zeros(len(urls), dtype=bool)
        if self.store is not None and maybe.any():
            idx = np.flatnonzero(maybe)
            disk_known[idx] = self.store.contains_batch(
                [urls[i] for i in idx], hashes[idx]
            )
        new_hashes = []
        for i, u in enumerate(urls):
            if self.tombstones and u in self.tombstones:
                # restored-but-in-flight URL: report new ONCE (its hash is
                # already in the filter and its row in a segment — nothing
                # to insert, only the logical mark flips)
                self.tombstones.discard(u)
                out[i] = True
                continue
            # memtable probe also catches in-batch dups (filter insert is
            # deferred to the end of the batch)
            if disk_known[i] or u in self.exact:
                continue
            self.exact.add(u)
            out[i] = True
            new_hashes.append(hashes[i])
        if new_hashes:
            self._filter_insert(np.array(new_hashes, dtype=np.uint64))
        self._maybe_flush()
        return out

    def contains(self, urls: list[str], hashes: np.ndarray) -> np.ndarray:
        maybe = self._filter_contains(hashes)
        out = np.zeros(len(urls), dtype=bool)
        if self.store is not None and maybe.any():
            idx = np.flatnonzero(maybe)
            out[idx] = self.store.contains_batch([urls[i] for i in idx], hashes[idx])
        for i, u in enumerate(urls):
            if maybe[i] and not out[i]:
                out[i] = u in self.exact
            # negative => definitely unseen (cuckoo w/o overflow, bloom always)
            if out[i] and self.tombstones and u in self.tombstones:
                out[i] = False  # logically unseen until re-fetched
        return out

    def dump(self) -> pa.Table:
        # legacy full-table dump — the checkpoint path for in-memory shards
        # and tests; disk-backed shards checkpoint via ``checkpoint_to``
        # (O(delta)) instead, so the O(total) URL materialization here never
        # sits on the at-scale job's checkpoint path
        all_urls = set(self.exact)
        if self.store is not None:
            all_urls.update(self.store.all_urls())
        all_urls -= self.tombstones
        urls = sorted(all_urls)  # deterministic checkpoint bytes
        hashes = stable_hash64(urls) if urls else np.array([], dtype=np.uint64)
        return pa.Table.from_pydict(
            {
                "shard": pa.array([self.shard_id] * len(urls), pa.int32()),
                "url_hash": pa.array(hashes, pa.uint64()),
                "url": pa.array(urls, pa.string()),
            },
            schema=SEEN_SCHEMA,
        )

    def checkpoint_to(self, ck_dir: str, version: int) -> dict:
        """O(delta) checkpoint for disk-backed shards (VERDICT r3 wrong #1):
        hard-link the immutable disk segments (zero new bytes on the same
        filesystem) and write ONLY the bounded memtable as new bytes, laid
        out as one more segment file so restore adopts everything uniformly.
        The memtable file is versioned: a crash after this write but before
        the job meta flips still resumes from the PREVIOUS consistent set.
        """
        from .diskstore import write_segment_file

        assert self.store is not None, "segment checkpoint requires store_dir"
        shard_dir = os.path.join(ck_dir, f"shard{self.shard_id:03d}")
        os.makedirs(shard_dir, exist_ok=True)
        manifest = self.store.checkpoint_to(shard_dir)
        files = [m["file"] for m in manifest]
        rows = sum(m["rows"] for m in manifest)
        if self.exact:
            name = f"memtable-{version:06d}.arrow"
            urls = list(self.exact)
            write_segment_file(os.path.join(shard_dir, name), urls,
                               stable_hash64(urls))
            files.append(name)
            rows += len(urls)
        return {"shard": self.shard_id, "files": files, "rows": rows}

    def restore_from_checkpoint(self, shard_dir: str, files: list[str],
                                exclude: list[str]) -> None:
        """Rebuild from a segment-manifest checkpoint: adopt each file as a
        live segment (hard-link + mmap — no URL strings pass through Python),
        rebuild the membership filter from the mmap'd hash columns, and mark
        ``exclude`` (in-flight at checkpoint time) as tombstones."""
        from .diskstore import DiskSegmentStore

        assert self.store is not None
        self.store = DiskSegmentStore(self.store.dir)  # drop crashed scratch
        self.exact = set()
        self.cuckoo = CuckooFilter(self.capacity, seed=self.shard_id)
        self.bloom = None
        for name in files:
            self.store.adopt_segment(os.path.join(shard_dir, name))
        if self.store.n_rows:
            self._filter_insert(self.store.all_hashes())
        self.tombstones = set(exclude)

    def restore(self, table: pa.Table) -> None:
        urls = table.column("url").to_pylist()
        self.tombstones = set()
        self.cuckoo = CuckooFilter(self.capacity, seed=self.shard_id)
        self.bloom = None
        if self.store is not None:
            # stale segments were discarded at store construction; rebuild the
            # full store as one segment and start with an empty memtable
            from .diskstore import DiskSegmentStore

            self.store = DiskSegmentStore(self.store.dir)
            self.exact = set()
            if urls:
                self.store.flush(urls, stable_hash64(urls))
                self._filter_insert(stable_hash64(urls))
            return
        self.exact = set(urls)
        if urls:
            self._filter_insert(stable_hash64(urls))

    def stats(self) -> dict:
        st = {
            "shard": self.shard_id,
            "n": (len(self.exact) + (self.store.n_rows if self.store else 0)
                  - len(self.tombstones)),
            "memtable": len(self.exact),
            "filter": "cuckoo" if self.cuckoo is not None else "bloom",
        }
        if self.store is not None:
            st["disk"] = self.store.stats()
        return st


SeenShard = ray.remote(SeenShardCore)


@ray.remote(num_cpus=0)
def _merge_shard_masks(n: int, idxs: list, *masks) -> np.ndarray:
    """Reassemble per-shard check_and_add masks into wave order."""
    out = np.zeros(n, dtype=bool)
    for g, mask in zip(idxs, masks):
        out[g] = mask
    return out


class SeenSet:
    """Client facade: routes batches to shard actors, reassembles masks.

    One network round-trip per shard per call; shards work in parallel.
    """

    def __init__(self, n_shards: int = 4, capacity_per_shard: int = 1 << 18,
                 store_dir: str | None = None, memtable_cap: int = 1 << 20):
        self.n_shards = n_shards
        self.shards = [
            # num_cpus=0: shards are bookkeeping actors (hash-set probes, a
            # few ms per call). Reserving fractional CPUs lets K concurrent
            # jobs each grab part of their shard gang and circular-wait when
            # the cluster can't fit K full gangs; zero-CPU actors always
            # schedule. SPREAD still distributes them across nodes.
            SeenShard.options(num_cpus=0, scheduling_strategy="SPREAD").remote(
                i, capacity_per_shard,
                store_dir=(os.path.join(store_dir, f"shard{i:03d}")
                           if store_dir else None),
                memtable_cap=memtable_cap,
            )
            for i in range(n_shards)
        ]

    def _route(self, urls: list[str]) -> tuple[np.ndarray, np.ndarray, list[list[int]]]:
        hashes = stable_hash64(urls)
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        groups: list[list[int]] = [[] for _ in range(self.n_shards)]
        for i, s in enumerate(shard_of):
            groups[s].append(i)
        return hashes, shard_of, groups

    def _call(self, method: str, urls: list[str]) -> np.ndarray:
        if not urls:
            return np.zeros(0, dtype=bool)
        hashes, _, groups = self._route(urls)
        refs, idxs = [], []
        for s, g in enumerate(groups):
            if not g:
                continue
            refs.append(
                getattr(self.shards[s], method).remote(
                    [urls[i] for i in g], hashes[g]
                )
            )
            idxs.append(g)
        out = np.zeros(len(urls), dtype=bool)
        for mask, g in zip(ray.get(refs), idxs):
            out[g] = mask
        return out

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        return self._call("check_and_add", urls)

    def check_and_add_async(self, urls: list[str]) -> ray.ObjectRef:
        """Non-blocking check_and_add: returns an ObjectRef of the full wave
        mask, assembled by a tiny remote task from the shard responses. The
        driver can dispatch fetch work carrying this ref and let WORKERS wait
        on it (the seen round-trip overlaps task dispatch instead of sitting
        on the driver's critical path)."""
        if not urls:
            return ray.put(np.zeros(0, dtype=bool))
        hashes, _, groups = self._route(urls)
        refs, idxs = [], []
        for s, g in enumerate(groups):
            if not g:
                continue
            refs.append(
                self.shards[s].check_and_add.remote([urls[i] for i in g], hashes[g])
            )
            idxs.append(np.asarray(g, dtype=np.int64))
        return _merge_shard_masks.remote(len(urls), idxs, *refs)

    def contains(self, urls: list[str]) -> np.ndarray:
        return self._call("contains", urls)

    def dump(self) -> pa.Table:
        tables = ray.get([s.dump.remote() for s in self.shards])
        return pa.concat_tables(tables)

    def checkpoint_to(self, ck_dir: str, version: int) -> list[dict]:
        """O(delta) segment checkpoint across all shards (requires
        ``store_dir``); shards link/write in parallel. Returns the
        per-shard manifests for the job meta."""
        return ray.get(
            [s.checkpoint_to.remote(ck_dir, version) for s in self.shards]
        )

    def restore_from_checkpoint(self, ck_dir: str, manifests: list[dict],
                                exclude: list[str] | None = None) -> None:
        groups: list[list[str]] = [[] for _ in range(self.n_shards)]
        if exclude:
            hashes = stable_hash64(exclude)
            for u, s in zip(exclude, hashes % np.uint64(self.n_shards)):
                groups[int(s)].append(u)
        ray.get([
            self.shards[m["shard"]].restore_from_checkpoint.remote(
                os.path.join(ck_dir, f"shard{m['shard']:03d}"),
                m["files"], groups[m["shard"]],
            )
            for m in manifests
        ])

    def restore(self, table: pa.Table) -> None:
        shard_col = table.column("shard").to_numpy()
        ray.get(
            [
                s.restore.remote(table.filter(pa.array(shard_col == i)))
                for i, s in enumerate(self.shards)
            ]
        )

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def total(self) -> int:
        return sum(st["n"] for st in self.stats())

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
