"""The crawl pipeline — driver round loop over Ray actor stages.

Ray-Data-native re-expression of the reference auto-crawl coordinator
(reference packages/scrape/src/utils/crawlCoordinator.ts:14-136) per
SURVEY.md §3.2/§7: the driver owns ORDERING (wave formation + link-push
sequence, the part that must match the reference byte-for-byte); membership
lives in sharded seen-set actors (state/seen.py); fetch+parse runs as an
Arrow actor-pool stage (stages/fetch.py) — ``map_batches`` for production
waves, a persistent actor pool for tiny conformance waves; spans stream to
partitioned parquet (one directory per round — resumable output); counters
and lineage are emitted per round (COUNTERS_SCHEMA, the Redis
``crawl:{jobId}`` analog, reference managers/Progress.ts:8-27).

Conformance: ``run_crawl(...)`` must equal ``refmodel.run_reference_crawl``
on (crawl order, final seen set, completed/failed counters) for every
(seed, strategy, limit, depth, include/exclude, politeness) combination —
enforced by tests/test_crawl_conformance.py.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..frontier import Frontier
from ..pathmatch import PathMatcher
from ..refmodel import CrawlOptions, robots_disallowed
from ..schema import COUNTERS_SCHEMA, FETCH_SCHEMA
from ..stages.fetch import FetchParseActor, FetchWorker
from ..state.seen import SeenSet
from ..urlnorm import canonicalize_url, hostname_of, matches_strategy


@dataclass
class CrawlRunConfig:
    job_id: str = "job-0"
    n_fetch_workers: int = 4
    n_seen_shards: int = 4
    executor: str = "auto"        # "pool" | "dataset" | "auto"
    dataset_batch_size: int = 256
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0      # rounds; 0 = only final
    spans_out_dir: str | None = None
    frontier_spill_threshold: int = 1_000_000
    stop_after_rounds: int = 0  # crash simulation: checkpoint + stop mid-crawl


@dataclass
class CrawlOutput:
    order: list[tuple[str, int, bool]] = field(default_factory=list)
    completed: int = 0
    failed: int = 0
    rounds: int = 0
    visited_count: int = 0
    counters: pa.Table | None = None
    spans_dir: str | None = None
    total_bytes: int = 0
    fetched_rows: list[int] = field(default_factory=list)

    def order_table(self) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "url": [o[0] for o in self.order],
                "depth": pa.array([o[1] for o in self.order], pa.int32()),
                "ok": [o[2] for o in self.order],
                "fetch_order": pa.array(range(len(self.order)), pa.int64()),
            }
        )


class _PoolExecutor:
    """Persistent FetchWorker pool — low latency for small waves."""

    def __init__(self, corpus_ref, n_workers: int):
        # fractional num_cpus: workers + seen shards + driver must co-schedule
        # even at num_cpus=4 (test sessions); fetch is I/O-shaped anyway
        self.workers = [
            FetchWorker.options(num_cpus=0.5).remote(corpus_ref) for _ in range(n_workers)
        ]

    def fetch(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        if n == 0:
            return table.cast(FETCH_SCHEMA) if table.schema.equals(FETCH_SCHEMA) else pa.Table.from_pylist([], FETCH_SCHEMA)
        k = min(len(self.workers), n)
        bounds = np.linspace(0, n, k + 1).astype(int)
        refs = [
            self.workers[i].fetch.remote(table.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(k)
            if bounds[i + 1] > bounds[i]
        ]
        out = pa.concat_tables(ray.get(refs))
        return out.sort_by("discovery_seq")

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)


class _DatasetExecutor:
    """ray.data map_batches actor-pool — the production/scale path."""

    def __init__(self, corpus_ref, concurrency: int, batch_size: int):
        self.corpus_ref = corpus_ref
        self.concurrency = concurrency
        self.batch_size = batch_size

    def fetch(self, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return pa.Table.from_pylist([], FETCH_SCHEMA)
        ds = ray.data.from_arrow(table)
        out = ds.map_batches(
            FetchParseActor,
            fn_constructor_args=(self.corpus_ref,),
            concurrency=self.concurrency,
            batch_size=self.batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
            num_cpus=0.5,  # co-schedule with seen-shard actors in small sessions
        )
        parts = [b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")]
        return pa.concat_tables(parts).sort_by("discovery_seq")

    def shutdown(self) -> None:
        pass


def run_crawl(
    seed_url: str,
    opts: CrawlOptions,
    corpus: pa.Table | ray.ObjectRef,
    cfg: CrawlRunConfig = CrawlRunConfig(),
    resume: bool = False,
) -> CrawlOutput:
    """Execute one crawl job (reference: one ``runAutoCrawl`` invocation)."""
    corpus_ref = corpus if isinstance(corpus, ray.ObjectRef) else ray.put(corpus)

    seen = SeenSet(cfg.n_seen_shards)
    frontier = Frontier(
        cfg.job_id,
        spill_threshold=cfg.frontier_spill_threshold,
        spill_dir=os.path.join(cfg.checkpoint_dir, "spill") if cfg.checkpoint_dir else None,
    )
    out = CrawlOutput(spans_dir=cfg.spans_out_dir)
    counters_rows: list[dict] = []
    matcher = PathMatcher(list(opts.include_paths), list(opts.exclude_paths))
    seed = canonicalize_url(seed_url)

    start_round = 0
    if resume and cfg.checkpoint_dir and os.path.exists(os.path.join(cfg.checkpoint_dir, "meta.json")):
        start_round = _restore(cfg, seen, frontier, out, counters_rows)
    else:
        frontier.push(seed, 0, 0)

    use_pool = cfg.executor == "pool" or (cfg.executor == "auto" and opts.wave_size <= 64)
    executor = (
        _PoolExecutor(corpus_ref, cfg.n_fetch_workers)
        if use_pool
        else _DatasetExecutor(corpus_ref, cfg.n_fetch_workers, cfg.dataset_batch_size)
    )

    try:
        round_no = start_round
        while len(frontier) > 0 and out.completed + out.failed < opts.limit:
            batch_size = min(opts.wave_size, opts.limit - out.completed - out.failed)
            wave = frontier.pop_wave(batch_size, opts.per_host_cap)
            if not wave:
                break
            round_no += 1
            out.rounds += 1

            # pop-time visited check+add, wave order (coordinator :42-44)
            wave_urls = [w[0] for w in wave]
            newly = seen.check_and_add(wave_urls)

            fetch_idx = np.flatnonzero(newly)
            wave_table = pa.Table.from_pydict(
                {
                    "url": [wave_urls[i] for i in fetch_idx],
                    "depth": pa.array([wave[i][1] for i in fetch_idx], pa.int32()),
                    # discovery_seq doubles as within-wave position key
                    "discovery_seq": pa.array([int(i) for i in fetch_idx], pa.int64()),
                }
            )
            results = executor.fetch(wave_table)  # sorted by within-wave pos

            # counters + crawl order, wave order (coordinator :81-85)
            ok_col = results.column("ok").to_pylist() if results.num_rows else []
            links_col = results.column("links").to_pylist() if results.num_rows else []
            depth_col = results.column("depth").to_pylist() if results.num_rows else []
            n_ok = sum(ok_col)
            succ_delta, fail_delta = n_ok, len(ok_col) - n_ok
            for j in range(results.num_rows):
                u = results.column("url")[j].as_py()
                out.order.append((u, depth_col[j], ok_col[j]))
            out.completed += succ_delta
            out.failed += fail_delta
            out.total_bytes += sum(results.column("bytes").to_pylist()) if results.num_rows else 0

            # persist spans for this round (resumable partitioned output, S6)
            if cfg.spans_out_dir and results.num_rows:
                rd = os.path.join(cfg.spans_out_dir, f"round={round_no:05d}")
                os.makedirs(rd, exist_ok=True)
                pq.write_table(
                    results.select(["url", "host", "depth", "status_code", "ok", "spans", "bytes"]),
                    os.path.join(rd, "part-0.parquet"),
                )

            # link expansion, wave order then document order (coordinator :103-117)
            all_links = [l for links in links_col for l in links]
            uniq = list(dict.fromkeys(all_links))
            vis_mask = seen.contains(uniq) if uniq else np.zeros(0, dtype=bool)
            visited_map = dict(zip(uniq, vis_mask))
            enq_delta = 0
            for j in range(results.num_rows):
                if not ok_col[j]:
                    continue
                depth = depth_col[j]
                if depth >= opts.max_depth:
                    continue
                links = links_col[j]
                strat = [matches_strategy(l, seed, opts.strategy) for l in links]
                paths = matcher.match_many(links)
                for l, s_ok, p_ok in zip(links, strat, paths):
                    # coordinator :108-112 — len(pending) grows as links push
                    if visited_map.get(l, False) or out.completed + out.failed + len(frontier) >= opts.limit:
                        continue
                    if not s_ok or not p_ok:
                        continue
                    if robots_disallowed(l, opts.robots):
                        continue
                    frontier.push(l, depth + 1, 0)
                    enq_delta += 1

            counters_rows.append(
                {
                    "job_id": cfg.job_id,
                    "round": round_no,
                    "partition_id": 0,
                    "enqueued": enq_delta,
                    "done": succ_delta + fail_delta,
                    "succeeded": succ_delta,
                    "failed": fail_delta,
                }
            )
            if cfg.checkpoint_dir and cfg.checkpoint_every and round_no % cfg.checkpoint_every == 0:
                _checkpoint(cfg, seen, frontier, out, counters_rows, round_no)
            if cfg.stop_after_rounds and out.rounds >= cfg.stop_after_rounds:
                break  # simulated crash; final checkpoint below enables resume

        out.visited_count = seen.total()
        out.counters = pa.Table.from_pylist(counters_rows, schema=COUNTERS_SCHEMA)
        if cfg.checkpoint_dir:
            _checkpoint(cfg, seen, frontier, out, counters_rows, round_no)
        return out
    finally:
        executor.shutdown()
        seen.shutdown()


def _checkpoint(cfg, seen, frontier, out, counters_rows, round_no) -> None:
    d = cfg.checkpoint_dir
    os.makedirs(d, exist_ok=True)
    pq.write_table(frontier.dump(round_no), os.path.join(d, "frontier.parquet"))
    pq.write_table(seen.dump(), os.path.join(d, "seen.parquet"))
    pq.write_table(
        pa.Table.from_pylist(counters_rows, schema=COUNTERS_SCHEMA),
        os.path.join(d, "counters.parquet"),
    )
    pq.write_table(out.order_table(), os.path.join(d, "order.parquet"))
    meta = {
        "job_id": cfg.job_id,
        "round": round_no,
        "completed": out.completed,
        "failed": out.failed,
        "rounds": out.rounds,
        "total_bytes": out.total_bytes,
        "next_seq": frontier._next_seq,
    }
    tmp = os.path.join(d, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def _restore(cfg, seen, frontier, out, counters_rows) -> int:
    d = cfg.checkpoint_dir
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    frontier.restore(pq.read_table(os.path.join(d, "frontier.parquet")))
    frontier._next_seq = meta["next_seq"]
    seen.restore(pq.read_table(os.path.join(d, "seen.parquet")))
    counters_rows.extend(pq.read_table(os.path.join(d, "counters.parquet")).to_pylist())
    order_t = pq.read_table(os.path.join(d, "order.parquet"))
    out.order.extend(
        zip(
            order_t.column("url").to_pylist(),
            order_t.column("depth").to_pylist(),
            order_t.column("ok").to_pylist(),
        )
    )
    out.completed = meta["completed"]
    out.failed = meta["failed"]
    out.rounds = meta["rounds"]
    out.total_bytes = meta["total_bytes"]
    return meta["round"]
