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
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..frontier import Frontier
from ..refmodel import CrawlOptions
from ..schema import COUNTERS_SCHEMA
from ..stages.fetch import (
    FETCH_META_SCHEMA,
    FetchParseActor,
    FetchWorker,
    JobContext,
)
from ..state.seen import SeenSet
from ..urlnorm import canonicalize_url


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
    visited_mirror_cap: int = 10_000_000  # driver-side contains() cache bound
    render_iters: int = 0  # per-page fetch/render CPU model (JobContext doc)
    # politeness enforcement: "driver" applies opts.per_host_cap inline
    # (conformance-exact, single-process deferral); "actors" routes admission
    # through the sharded token-bucket PolitenessSet (the scale path; exactly
    # equivalent at rate=burst=cap with one bucket period per round)
    politeness: str = "driver"
    n_politeness_shards: int = 2
    # stream_order: do NOT hold the whole crawl order in driver memory — the
    # driver keeps only the rows since the last checkpoint (flushed to an
    # order segment per checkpoint) and order_table() reads the segments back
    # from disk. Requires checkpoint_dir. At design scale (10^10 URLs) the
    # order is a table, not a driver list; the default False preserves the
    # in-memory list for small conformance jobs.
    stream_order: bool = False


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
    frontier_ops: int = 0  # pushes + pops + seen-set membership ops (bench metric)
    timings: dict = field(default_factory=dict)  # phase -> seconds (perf debug)
    # per-round skew lineage: (round, top host, share of wave) — surfaces
    # hot-host pressure so budget caps / salting can be tuned (north rule)
    host_stats: list = field(default_factory=list)
    # incremental-order bookkeeping: `order` holds rows with global indices
    # [order_base, order_base+len(order)); segments on disk (order_dir) cover
    # [0, order_rows_persisted). Default mode: order_base==0, order holds all.
    order_base: int = 0
    order_rows_persisted: int = 0
    order_segments: int = 0
    order_dir: str | None = None

    def _tail_table(self) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "url": pa.array([o[0] for o in self.order], pa.string()),
                "depth": pa.array([o[1] for o in self.order], pa.int32()),
                "ok": pa.array([o[2] for o in self.order], pa.bool_()),
                "fetch_order": pa.array(
                    range(self.order_base, self.order_base + len(self.order)),
                    pa.int64(),
                ),
            }
        )

    def order_table(self) -> pa.Table:
        tail = self._tail_table()
        if self.order_base == 0:
            return tail
        # streamed mode: prefix lives in on-disk segments
        from .. import storage

        segs = [
            storage.read_table(
                storage.table_uri(self.order_dir, f"seg-{i:05d}")
            )
            for i in range(self.order_segments)
        ]
        return pa.concat_tables(segs + [tail]) if segs else tail


class _PoolExecutor:
    """Persistent FetchWorker pool — low latency, no per-round actor churn."""

    MIN_CHUNK = 128  # per-task overhead (~10-20ms) vs ~0.1ms/row of work

    def __init__(self, corpus_ref, n_workers: int, ctx: JobContext):
        # fractional num_cpus: workers + seen shards + driver must co-schedule
        # even at num_cpus=4 (test sessions); fetch is I/O-shaped anyway
        # max_restarts/max_task_retries: a crashed fetch worker restarts
        # (rebuilds its index from plasma) and the in-flight chunk re-runs —
        # fetch rows are idempotent, ordering is restored by discovery_seq
        # (SURVEY.md §4.2 task-retry row)
        self.workers = [
            FetchWorker.options(
                num_cpus=0.5, max_restarts=2, max_task_retries=2
            ).remote([corpus_ref], ctx)
            for _ in range(n_workers)
        ]
        # ASYNC warm-up: actors spawn + import + build their index in the
        # background while the crawl's early (small) waves run on whichever
        # workers are already up. Blocking here would serialize ~2-3s of
        # cold-start into every job; blocking per-round (no warm-up at all)
        # pays it again every time a growing wave first touches a cold actor.
        self._ping_refs = [
            w.ping.remote(touch=(i == 0)) for i, w in enumerate(self.workers)
        ]
        self._ready: list[int] = []
        ray.get(self._ping_refs[0])  # at least one worker must be live
        self._ready.append(0)

    def _ready_workers(self) -> list:
        if len(self._ready) < len(self.workers):
            done, _ = ray.wait(
                self._ping_refs, num_returns=len(self._ping_refs), timeout=0
            )
            done_set = set(done)
            self._ready = [
                i for i, r in enumerate(self._ping_refs) if r in done_set
            ] or [0]
        return [self.workers[i] for i in self._ready]

    def fetch(self, table: pa.Table, round_no: int) -> pa.Table:
        n = table.num_rows
        if n == 0:
            return pa.Table.from_pylist([], FETCH_META_SCHEMA)
        workers = self._ready_workers()
        # two chunks queued per worker: the second pipelines behind the first
        # inside each actor, halving the straggler tail without a per-chunk
        # driver dispatch loop (one barrier per wave)
        k = min(2 * len(workers), max(1, (n + self.MIN_CHUNK - 1) // self.MIN_CHUNK))
        bounds = np.linspace(0, n, k + 1).astype(int)
        refs = [
            workers[i % len(workers)].fetch.remote(
                table.slice(bounds[i], bounds[i + 1] - bounds[i]), round_no, i
            )
            for i in range(k)
            if bounds[i + 1] > bounds[i]
        ]
        return pa.concat_tables(ray.get(refs)).sort_by("discovery_seq")

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)


class _DatasetExecutor:
    """ray.data map_batches actor-pool — per-round Dataset execution.

    Parity path for conformance; the pool executor is preferred for a
    continuous frontier loop because map_batches recreates its actor pool
    every round (reference keeps crawler processes alive for the whole job).
    """

    def __init__(self, corpus_ref, concurrency: int, batch_size: int, ctx: JobContext):
        self.corpus_ref = corpus_ref
        self.concurrency = concurrency
        self.batch_size = batch_size
        self.ctx = ctx

    def fetch(self, table: pa.Table, round_no: int) -> pa.Table:
        import dataclasses

        if table.num_rows == 0:
            return pa.Table.from_pylist([], FETCH_META_SCHEMA)
        ctx = dataclasses.replace(self.ctx, round_no=round_no)
        ds = ray.data.from_arrow(table)
        out = ds.map_batches(
            FetchParseActor,
            fn_constructor_args=([self.corpus_ref], ctx),
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
    seed = canonicalize_url(seed_url)
    ctx = JobContext(
        seed=seed,
        strategy=opts.strategy,
        include_paths=tuple(opts.include_paths),
        exclude_paths=tuple(opts.exclude_paths),
        robots=opts.robots,
        spans_dir=cfg.spans_out_dir,
        render_iters=cfg.render_iters,
        scrape_paths=tuple(opts.scrape_paths),
    )

    politeness_set = None
    if cfg.politeness == "actors" and opts.per_host_cap > 0:
        from ..state.politeness import PolitenessSet

        politeness_set = PolitenessSet(
            cfg.n_politeness_shards,
            default_rate_per_sec=float(opts.per_host_cap),
            burst=float(opts.per_host_cap),
        )

    visited_mirror: set[str] = set()
    mirror_complete = True
    start_round = 0
    if resume and cfg.checkpoint_dir and os.path.exists(os.path.join(cfg.checkpoint_dir, "meta.json")):
        start_round = _restore(cfg, seen, frontier, out, counters_rows)
        # rounds after the restored checkpoint will re-execute and rewrite
        # their span dirs — but part names are per-actor-unique, so stale
        # parts from the crashed attempt would SURVIVE alongside the re-run's
        # and read back as duplicate rows. Drop those round dirs up front.
        if cfg.spans_out_dir and os.path.isdir(cfg.spans_out_dir):
            import shutil

            for d_ in os.listdir(cfg.spans_out_dir):
                if d_.startswith("round=") and int(d_.split("=")[1]) > start_round:
                    shutil.rmtree(os.path.join(cfg.spans_out_dir, d_))
        from .. import storage as _st

        ck_seen = _st.read_table(_st.table_uri(cfg.checkpoint_dir, "seen"))
        if ck_seen.num_rows <= cfg.visited_mirror_cap:
            visited_mirror.update(ck_seen.column("url").to_pylist())
        else:
            mirror_complete = False
    else:
        frontier.push(seed, 0, 0)

    use_pool = cfg.executor == "pool" or (cfg.executor == "auto" and opts.wave_size <= 64)
    # never create more workers than the wave can feed (idle actors still pay
    # cold-start imports that contend with the crawl on small machines)
    usable = max(1, (opts.wave_size + _PoolExecutor.MIN_CHUNK - 1) // _PoolExecutor.MIN_CHUNK)
    n_workers = min(cfg.n_fetch_workers, usable)
    executor = (
        _PoolExecutor(corpus_ref, n_workers, ctx)
        if use_pool
        else _DatasetExecutor(corpus_ref, n_workers, cfg.dataset_batch_size, ctx)
    )

    import time as _time

    def _tick(phase, t0):
        out.timings[phase] = out.timings.get(phase, 0.0) + (_time.perf_counter() - t0)
        return _time.perf_counter()

    try:
        round_no = start_round
        while len(frontier) > 0 and out.completed + out.failed < opts.limit:
            _t = _time.perf_counter()
            batch_size = min(opts.wave_size, opts.limit - out.completed - out.failed)
            if politeness_set is not None:
                rnd = round_no  # one bucket period per round (deterministic)
                wave = frontier.pop_wave_admit(
                    batch_size, lambda hosts: politeness_set.admit(hosts, float(rnd))
                )
            else:
                wave = frontier.pop_wave(batch_size, opts.per_host_cap)
            if not wave:
                break
            round_no += 1
            out.rounds += 1

            _t = _tick("wave_form", _t)
            # pop-time visited check+add, wave order (coordinator :42-44)
            wave_urls = [w[0] for w in wave]
            newly = seen.check_and_add(wave_urls)
            out.frontier_ops += 2 * len(wave)  # pops + check_and_add
            if mirror_complete:
                visited_mirror.update(
                    u for u, is_new in zip(wave_urls, newly) if is_new
                )
                if len(visited_mirror) > cfg.visited_mirror_cap:
                    mirror_complete = False  # overflow: shards take over contains()
                    visited_mirror.clear()

            fetch_idx = np.flatnonzero(newly)
            wave_table = pa.Table.from_pydict(
                {
                    "url": [wave_urls[i] for i in fetch_idx],
                    "depth": pa.array([wave[i][1] for i in fetch_idx], pa.int32()),
                    # discovery_seq doubles as within-wave position key
                    "discovery_seq": pa.array([int(i) for i in fetch_idx], pa.int64()),
                }
            )
            _t = _tick("seen_add", _t)
            results = executor.fetch(wave_table, round_no)  # sorted by wave pos
            _t = _tick("fetch", _t)

            # counters + crawl order, wave order (coordinator :81-85)
            nrows = results.num_rows
            ok_np = results.column("ok").to_numpy(zero_copy_only=False) if nrows else np.zeros(0, bool)
            depth_np = results.column("depth").to_numpy(zero_copy_only=False).astype(np.int64) if nrows else np.zeros(0, np.int64)
            url_col = results.column("url").to_pylist() if nrows else []
            n_ok = int(ok_np.sum())
            succ_delta, fail_delta = n_ok, nrows - n_ok
            for j in range(nrows):
                out.order.append((url_col[j], int(depth_np[j]), bool(ok_np[j])))
            out.completed += succ_delta
            out.failed += fail_delta
            out.total_bytes += int(results.column("bytes").to_numpy().sum()) if nrows else 0
            if nrows:
                vc = pc.value_counts(results.column("host"))
                counts = vc.field("counts").to_numpy()
                top = int(np.argmax(counts))
                out.host_stats.append(
                    (round_no, vc.field("values")[top].as_py(), int(counts[top]),
                     round(float(counts[top]) / nrows, 4))
                )

            # link expansion, wave order then document order (coordinator
            # :103-117). Strategy/path/robots eligibility was computed
            # vectorized INSIDE the fetch stage (links_elig); here only
            # visited + the growing-pending limit remain. Candidate masks are
            # computed in Arrow/numpy over the flattened link list; Python
            # strings materialize ONLY for surviving links.
            links_arr = results.column("links").combine_chunks() if nrows else None
            if nrows:
                lens = pc.list_value_length(links_arr).to_numpy(zero_copy_only=False)
                flat_links = pc.list_flatten(links_arr)
                flat_elig = pc.list_flatten(
                    results.column("links_elig").combine_chunks()
                ).to_numpy(zero_copy_only=False)
                row_of = np.repeat(np.arange(nrows), lens)
                n_links_total = len(flat_links)
            else:
                n_links_total = 0
            _t = _tick("meta_cols", _t)
            out.frontier_ops += n_links_total  # membership probes
            enq_delta = 0
            # fast path: when even pushing EVERY candidate cannot reach the
            # limit, the per-link budget check is vacuous — one vectorized
            # filter + bulk append (order preserved: wave, then document)
            budget_safe = (
                out.completed + out.failed + len(frontier) + n_links_total
                < opts.limit
            )
            if nrows and budget_safe:
                row_live = ok_np & (depth_np < opts.max_depth)
                keep = flat_elig & row_live[row_of]
                cand = flat_links.filter(pa.array(keep)).to_pylist()
                cand_rows = row_of[keep]
                if mirror_complete:
                    not_vis = np.fromiter(
                        (l not in visited_mirror for l in cand), bool, len(cand)
                    )
                else:
                    uniq = list(dict.fromkeys(cand))
                    vis = seen.contains(uniq) if uniq else np.zeros(0, bool)
                    vset = {u for u, v in zip(uniq, vis) if v}
                    not_vis = np.fromiter((l not in vset for l in cand), bool, len(cand))
                _t = _tick("visited_probe", _t)
                accepted = [l for l, v in zip(cand, not_vis) if v]
                frontier.push_rows(accepted, depth_np[cand_rows[not_vis]] + 1)
                enq_delta = len(accepted)
                out.frontier_ops += enq_delta
            elif nrows:
                links_col = links_arr.to_pylist()
                elig_col = results.column("links_elig").to_pylist()
                if mirror_complete:
                    visited_map = visited_mirror
                else:
                    all_links = [l for links in links_col for l in links]
                    uniq = list(dict.fromkeys(all_links))
                    vis_mask = seen.contains(uniq) if uniq else np.zeros(0, bool)
                    visited_map = {u for u, v in zip(uniq, vis_mask) if v}
                _t = _tick("visited_probe", _t)
                for j in range(nrows):
                    if not ok_np[j]:
                        continue
                    depth = int(depth_np[j])
                    if depth >= opts.max_depth:
                        continue
                    for l, e_ok in zip(links_col[j], elig_col[j]):
                        # coordinator :108-112 — len(pending) grows as pushed
                        if l in visited_map or out.completed + out.failed + len(frontier) >= opts.limit:
                            continue
                        if not e_ok:
                            continue
                        frontier.push(l, depth + 1, 0)
                        enq_delta += 1
                        out.frontier_ops += 1  # push

            _t = _tick("link_push", _t)
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
        if politeness_set is not None:
            politeness_set.shutdown()
        seen.shutdown()


def _checkpoint(cfg, seen, frontier, out, counters_rows, round_no) -> None:
    """Checkpoint state. Order I/O is O(rows since last checkpoint): the
    delta appends as a new segment under order/ instead of rewriting the
    whole accumulated order table (round-1 O(pages^2/k) rewrite)."""
    from .. import storage

    d = cfg.checkpoint_dir
    os.makedirs(d, exist_ok=True)
    storage.write_table(frontier.dump(round_no), storage.table_uri(d, "frontier"))
    storage.write_table(seen.dump(), storage.table_uri(d, "seen"))
    storage.write_table(
        pa.Table.from_pylist(counters_rows, schema=COUNTERS_SCHEMA),
        storage.table_uri(d, "counters"),
    )
    order_dir = os.path.join(d, "order")
    out.order_dir = order_dir
    delta_start = out.order_rows_persisted - out.order_base
    delta = out.order[delta_start:]
    if delta:
        seg = pa.Table.from_pydict(
            {
                "url": [o[0] for o in delta],
                "depth": pa.array([o[1] for o in delta], pa.int32()),
                "ok": [o[2] for o in delta],
                "fetch_order": pa.array(
                    range(out.order_rows_persisted,
                          out.order_rows_persisted + len(delta)),
                    pa.int64(),
                ),
            }
        )
        storage.write_table(
            seg, storage.table_uri(order_dir, f"seg-{out.order_segments:05d}")
        )
        out.order_segments += 1
        out.order_rows_persisted += len(delta)
    if cfg.stream_order:
        out.order.clear()
        out.order_base = out.order_rows_persisted
    meta = {
        "job_id": cfg.job_id,
        "round": round_no,
        "completed": out.completed,
        "failed": out.failed,
        "rounds": out.rounds,
        "total_bytes": out.total_bytes,
        "next_seq": frontier._next_seq,
        "order_segments": out.order_segments,
        "order_rows": out.order_rows_persisted,
    }
    tmp = os.path.join(d, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def _restore(cfg, seen, frontier, out, counters_rows) -> int:
    from .. import storage

    d = cfg.checkpoint_dir
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    frontier.restore(storage.read_table(storage.table_uri(d, "frontier")))
    frontier._next_seq = meta["next_seq"]
    seen.restore(storage.read_table(storage.table_uri(d, "seen")))
    counters_rows.extend(storage.read_table(storage.table_uri(d, "counters")).to_pylist())
    out.order_dir = os.path.join(d, "order")
    out.order_segments = meta["order_segments"]
    out.order_rows_persisted = meta["order_rows"]
    # a crash between a segment write and the meta.json rename leaves a
    # stale segment past the recorded count — remove it so the re-run's
    # segment numbering stays consistent
    if os.path.isdir(out.order_dir):
        for f_ in os.listdir(out.order_dir):
            if f_.startswith("seg-"):
                try:
                    idx = int(f_.split("-")[1].split(".")[0])
                except ValueError:
                    continue
                if idx >= out.order_segments:
                    os.remove(os.path.join(out.order_dir, f_))
    if cfg.stream_order:
        out.order_base = out.order_rows_persisted  # order stays on disk
    else:
        for i in range(out.order_segments):
            seg = storage.read_table(
                storage.table_uri(out.order_dir, f"seg-{i:05d}")
            )
            out.order.extend(
                zip(
                    seg.column("url").to_pylist(),
                    seg.column("depth").to_pylist(),
                    seg.column("ok").to_pylist(),
                )
            )
    out.completed = meta["completed"]
    out.failed = meta["failed"]
    out.rounds = meta["rounds"]
    out.total_bytes = meta["total_bytes"]
    return meta["round"]
