"""Fetch+parse stage: frontier batch -> fetched spans + filtered links.

The Ray equivalent of the reference's per-engine crawler worker
(reference packages/scrape/src/engines/Cheerio.ts:32-58 fetch;
core/DataExtractor.ts:268-302,417-432 parse/assemble;
DataExtractor.ts:490-494 links format via extractUrlsFromCheerio;
link filters engines/Base.ts:391-474 run inside the crawler too).

Shape: a callable CLASS for ``map_batches(FetchParseActor, concurrency=N,
batch_format="pyarrow", zero_copy_batch=True)``. All per-job state — the
corpus index (this sandbox's synthetic "web"; in production the HTTP/browser
client pool, T1-T3), the compiled include/exclude matchers, the robots table
— is built ONCE per actor in ``__init__`` from a broadcast JobContext, never
per batch.

Scale-critical split: workers write SPAN PAYLOADS directly to partitioned
parquet (``spans_dir/round=R/part-{actor_token}-{seq}.parquet``) and return
only small metadata
(url, ok, links + eligibility mask, bytes) to the driver. The driver's
ordering loop never deserializes page content — at 100 TB the fat columns
move storage->worker->storage only.

Status normalization (ok / status_code) mirrors engines/Base.ts:130-184.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

import hashlib

from ..corpus import CorpusIndex
from ..functions import text as tx
from ..pathmatch import PathMatcher
from ..refmodel import robots_disallowed
from ..schema import FETCH_SCHEMA
from ..urlnorm import canonicalize_links, hosts_of_batch, matches_strategy_batch

# Metadata-only result (spans stay in the worker; see module docstring).
FETCH_META_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("status_code", pa.int32()),
        pa.field("ok", pa.bool_()),
        pa.field("links", pa.list_(pa.string())),
        pa.field("links_elig", pa.list_(pa.bool_())),  # strategy&paths&robots
        pa.field("bytes", pa.int64()),
    ]
)


@dataclass
class JobContext:
    """Per-crawl-job constants broadcast to every fetch worker."""

    seed: str = ""
    strategy: str = "all"
    include_paths: tuple[str, ...] = ()
    exclude_paths: tuple[str, ...] = ()
    robots: dict | None = None
    spans_dir: str | None = None
    filter_links: bool = True
    # M12: persist page content only for URLs matching these patterns; links
    # still expand (reference engines/Base.ts:517-554). Empty = keep all.
    scrape_paths: tuple[str, ...] = ()
    round_no: int = 0  # used by the per-round Dataset executor for span parts
    # Deterministic per-page CPU cost modeling browser-engine fetch+render
    # (reference runs Playwright/Puppeteer pools at concurrency 50,
    # EngineConfigurator.ts:711-743 — the real system burns ~100-1000ms CPU
    # per rendered page; SURVEY.md S2: "modeled as cost-weighted fetch").
    # sha256 chain over the page's first 4 KB, ``render_iters`` rounds;
    # cache-resident, so it scales with cores rather than memory bandwidth.
    render_iters: int = 0
    # §2.10 user-extension surface: registered PipelineStep objects applied
    # to every span batch before the parquet sink (steps.py; reference
    # EngineConfigurator.ts:142-147 hook-merge semantics). Callables are
    # built ONCE per worker in __init__ (stateful classes = per-actor state).
    span_steps: tuple = ()
    # LLM format DAG (reference core/DataExtractor.ts:437-586): when
    # "json"/"summary" are requested, each page's markdown flows through the
    # chunk -> per-chunk agent call -> merge pipeline (functions/agents.py,
    # deterministic mode in this sandbox) and the results append as new span
    # kinds in document order: base spans, then json, then summary.
    formats: tuple = ()
    json_schema_keys: tuple = ("title", "topic")


def fetch_parse_batch(
    batch: pa.Table, idx: CorpusIndex, ctx: JobContext, matcher: PathMatcher
) -> tuple[pa.Table, pa.Table]:
    """(url, depth, discovery_seq) -> (meta table, spans table), input order.

    Vectorized: page spans are gathered from the broadcast corpus with one
    Arrow ``take``; byte accounting, link location and link filters run on
    flattened arrays. Only URL lookup + link canonicalization are per-item
    Python (string resolution is inherently scalar, with batch fast paths).
    """
    from ..urlnorm import strip_fragment

    urls = batch.column("url").to_pylist()
    n = len(urls)
    keys = [strip_fragment(u) for u in canonicalize_links(urls, None)]
    rows = idx.lookup_batch(keys)

    # spans: take only HIT rows from the corpus column (copies just this
    # batch's pages), then reassemble with empty lists at miss positions
    hit_mask = rows >= 0
    hit_spans = idx.take_spans(rows[hit_mask])
    if isinstance(hit_spans, pa.ChunkedArray):
        hit_spans = hit_spans.combine_chunks()
    lens = np.zeros(n, dtype=np.int64)
    if hit_mask.any():
        h_off = hit_spans.offsets.to_numpy()
        lens[hit_mask] = np.diff(h_off)
        values = hit_spans.flatten()
    else:
        values = idx._span_struct
    span_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    spans = pa.ListArray.from_arrays(pa.array(span_offsets, pa.int32()), values)

    ok = rows >= 0
    status = np.where(ok, 200, 404).astype(np.int32)

    # flattened-span vector math: bytes per page, link spans per page
    offsets = spans.offsets.to_numpy()
    flat = spans.flatten()
    span_bytes = pc.add(
        pc.binary_length(flat.field("text")), pc.binary_length(flat.field("media_ref"))
    ).to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(span_bytes)])
    nbytes = (cum[offsets[1:]] - cum[offsets[:-1]]).astype(np.int64)

    kinds = np.asarray(flat.field("kind"))
    link_mask = kinds == "link"
    span_row = np.repeat(np.arange(n), np.diff(offsets))
    raw_links: list[list[str]] = [[] for _ in range(n)]
    for r, ref in zip(span_row[link_mask], np.asarray(flat.field("media_ref"))[link_mask]):
        raw_links[r].append(ref)
    # one base per page -> batch fast-path canonicalization per row
    links_col = [
        canonicalize_links(refs, urls[r]) if refs else []
        for r, refs in enumerate(raw_links)
    ]

    # link eligibility (strategy + include/exclude + robots), vectorized over
    # the batch's flattened link list — the reference runs these inside the
    # crawler process too (Base.ts:427-474, crawlCoordinator.ts:113-115)
    flat_links = [l for links in links_col for l in links]
    if ctx.filter_links and flat_links:
        link_hosts = hosts_of_batch(flat_links)
        elig = matches_strategy_batch(flat_links, link_hosts, ctx.seed, ctx.strategy)
        elig &= np.asarray(matcher.match_many(flat_links), dtype=bool)
        if ctx.robots:
            elig &= ~np.array([robots_disallowed(l, ctx.robots) for l in flat_links])
    else:
        elig = np.ones(len(flat_links), dtype=bool)
    elig_col: list[list[bool]] = []
    pos = 0
    for links in links_col:
        elig_col.append(elig[pos : pos + len(links)].tolist())
        pos += len(links)

    host_arr = pa.array(hosts_of_batch(urls), pa.string())
    depth = (
        pc.cast(batch.column("depth"), pa.int32()).combine_chunks()
        if "depth" in batch.column_names
        else pa.array(np.zeros(n, dtype=np.int32), pa.int32())
    )
    seq = (
        pc.cast(batch.column("discovery_seq"), pa.int64()).combine_chunks()
        if "discovery_seq" in batch.column_names
        else pa.array(np.arange(n, dtype=np.int64), pa.int64())
    )
    url_arr = pa.array(urls, pa.string())
    meta = pa.Table.from_arrays(
        [
            url_arr,
            host_arr,
            depth,
            seq,
            pa.array(status, pa.int32()),
            pa.array(ok),
            pa.array(links_col, pa.list_(pa.string())),
            pa.array(elig_col, pa.list_(pa.bool_())),
            pa.array(nbytes, pa.int64()),
        ],
        schema=FETCH_META_SCHEMA,
    )
    # parse outputs: order-preserving markdown assembly (text+ocr spans joined
    # in offset order — the M4/M9 invariant), content hash (M17), and the
    # text-analysis columns a training-data pipeline wants downstream.
    is_content = (kinds == "text") | (kinds == "ocr")
    sel_flat = flat.field("text").filter(pa.array(is_content))
    ccum = np.concatenate([[0], np.cumsum(is_content.astype(np.int64))])
    sel_counts = ccum[offsets[1:]] - ccum[offsets[:-1]]
    sel_offsets = np.concatenate([[0], np.cumsum(sel_counts)]).astype(np.int32)
    md_lists = pa.ListArray.from_arrays(pa.array(sel_offsets, pa.int32()), sel_flat)
    markdown = pc.binary_join(md_lists, "\n\n")
    md_py = markdown.to_pylist()
    if ctx.render_iters:
        hashes = []
        for m in md_py:
            block = m.encode()[:4096]
            d = hashlib.sha256(block).digest()
            for _ in range(ctx.render_iters):  # render-cost model (see JobContext)
                d = hashlib.sha256(d + block).digest()
            hashes.append(d.hex())
        content_hash = pa.array(hashes, pa.string())
    else:
        content_hash = pa.array(
            [hashlib.sha256(m.encode()).hexdigest() for m in md_py], pa.string()
        )
    metrics = tx.fast_text_metrics(markdown)  # byte-path, one pass
    n_tokens = pa.array(metrics["n_tokens"], pa.int64())
    quality = pa.array(metrics["quality"], pa.float64())
    lang = pa.array(metrics["lang"], pa.string())

    spans_table = pa.Table.from_arrays(
        [url_arr, host_arr, depth, pa.array(status, pa.int32()), pa.array(ok), spans,
         pa.array(nbytes, pa.int64()), markdown, content_hash, n_tokens, quality, lang],
        names=["url", "host", "depth", "status_code", "ok", "spans", "bytes",
               "markdown", "content_hash", "n_tokens", "quality", "lang"],
    )
    return meta, spans_table


def append_format_spans(
    spans_table: pa.Table, formats: tuple, llm, schema_keys: list[str]
) -> pa.Table:
    """LLM format DAG (reference core/DataExtractor.ts:437-586): derive json
    (chunk -> extract-per-chunk -> first-non-null merge) and summary
    (per-chunk summaries -> reduce) from each OK page's markdown and append
    them as span rows AFTER the base spans, order-preserved (json before
    summary, mirroring the formats DAG's assembly order)."""
    import json as _json

    spans_py = spans_table.column("spans").to_pylist()
    mds = spans_table.column("markdown").to_pylist()
    oks = spans_table.column("ok").to_pylist()
    for sp, m, ok in zip(spans_py, mds, oks):
        if not ok:
            continue
        off = len(sp)
        if "json" in formats:
            data = llm.extract(m, schema_keys)
            sp.append({"kind": "json", "text": _json.dumps(data, sort_keys=True),
                       "media_ref": "", "offset": off})
            off += 1
        if "summary" in formats:
            sp.append({"kind": "summary", "text": llm.summary(m),
                       "media_ref": "", "offset": off})
    i = spans_table.column_names.index("spans")
    return spans_table.set_column(
        i, "spans", pa.array(spans_py, spans_table.schema.field("spans").type)
    )


def full_fetch_table(meta: pa.Table, spans_table: pa.Table) -> pa.Table:
    """Recombine meta+spans into the wide FETCH_SCHEMA (tests/debug)."""
    return pa.Table.from_arrays(
        [
            meta.column("url"), meta.column("host"), meta.column("depth"),
            meta.column("discovery_seq"), meta.column("status_code"),
            meta.column("ok"), spans_table.column("spans"), meta.column("links"),
            meta.column("bytes"),
        ],
        schema=FETCH_SCHEMA,
    )


class _JobBundle:
    """Per-job derived worker state (path matchers, span-step callables,
    format agent), built ONCE per (worker, job) so a long-lived pool can
    serve many CONCURRENT jobs with heterogeneous options — the reference's
    BullMQ workers pull jobs with per-job configs from one shared queue
    (reference packages/scrape/src/index.ts worker concurrency;
    EngineConfigurator.ts per-job engine options)."""

    __slots__ = ("ctx", "matcher", "scrape_matcher", "span_step_fns", "llm")

    def __init__(self, ctx: JobContext):
        self.ctx = ctx
        self.matcher = PathMatcher(list(ctx.include_paths), list(ctx.exclude_paths))
        self.scrape_matcher = PathMatcher(list(ctx.scrape_paths), [])
        self.span_step_fns = [s.make_callable() for s in ctx.span_steps]
        self.llm = None
        if "json" in ctx.formats or "summary" in ctx.formats:
            from ..functions.agents import LLMAgentStub

            self.llm = LLMAgentStub(mode="deterministic")  # once per actor


class _WorkerCore:
    """Shared per-actor state + batch logic for both executor flavors."""

    def __init__(self, corpus_ref, ctx: JobContext | None = None):
        import uuid

        # collision-free span part namespace: pid arithmetic can collide
        # (recycled pids, counters overflowing a fixed radix) and silently
        # overwrite another actor's part within a round — a random per-actor
        # token cannot (round-1 ADVICE)
        self._part_token = uuid.uuid4().hex[:12]
        # one OS thread per worker for Arrow kernels: N workers each spinning
        # a full-core Arrow pool thrashes the machine (nested parallelism)
        pa.set_cpu_count(1)
        # corpus arrives as [ObjectRef] ON PURPOSE: a bare ObjectRef argument
        # is auto-dereferenced by Ray, which serializes the whole table into
        # every actor-creation task spec ON THE DRIVER (N x full-corpus
        # serialization, sequential). Boxed, each actor does its own zero-copy
        # plasma read in parallel.
        if isinstance(corpus_ref, list):
            corpus_ref = ray.get(corpus_ref[0])
        self.idx = CorpusIndex(
            corpus_ref if isinstance(corpus_ref, pa.Table) else ray.get(corpus_ref)
        )
        self._default = _JobBundle(ctx or JobContext(filter_links=False))
        self._jobs: dict[str, _JobBundle] = {}
        # legacy aliases (FetchParseActor round_no; tests poke these)
        self.ctx = self._default.ctx
        self.matcher = self._default.matcher

    def register_job(self, job_id: str, ctx: JobContext) -> bool:
        """Bind ``job_id`` to its own context on this worker. Derived state
        (matchers, step callables, agent) is built here once, not per batch;
        subsequent ``process(..., job_id=...)`` calls select it. Idempotent
        re-registration replaces the bundle (a restarted driver job may
        re-register with identical ctx)."""
        self._jobs[job_id] = _JobBundle(ctx)
        return True

    def process(
        self, batch: pa.Table, round_no: int = 0, part_id: int = 0,
        newly_mask: np.ndarray | None = None, job_id: str | None = None,
    ) -> pa.Table:
        b = (self._jobs.get(job_id) or self._default) if job_id else self._default
        # speculative-dispatch support: the driver sends the wave BEFORE the
        # seen-set round trip resolves and passes the mask (indexed by wave
        # position == discovery_seq) as an ObjectRef that Ray resolves right
        # here — the seen RTT overlaps task dispatch instead of blocking the
        # driver. Rows that turn out already-seen are dropped BEFORE any
        # fetch work or span write (no duplicate spans, no wasted render).
        if newly_mask is not None:
            seqs = batch.column("discovery_seq").to_numpy()
            keep = newly_mask[seqs]
            if not keep.all():
                batch = batch.filter(pa.array(keep))
            if batch.num_rows == 0:
                return pa.Table.from_pylist([], FETCH_META_SCHEMA)
        meta, spans_table = fetch_parse_batch(batch, self.idx, b.ctx, b.matcher)
        if b.llm is not None and spans_table.num_rows:
            spans_table = append_format_spans(
                spans_table, b.ctx.formats, b.llm,
                list(b.ctx.json_schema_keys),
            )
        if b.ctx.spans_dir and spans_table.num_rows:
            if b.ctx.scrape_paths:  # M12 content gate
                keep = b.scrape_matcher.match_many(
                    spans_table.column("url").to_pylist()
                )
                spans_table = spans_table.filter(pa.array(keep))
            for fn in b.span_step_fns:  # §2.10 registered span steps
                spans_table = fn(spans_table)
            if spans_table.num_rows:
                d = os.path.join(b.ctx.spans_dir, f"round={round_no:05d}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    spans_table,
                    os.path.join(d, f"part-{self._part_token}-{part_id:06d}.parquet"),
                )
        return meta


class FetchParseActor(_WorkerCore):
    """map_batches actor: returns metadata; spans go straight to parquet."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._part_counter = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        # parts keyed by (per-actor uuid token, per-instance counter)
        self._part_counter += 1
        return self.process(batch, self.ctx.round_no, self._part_counter)


@ray.remote
class FetchWorker(_WorkerCore):
    """Persistent fetch worker for the low-latency pool executor.

    The reference keeps crawler processes alive for the whole job
    (reference packages/scrape/src/core/EngineConfigurator.ts:32-36
    ``isFinishedFunction: () => false``); Ray Data recreates map_batches
    actors per execution, which for a wave of 5 URLs costs more than the
    fetch. The pool keeps actors alive for the whole crawl and feeds them
    Arrow chunks directly; identical batch code, identical results.
    """

    def fetch(
        self, batch: pa.Table, round_no: int = 0, part_id: int = 0,
        newly_mask: np.ndarray | None = None, job_id: str | None = None,
    ) -> pa.Table:
        return self.process(batch, round_no, part_id, newly_mask, job_id)

    def ping(self, touch: bool = False) -> bool:
        if touch:
            # fault the plasma-resident corpus into page cache once, up
            # front — otherwise the first waves pay it as random-access
            # page faults inside the timed crawl
            col = self.idx.table.column("spans")
            chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
            for chunk in chunks:
                for buf in chunk.buffers():
                    if buf is not None and buf.size:
                        np.frombuffer(buf, dtype=np.uint8)[::4096].sum()
        return True
