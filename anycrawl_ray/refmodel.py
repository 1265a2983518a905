"""Reference crawl model — the conformance ORACLE, not the engine.

A pure-Python, single-threaded transcription of the reference auto-crawl
coordinator BFS (reference packages/scrape/src/utils/crawlCoordinator.ts:14-136),
including its subtle semantics:

- wave size = min(5, limit - completed - failed, len(pending))   (:33-38)
- ``visited`` check+add happens at POP time in batch order (:42-44) — a URL
  queued twice occupies a wave slot but fetches once ("lazy dedup")
- link push: skip if visited OR completed+failed+len(pending) >= limit, where
  len(pending) GROWS as links are pushed (:108-112)
- links processed in wave order, then document order (:103-117)
- depth guard: parent depth >= max_depth stops expansion (:106)
- fragments are significant in ``visited`` (full URL strings compared)

Politeness extension (the reference has none — SURVEY.md §4.1 "skew: none"):
defined HERE once and implemented identically by the Ray pipeline:
- robots: a candidate link whose host disallows its path is dropped at link-
  push time (after strategy/path filters). Seeds bypass robots (like the
  reference's include_paths, which never filter the seed).
- per-host wave cap: when forming a wave, admit at most ``per_host_cap`` URLs
  per host, scanning pending in FIFO order; deferred entries keep their order
  at the head of pending. If the cap would admit nothing, the first pending
  entry is admitted anyway (progress guarantee).

The Ray pipeline (pipelines/crawl.py) must match this model's crawl order,
final seen set and counters byte-for-byte (BASELINE.json north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol

from .pathmatch import matches_paths
from .urlnorm import canonicalize_url, hostname_of, matches_strategy


@dataclass(frozen=True)
class CrawlOptions:
    """reference packages/scrape/src/utils/crawlCoordinator.ts:19-24 defaults
    + zod bounds packages/libs/src/types/CrawlSchema.ts:32,48."""

    limit: int = 10
    max_depth: int = 10
    strategy: str = "same-domain"
    include_paths: tuple[str, ...] = ()
    exclude_paths: tuple[str, ...] = ()
    # M12: emit page content only for matching URLs, still expand links
    # (reference engines/Base.ts:517-554); empty = scrape everything
    scrape_paths: tuple[str, ...] = ()
    wave_size: int = 5          # hardcoded 5 in the reference (:33)
    per_host_cap: int = 0       # 0 = off (reference behaviour)
    robots: dict[str, list[str]] | None = None  # host -> disallow path prefixes


class Fetcher(Protocol):
    def fetch(self, url: str) -> "FetchResult": ...


@dataclass
class FetchResult:
    ok: bool
    status_code: int
    links: list[str]            # resolved absolute URLs, document order
    row_idx: int | None = None  # corpus row of the fetched page (spans source)
    nbytes: int = 0


@dataclass
class CrawlTrace:
    """Golden output compared byte-for-byte by the conformance tests."""

    order: list[tuple[str, int, bool]] = field(default_factory=list)  # (url, depth, ok)
    visited: set[str] = field(default_factory=set)
    completed: int = 0
    failed: int = 0
    rounds: int = 0
    fetched_rows: list[int] = field(default_factory=list)  # corpus rows, fetch order
    emitted: list[str] = field(default_factory=list)  # urls whose content is emitted (M12)


def robots_disallowed(url: str, robots: dict[str, list[str]] | None) -> bool:
    if not robots:
        return False
    prefixes = robots.get(hostname_of(url))
    if not prefixes:
        return False
    try:
        from urllib.parse import urlsplit

        path = urlsplit(url).path or "/"
    except ValueError:
        return False
    return any(path.startswith(p) for p in prefixes)


def form_wave(
    pending: list[tuple[str, int]], batch_size: int, per_host_cap: int
) -> list[tuple[str, int]]:
    """Politeness-aware wave formation (shared by oracle and pipeline)."""
    if per_host_cap <= 0:
        wave = pending[:batch_size]
        del pending[:batch_size]
        return wave
    wave: list[tuple[str, int]] = []
    deferred: list[tuple[str, int]] = []
    host_count: dict[str, int] = {}
    while pending and len(wave) < batch_size:
        page = pending.pop(0)
        h = hostname_of(page[0])
        if host_count.get(h, 0) >= per_host_cap:
            deferred.append(page)
            continue
        host_count[h] = host_count.get(h, 0) + 1
        wave.append(page)
    pending[:0] = deferred
    if not wave and pending:  # progress guarantee on full deferral
        wave.append(pending.pop(0))
    return wave


def run_reference_crawl(
    seed_url: str, opts: CrawlOptions, fetcher: Fetcher
) -> CrawlTrace:
    """The transcribed BFS (crawlCoordinator.ts:26-119)."""
    tr = CrawlTrace()
    seed = canonicalize_url(seed_url)
    pending: list[tuple[str, int]] = [(seed, 0)]

    while pending and tr.completed + tr.failed < opts.limit:
        batch_size = min(opts.wave_size, opts.limit - tr.completed - tr.failed, len(pending))
        wave = form_wave(pending, batch_size, opts.per_host_cap)
        tr.rounds += 1

        results: list[tuple[list[str], int] | None] = []
        for url, depth in wave:
            if url in tr.visited:  # lazy dedup at pop (:42-43)
                results.append(None)
                continue
            tr.visited.add(url)   # (:44)
            res = fetcher.fetch(url)
            tr.order.append((url, depth, res.ok))
            if not res.ok:        # (:81-84)
                tr.failed += 1
                results.append(None)
                continue
            tr.completed += 1
            if res.row_idx is not None:
                tr.fetched_rows.append(res.row_idx)
            if not opts.scrape_paths or matches_paths(
                url, list(opts.scrape_paths), []
            ):
                tr.emitted.append(url)  # M12 content gate (Base.ts:517-554)
            results.append((res.links, depth))

        for r in results:          # (:103-117)
            if r is None:
                continue
            links, depth = r
            if depth >= opts.max_depth:
                continue
            for link in links:
                if link in tr.visited or tr.completed + tr.failed + len(pending) >= opts.limit:
                    continue
                if not matches_strategy(link, seed, opts.strategy):
                    continue
                if not matches_paths(link, list(opts.include_paths), list(opts.exclude_paths)):
                    continue
                if robots_disallowed(link, opts.robots):
                    continue
                pending.append((link, depth + 1))
    return tr


class SyntheticFetcher:
    """Corpus-backed fetch for the oracle (single-threaded, no Ray).

    Identical semantics to the pipeline's fetch stage (stages/fetch.py):
    lookup by canonical fragment-stripped URL; links = link-span media_refs
    resolved against the page URL, document (offset) order, duplicates kept.
    """

    def __init__(self, corpus_index):
        self.idx = corpus_index

    def fetch(self, url: str) -> FetchResult:
        row = self.idx.lookup(url)
        if row is None:
            return FetchResult(ok=False, status_code=404, links=[])
        spans = self.idx.table.column("spans")[row].as_py()
        links = [
            canonicalize_url(s["media_ref"], base=url)
            for s in spans
            if s["kind"] == "link"
        ]
        nbytes = sum(len(s["text"]) + len(s["media_ref"]) for s in spans)
        return FetchResult(ok=True, status_code=200, links=links, row_idx=row, nbytes=nbytes)
