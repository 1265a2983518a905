"""Deterministic synthetic crawl corpus of interleaved-span documents.

FIXTURES.md §B: a host/page link graph rendered to span docs, synthesized from
the driver's ``documents.parquet`` text (seeded — no external data, no network).
The corpus plays the role of "the web" for the synthetic fetcher: the sandbox
has no network, so S1/S2 fetch engines resolve URLs against this table.

Coverage knobs baked into the graph (each exercises a crawl-core behaviour):
- Zipf-ish page split with one hot host   -> per-host budget caps / salt paths
- intra-host relative + absolute links    -> canonicalizer (urlnorm.py)
- cross-host links                        -> strategy filters (M10)
- repeated links + fragment variants      -> seen-set / lazy-dup semantics (D1)
- malformed ``http:/`` links              -> scheme repair (HTMLTransformer.ts:514-532)
- links to nonexistent pages              -> failed-fetch counters (A1)
- beyond-depth chains                     -> max_depth guard (M13)
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import DOCS_SCHEMA, ROBOTS_SCHEMA
from .urlnorm import canonicalize_url, strip_fragment


@dataclass(frozen=True)
class CorpusConfig:
    n_hosts: int = 8
    n_pages: int = 200          # total pages across hosts
    seed: int = 42
    mean_links: int = 6         # link spans per page
    mean_text: int = 3          # text spans per page
    media_every: int = 3        # a media span after every k-th text span
    dead_link_rate: float = 0.05
    hot_host_share: float = 0.4  # fraction of pages on host 0 (skew)
    span_chars: int = 80         # text chars per span (bench uses larger pages)

    def cache_key(self, sf_dir: str) -> str:
        raw = f"{sf_dir}|{self.n_hosts}|{self.n_pages}|{self.seed}|{self.mean_links}|{self.mean_text}|{self.media_every}|{self.dead_link_rate}|{self.hot_host_share}|{self.span_chars}"
        return hashlib.sha256(raw.encode()).hexdigest()[:16]


def host_name(i: int) -> str:
    return f"h{i:02d}.example.test"


def page_url(host: str, pid: int) -> str:
    return f"http://{host}/p/{pid:04d}"


def _page_counts(cfg: CorpusConfig) -> list[int]:
    """Pages per host: hot host gets ``hot_host_share``, rest Zipf-decayed."""
    hot = max(1, int(cfg.n_pages * cfg.hot_host_share))
    rest = cfg.n_pages - hot
    weights = np.array([1.0 / (i + 1) for i in range(cfg.n_hosts - 1)])
    weights /= weights.sum() if len(weights) else 1.0
    counts = [hot] + [max(1, int(rest * w)) for w in weights]
    # pad/trim to exactly n_pages
    while sum(counts) < cfg.n_pages:
        counts[1 % len(counts)] += 1
    while sum(counts) > cfg.n_pages and counts[-1] > 1:
        counts[-1] -= 1
    return counts[: cfg.n_hosts]


def generate_corpus(sf_dir: str, cfg: CorpusConfig = CorpusConfig()) -> pa.Table:
    """Build the interleaved-span docs table (DOCS_SCHEMA), deterministically."""
    doc_texts = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .column("text")
        .to_pylist()
    )
    n_src = len(doc_texts)
    counts = _page_counts(cfg)
    pages: list[tuple[str, int, str]] = []  # (host, pid, url)
    for hi, cnt in enumerate(counts):
        h = host_name(hi)
        for pid in range(cnt):
            pages.append((h, pid, page_url(h, pid)))

    host_pages = {host_name(hi): cnt for hi, cnt in enumerate(counts)}
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []

    for gi, (host, pid, url) in enumerate(pages):
        rng = np.random.RandomState(cfg.seed * 1_000_003 + gi)
        spans: list[dict] = []

        def add(kind: str, text: str = "", media_ref: str = "") -> None:
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
            )

        n_text = 1 + rng.randint(0, cfg.mean_text * 2)
        for k in range(n_text):
            src = doc_texts[(gi * 7 + k * 13) % n_src]
            body = src
            while len(body) < cfg.span_chars:  # tile source text to span size
                body = body + " " + src
            lo = rng.randint(0, max(1, len(body) - cfg.span_chars))
            add("text", f"## {host}/p{pid} s{k}\n" + body[lo : lo + cfg.span_chars])
            if (k + 1) % cfg.media_every == 0:
                add("media", "", f"img://{host}/p{pid}/{k}")
                if rng.rand() < 0.3:
                    add("ocr", f"[OCR] caption {host} {pid} {k}", "")

        n_links = 1 + rng.randint(0, cfg.mean_links * 2)
        my_count = host_pages[host]
        prev_targets: list[str] = []
        for k in range(n_links):
            r = rng.rand()
            if r < 0.55 or my_count < 2:
                # intra-host; mix of relative and absolute forms
                tgt_pid = int(rng.randint(0, my_count))
                if rng.rand() < cfg.dead_link_rate:
                    tgt_pid = my_count + int(rng.randint(0, 50))  # dead
                form = rng.randint(0, 4)
                if form == 0:
                    href = f"/p/{tgt_pid:04d}"
                elif form == 1:
                    href = page_url(host, tgt_pid)
                elif form == 2:
                    href = page_url(host, tgt_pid) + f"#sec{k}"
                else:
                    href = "http:/" + host + f"/p/{tgt_pid:04d}"  # malformed
            elif r < 0.85:
                # cross-host
                oh = host_name(int(rng.randint(0, cfg.n_hosts)))
                tgt_pid = int(rng.randint(0, host_pages[oh]))
                href = page_url(oh, tgt_pid)
            elif prev_targets:
                href = prev_targets[int(rng.randint(0, len(prev_targets)))]  # duplicate
            else:
                href = f"/p/{int(rng.randint(0, my_count)):04d}"
            prev_targets.append(href)
            add("link", f"link {k} from {host}/{pid}", href)

        doc_ids.append(url)
        spans_col.append(spans)

    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)


def generate_robots(cfg: CorpusConfig = CorpusConfig()) -> pa.Table:
    """Synthetic per-host robots rules (FIXTURES.md §C).

    Deterministic: every 3rd host disallows a path prefix; crawl delays vary.
    Plays the role of RobotsTxtFile in the reference map path
    (reference packages/scrape/src/services/MapService.ts:172-201).
    """
    hosts, disallow, delay, sitemaps = [], [], [], []
    for hi in range(cfg.n_hosts):
        h = host_name(hi)
        hosts.append(h)
        disallow.append(["/p/000"] if hi % 3 == 2 else [])
        delay.append(int(100 * (hi % 4)))
        sitemaps.append([f"http://{h}/sitemap.xml"])
    return pa.Table.from_pydict(
        {"host": hosts, "disallow": disallow, "crawl_delay_ms": delay, "sitemaps": sitemaps},
        schema=ROBOTS_SCHEMA,
    )


def corpus_path(sf_dir: str, cfg: CorpusConfig, cache_dir: str = "/tmp/anycrawl_corpus") -> str:
    """Generate-once parquet cache (bench runs at two CPU counts reuse it)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"corpus_{cfg.cache_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_corpus(sf_dir, cfg), tmp)
        os.replace(tmp, path)
    return path


class CorpusIndex:
    """url -> row lookup for the synthetic fetcher.

    Built once per fetch actor in ``__init__`` from a broadcast (``ray.put``)
    corpus table — zero-copy Arrow; the dict holds row indices only.
    Lookup identity: canonical URL without fragment (a fragment navigates
    within the same resource).
    """

    def __init__(self, table: pa.Table):
        self.table = table
        # Zero-copy init (runs once per fetch actor — N actors × a corpus copy
        # would saturate memory bandwidth): sorted-array lookup instead of a
        # Python dict, and the spans column used as-is (single parquet/plasma
        # chunk -> combine_chunks is a no-op).
        ids = np.asarray(table.column("doc_id"))
        self._order = np.argsort(ids).astype(np.int64)
        self._sorted_ids = ids[self._order]
        # Keep the spans column AS-IS (chunked, plasma-backed): combining
        # chunks here would copy the whole corpus into every actor's private
        # memory — N actors × full-corpus memcpy saturates memory bandwidth.
        self.spans_col = table.column("spans")
        self._span_struct = (
            self.spans_col.chunk(0).values.slice(0, 0)
            if isinstance(self.spans_col, pa.ChunkedArray) and self.spans_col.num_chunks
            else pa.array([], self.spans_col.type.value_type)
        )
        # chunk-boundary table for take_spans (row id -> (chunk, local) map)
        if isinstance(self.spans_col, pa.ChunkedArray):
            self._chunk_starts = np.concatenate(
                [[0], np.cumsum([len(c) for c in self.spans_col.chunks])]
            ).astype(np.int64)
        else:
            self._chunk_starts = np.array([0, len(self.spans_col)], np.int64)

    def take_spans(self, row_ids: np.ndarray) -> pa.ListArray:
        """Gather span lists for global row ids, input order — O(batch).

        NEVER ``ChunkedArray.take`` on a multi-chunk column: pyarrow
        resolves that by concatenating chunks internally, which for this
        list<struct<..strings..>> column measured ~1800× slower than a
        single-chunk gather (1.8 s vs 1 ms for 512 rows on the 600k-page
        corpus — the 10× headroom run exposed it). Instead: map row ids to
        (chunk, local) with one searchsorted, gather within each touched
        chunk, then restore input order with one take on the batch-sized
        result."""
        col = self.spans_col
        if len(row_ids) == 0:  # all-miss chunk (e.g. a wave of dead links)
            return pa.ListArray.from_arrays(
                pa.array([0], pa.int32()), self._span_struct).slice(0, 0)
        if not isinstance(col, pa.ChunkedArray):
            return col.take(pa.array(row_ids, pa.int64()))
        if col.num_chunks <= 1:
            chunk = col.chunk(0) if col.num_chunks else None
            if chunk is None:
                return pa.ListArray.from_arrays(
                    pa.array([0] * (len(row_ids) + 1), pa.int32()),
                    self._span_struct)
            return chunk.take(pa.array(row_ids, pa.int64()))
        ci = np.searchsorted(self._chunk_starts, row_ids, side="right") - 1
        parts: list[pa.Array] = []
        order = np.empty(len(row_ids), np.int64)
        n = 0
        for c in np.unique(ci):
            sel = np.flatnonzero(ci == c)
            local = row_ids[sel] - self._chunk_starts[c]
            parts.append(col.chunk(int(c)).take(pa.array(local, pa.int64())))
            order[sel] = np.arange(n, n + len(sel))
            n += len(sel)
        gathered = pa.concat_arrays(parts)  # batch-sized, cheap
        return gathered.take(pa.array(order, pa.int64()))

    def lookup_batch(self, keys: list[str]) -> np.ndarray:
        """Row index per key, -1 for misses (vectorized searchsorted)."""
        k = np.asarray(keys, dtype=object)
        pos = np.searchsorted(self._sorted_ids, k)
        pos = np.clip(pos, 0, len(self._sorted_ids) - 1)
        hit = self._sorted_ids[pos] == k
        return np.where(hit, self._order[pos], -1)

    def lookup(self, url: str) -> int | None:
        r = int(self.lookup_batch([strip_fragment(canonicalize_url(url))])[0])
        return None if r < 0 else r
