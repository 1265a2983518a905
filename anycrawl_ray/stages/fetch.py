"""Fetch+parse stage: frontier batch -> fetched spans + resolved links.

The Ray equivalent of the reference's per-engine crawler worker
(reference packages/scrape/src/engines/Cheerio.ts:32-58 fetch;
core/DataExtractor.ts:268-302,417-432 parse/assemble;
DataExtractor.ts:490-494 links format via extractUrlsFromCheerio).

Shape: a callable CLASS for ``map_batches(FetchParseActor, concurrency=N,
batch_format="pyarrow", zero_copy_batch=True)`` — the corpus index (this
sandbox's synthetic "web"; in production the HTTP/browser client pool, T1-T3)
is built ONCE per actor in ``__init__`` from a ``ray.put`` broadcast ref, never
per batch. The same pure function ``fetch_parse_batch`` also backs the
persistent-actor-pool executor used for tiny conformance waves (wave=5), where
per-round Dataset task launch would dominate (SURVEY.md §7.3).

Status normalization (ok / status_code) mirrors engines/Base.ts:130-184.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..corpus import CorpusIndex
from ..schema import FETCH_SCHEMA, SPAN_STRUCT
from ..urlnorm import canonicalize_url, hostname_of

_EMPTY_SPANS_ROW = pa.Table.from_pydict({"spans": pa.array([[]], pa.list_(SPAN_STRUCT))})


def fetch_parse_batch(batch: pa.Table, idx: CorpusIndex) -> pa.Table:
    """(url, depth, discovery_seq) -> FETCH_SCHEMA rows, input order preserved.

    Vectorized: page spans are gathered from the broadcast corpus with one
    Arrow ``take``; byte accounting and link location run on the flattened
    span arrays. Only URL lookup + link canonicalization are per-item Python
    (string resolution is inherently scalar).
    """
    urls = batch.column("url").to_pylist()
    n = len(urls)
    rows = np.full(n, -1, dtype=np.int64)
    for i, u in enumerate(urls):
        r = idx.lookup(u)
        if r is not None:
            rows[i] = r

    # spans: corpus.take with a sentinel empty row for misses
    spans_source = pa.concat_tables(
        [pa.table({"spans": idx.table.column("spans")}), _EMPTY_SPANS_ROW]
    ).column("spans").combine_chunks()
    take_idx = np.where(rows >= 0, rows, idx.table.num_rows)
    spans = spans_source.take(pa.array(take_idx, pa.int64()))
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()

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
    links_col: list[list[str]] = [[] for _ in range(n)]
    for r, ref in zip(span_row[link_mask], np.asarray(flat.field("media_ref"))[link_mask]):
        links_col[r].append(canonicalize_url(ref, base=urls[r]))

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
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array([hostname_of(u) for u in urls], pa.string()),
            depth,
            seq,
            pa.array(status, pa.int32()),
            pa.array(ok),
            spans,
            pa.array(links_col, pa.list_(pa.string())),
            pa.array(nbytes, pa.int64()),
        ],
        schema=FETCH_SCHEMA,
    )


class FetchParseActor:
    """map_batches actor: corpus index built once per actor (T1-analog)."""

    def __init__(self, corpus_ref):
        table = corpus_ref if isinstance(corpus_ref, pa.Table) else ray.get(corpus_ref)
        self.idx = CorpusIndex(table)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_parse_batch(batch, self.idx)


@ray.remote
class FetchWorker:
    """Persistent fetch worker for the low-latency pool executor.

    The reference keeps crawler processes alive for the whole job
    (reference packages/scrape/src/core/EngineConfigurator.ts:32-36
    ``isFinishedFunction: () => false``); Ray Data recreates map_batches actors
    per execution, which for a wave of 5 URLs costs more than the fetch. The
    pool executor keeps these actors alive for the whole crawl and feeds them
    Arrow chunks directly; identical batch code, identical results.
    """

    def __init__(self, corpus_ref):
        self.idx = CorpusIndex(
            corpus_ref if isinstance(corpus_ref, pa.Table) else ray.get(corpus_ref)
        )

    def fetch(self, batch: pa.Table) -> pa.Table:
        return fetch_parse_batch(batch, self.idx)
