"""Fixed Arrow schemas for every logical table (SURVEY.md §1.4).

The reference validates dynamic JSON with zod at the API boundary
(reference packages/libs/src/types/BaseSchema.ts:36-190); the rebuild replaces
that with fixed pyarrow schemas — one Dataset per logical table, blocks are
Arrow tables end-to-end (zero-copy through the object store).
"""

from __future__ import annotations

import pyarrow as pa

# Interleaved text+media document (BASELINE.json input_hint).
# One row per fetched page; span order carries the interleaving
# (reference packages/scrape/src/core/DataExtractor.ts:417-432 result doc).
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "media" | "link" | "ocr"
        pa.field("text", pa.string()),       # markdown text / anchor text / ""
        pa.field("media_ref", pa.string()),  # media ref or href URL or ""
        pa.field("offset", pa.int32()),      # dense 0-based position in the doc
    ]
)
DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),      # canonical page URL
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Frontier rows (replaces Crawlee RequestQueueV2 + BullMQ;
# reference packages/scrape/src/managers/EngineQueue.ts:137-150).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seed_order", pa.int32()),
        pa.field("discovery_seq", pa.int64()),  # FIFO ordering authority
        pa.field("job_id", pa.string()),
        pa.field("round", pa.int32()),
    ]
)

# Fetch+parse output: one row per attempted page.
FETCH_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("status_code", pa.int32()),    # reference engines/Base.ts:130-184
        pa.field("ok", pa.bool_()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("links", pa.list_(pa.string())),  # resolved, document order
        pa.field("bytes", pa.int64()),             # bandwidth accounting (A4)
    ]
)

# Per-partition crawl counters — mirrors the Redis hash crawl:{jobId}
# (reference packages/scrape/src/managers/Progress.ts:8-27).
COUNTERS_SCHEMA = pa.schema(
    [
        pa.field("job_id", pa.string()),
        pa.field("round", pa.int32()),
        pa.field("partition_id", pa.int32()),
        pa.field("enqueued", pa.int64()),
        pa.field("done", pa.int64()),
        pa.field("succeeded", pa.int64()),
        pa.field("failed", pa.int64()),
    ]
)

# Seen-set shard checkpoint dump.
SEEN_SCHEMA = pa.schema(
    [
        pa.field("shard", pa.int32()),
        pa.field("url_hash", pa.uint64()),
        pa.field("url", pa.string()),
    ]
)

# Synthetic robots fixtures (FIXTURES.md §C).
ROBOTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("disallow", pa.list_(pa.string())),
        pa.field("crawl_delay_ms", pa.int32()),
        pa.field("sitemaps", pa.list_(pa.string())),
    ]
)
