"""MapService URL-source merge (J4/D3/D4/A5/O3).

Semantics transcribed from reference packages/scrape/src/services/MapService.ts:
- sources applied in fixed priority order sitemap(0) -> search(1) ->
  page_links(2) -> index(3) (:56-149): first writer wins URL presence;
  later sources only backfill missing title/description (:95-101,:112-118)
- page-link URLs are fragment-stripped + http(s)-only + per-source deduped
  (:266-273)
- filterByDomain (:301-320): exact hostname, or base-domain match when
  include_subdomains (two-label heuristic, :325-329)
- final slice to limit (:153, default 5000)

Ray mapping: union of per-source datasets with (source_priority, insert_idx)
-> groupby(url) merge via vectorized first-non-null -> filter -> sort ->
limit. Implemented over Arrow; the groupby-merge is a polars group_by (fast
C) suitable for use inside map_groups at scale.
"""

from __future__ import annotations

import pyarrow as pa
import polars as pl

from ..urlnorm import base_domain_of, hostname_of, strip_fragment

SOURCE_PRIORITY = {"sitemap": 0, "search": 1, "page_links": 2, "index": 3}


def prepare_source(
    urls: list[str],
    source: str,
    titles: list[str | None] | None = None,
    descriptions: list[str | None] | None = None,
) -> pa.Table:
    """Per-source normalization: fragment strip, http-only, in-source dedup
    (MapService.ts:266-273), 200/500-char caps (:279-286)."""
    titles = titles or [None] * len(urls)
    descriptions = descriptions or [None] * len(urls)
    seen: set[str] = set()
    out_u, out_t, out_d, out_i = [], [], [], []
    for i, (u, t, d) in enumerate(zip(urls, titles, descriptions)):
        if not u.startswith("http"):
            continue
        u2 = strip_fragment(u) or u
        if u2 in seen:
            continue
        seen.add(u2)
        out_u.append(u2)
        out_t.append(t[:200] if t else None)
        out_d.append(d[:500] if d else None)
        out_i.append(i)
    n = len(out_u)
    return pa.table(
        {
            "url": pa.array(out_u, pa.string()),
            "title": pa.array(out_t, pa.string()),
            "description": pa.array(out_d, pa.string()),
            "source": pa.array([source] * n, pa.string()),
            "priority": pa.array([SOURCE_PRIORITY[source]] * n, pa.int32()),
            "insert_idx": pa.array(out_i, pa.int64()),
        }
    )


def merge_url_sources(sources: list[pa.Table]) -> pa.Table:
    """First-writer-wins merge with field backfill, preserving reference
    insertion order (priority, then within-source order)."""
    if not sources:
        return pa.table({"url": pa.array([], pa.string())})
    all_t = pa.concat_tables(sources)
    df = pl.from_arrow(all_t).sort(["priority", "insert_idx"])
    merged = df.group_by("url", maintain_order=False).agg(
        pl.col("title").drop_nulls().first().alias("title"),
        pl.col("description").drop_nulls().first().alias("description"),
        pl.col("source").first().alias("source"),       # first writer
        pl.col("priority").first().alias("priority"),
        pl.col("insert_idx").first().alias("insert_idx"),
    )
    merged = merged.sort(["priority", "insert_idx"])
    return merged.to_arrow()


def filter_by_domain(table: pa.Table, base_url: str, include_subdomains: bool) -> pa.Table:
    """MapService.ts:301-320."""
    base_host = hostname_of(base_url)
    base_dom = base_domain_of(base_url)
    urls = table.column("url").to_pylist()
    if include_subdomains:
        mask = [base_domain_of(u) == base_dom and hostname_of(u) != "" for u in urls]
    else:
        mask = [hostname_of(u) == base_host and hostname_of(u) != "" for u in urls]
    return table.filter(pa.array(mask))


def source_stats(sources: list[pa.Table]) -> dict[str, int]:
    """Per-source URL counts (A5, MapService.ts:58-156 log summary)."""
    return {t.column("source")[0].as_py(): t.num_rows for t in sources if t.num_rows}


def map_urls(
    sources: list[pa.Table], base_url: str,
    include_subdomains: bool = False, limit: int = 5000,
) -> pa.Table:
    merged = merge_url_sources(sources)
    filtered = filter_by_domain(merged, base_url, include_subdomains)
    return filtered.slice(0, limit).select(["url", "title", "description", "source"])
