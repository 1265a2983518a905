"""Sitemap source (S9/MapService source 1) — robots-declared and
common-location sitemap discovery + XML parsing.

Reference semantics (packages/scrape/src/services/MapService.ts:167-199,
via Crawlee's RobotsTxtFile/Sitemap utilities):

- robots.txt ``Sitemap:`` lines are the primary source
  (RobotsTxtFile.getSitemaps)
- each sitemap is either a ``<urlset>`` of page ``<url><loc>`` entries or a
  ``<sitemapindex>`` of child ``<sitemap><loc>`` entries, recursed
  (parseUrlsFromSitemaps)
- when robots.txt declares none, common locations are probed
  (Sitemap.tryCommonNames: /sitemap.xml)

No network in this sandbox: fetching is a caller-provided
``fetch_fn(url) -> str | None`` (tests use fixture dicts; production wires
the HTTP client). Parsing is namespace-tolerant stdlib ElementTree.

Ray shape: discovery is per-HOST (one small fetch chain per host), so the
distributed form is a ``map_batches`` over a host table with fetch_fn state
per actor; the resulting URL rows feed functions/mapmerge.prepare_source
exactly like the reference feeds MapService's merge.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

COMMON_SITEMAP_NAMES = ("/sitemap.xml",)  # Sitemap.tryCommonNames


def parse_robots_sitemaps(robots_txt: str) -> list[str]:
    """``Sitemap:`` directives from robots.txt, order-preserved
    (case-insensitive key, duplicates dropped)."""
    out: list[str] = []
    for line in robots_txt.splitlines():
        line = line.strip()
        if line.lower().startswith("sitemap:"):
            url = line.split(":", 1)[1].strip()
            if url and url not in out:
                out.append(url)
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_xml(xml: str) -> tuple[list[str], list[str]]:
    """One sitemap document -> (page urls, child sitemap urls).

    ``<urlset>`` children fill page urls; ``<sitemapindex>`` children fill
    child sitemaps (recursed by the caller). Unparsable input -> empty."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return [], []
    pages: list[str] = []
    children: list[str] = []
    root_kind = _local(root.tag)
    for entry in root:
        kind = _local(entry.tag)
        loc = next((c.text.strip() for c in entry if _local(c.tag) == "loc" and c.text), None)
        if not loc:
            continue
        if root_kind == "sitemapindex" or kind == "sitemap":
            children.append(loc)
        else:
            pages.append(loc)
    return pages, children


def collect_sitemap_urls(
    fetch_fn, base_url: str, robots_txt: str | None = None, max_docs: int = 50
) -> list[str]:
    """MapService.getSitemapUrls: robots-declared sitemaps first, common
    locations as fallback; index files recursed breadth-first with a
    document budget (runaway-index guard). Order: first-seen, deduplicated.
    """
    base = base_url.rstrip("/")
    queue = parse_robots_sitemaps(robots_txt or "")
    if not queue:
        queue = [base + name for name in COMMON_SITEMAP_NAMES]
    seen_docs: set[str] = set()
    urls: list[str] = []
    seen_urls: set[str] = set()
    while queue and len(seen_docs) < max_docs:
        sm = queue.pop(0)
        if sm in seen_docs:
            continue
        seen_docs.add(sm)
        body = fetch_fn(sm)
        if not body:
            continue
        pages, children = parse_sitemap_xml(body)
        for u in pages:
            if u not in seen_urls:
                seen_urls.add(u)
                urls.append(u)
        queue.extend(c for c in children if c not in seen_docs)
    return urls
