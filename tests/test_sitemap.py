"""Sitemap source (S9 / MapService source 1): robots Sitemap: directives,
urlset/sitemapindex XML, recursion, common-name fallback, budgets."""

from anycrawl_ray.functions.sitemap import (
    collect_sitemap_urls,
    parse_robots_sitemaps,
    parse_sitemap_xml,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(*urls):
    entries = "".join(f"<url><loc>{u}</loc><lastmod>2024-01-01</lastmod></url>" for u in urls)
    return f'<?xml version="1.0"?><urlset {NS}>{entries}</urlset>'


def _index(*sitemaps):
    entries = "".join(f"<sitemap><loc>{s}</loc></sitemap>" for s in sitemaps)
    return f'<?xml version="1.0"?><sitemapindex {NS}>{entries}</sitemapindex>'


def test_parse_robots_sitemaps():
    robots = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://h.t/sitemap.xml\n"
        "sitemap: http://h.t/sitemap2.xml\n"
        "Sitemap: http://h.t/sitemap.xml\n"  # dup dropped
    )
    assert parse_robots_sitemaps(robots) == [
        "http://h.t/sitemap.xml", "http://h.t/sitemap2.xml",
    ]
    assert parse_robots_sitemaps("User-agent: *\n") == []


def test_parse_urlset_and_index():
    pages, children = parse_sitemap_xml(_urlset("http://h.t/a", "http://h.t/b"))
    assert pages == ["http://h.t/a", "http://h.t/b"] and children == []
    pages, children = parse_sitemap_xml(_index("http://h.t/s1.xml", "http://h.t/s2.xml"))
    assert pages == [] and children == ["http://h.t/s1.xml", "http://h.t/s2.xml"]
    assert parse_sitemap_xml("not xml <<<") == ([], [])
    # namespace-free documents parse too
    assert parse_sitemap_xml("<urlset><url><loc>http://x/a</loc></url></urlset>") == (
        ["http://x/a"], []
    )


def test_collect_recurses_index_from_robots():
    docs = {
        "http://h.t/smi.xml": _index("http://h.t/s1.xml", "http://h.t/s2.xml"),
        "http://h.t/s1.xml": _urlset("http://h.t/a", "http://h.t/b"),
        "http://h.t/s2.xml": _urlset("http://h.t/b", "http://h.t/c"),
    }
    robots = "Sitemap: http://h.t/smi.xml\n"
    urls = collect_sitemap_urls(docs.get, "http://h.t/", robots_txt=robots)
    assert urls == ["http://h.t/a", "http://h.t/b", "http://h.t/c"]  # deduped


def test_collect_common_name_fallback():
    docs = {"http://h.t/sitemap.xml": _urlset("http://h.t/x")}
    assert collect_sitemap_urls(docs.get, "http://h.t", robots_txt=None) == ["http://h.t/x"]
    assert collect_sitemap_urls(docs.get, "http://other.t") == []


def test_collect_budget_guards_runaway_index():
    # self-referencing index: document budget terminates the walk
    docs = {
        "http://h.t/sitemap.xml": _index("http://h.t/sitemap.xml", "http://h.t/u.xml"),
        "http://h.t/u.xml": _urlset("http://h.t/p"),
    }
    urls = collect_sitemap_urls(docs.get, "http://h.t", max_docs=10)
    assert urls == ["http://h.t/p"]


def test_sitemap_feeds_map_merge():
    """End to end with J4: collected sitemap urls become a mapmerge source."""
    from anycrawl_ray.functions.mapmerge import map_urls, prepare_source

    docs = {"http://h.t/sitemap.xml": _urlset("http://h.t/a", "http://h.t/b")}
    urls = collect_sitemap_urls(docs.get, "http://h.t")
    merged = map_urls(
        [prepare_source(urls, "sitemap"),
         prepare_source(["http://h.t/b"], "search", titles=["tb"])],
        "http://h.t/", limit=10,
    )
    got = {r["url"]: r["source"] for r in merged.to_pylist()}
    assert got == {"http://h.t/a": "sitemap", "http://h.t/b": "sitemap"}
