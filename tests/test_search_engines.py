"""Multi-engine SERP registry tests (types.ts / Searxng.ts /
SearchService.ts engine-selection semantics)."""

import json

import pytest

from anycrawl_ray.functions.search_engines import (
    GoogleSearchEngine,
    SearchEngineRegistry,
    SearxngSearchEngine,
)

SEARX = SearxngSearchEngine("http://sx.test/")


def test_searxng_url_builder():
    t = SEARX.build_task(
        {"query": "a b", "page": 2, "lang": "en", "sources": "news",
         "timeRange": "week", "safe_search": 1}
    )
    assert t["url"] == (
        "http://sx.test/search?q=a+b&format=json&pageno=2&language=en"
        "&categories=news&time_range=week&safesearch=1"
    )
    assert t["require_proxy"] is False
    assert t["headers"] == {"Accept": "application/json"}


def test_searxng_parse_web_news_images():
    payload = json.dumps(
        {
            "results": [
                {"url": "http://a", "title": "A", "content": "ca", "engine": "brave"},
                {"title": "no-url suggestion"},
                {
                    "url": "http://i", "title": "I", "category": "images",
                    "img_src": "http://i/full.jpg", "resolution": "1000×1500",
                    "positions": [3, 9], "thumbnail_src": "http://i/t.jpg",
                    "img_format": "jpeg", "filesize": "245.76 KB",
                },
                {
                    "url": "http://n", "title": "N", "category": "news",
                    "snippet": "sn", "publishedDate": "2024-01-01",
                    "thumbnail": "http://n/t.jpg",
                },
            ]
        }
    )
    out = SEARX.parse(payload)
    assert len(out) == 3  # no-url skipped
    web, img, news = out
    assert web == {
        "title": "A", "url": "http://a", "description": "ca",
        "source": "SearXNG (brave)", "category": "web",
    }
    assert img["category"] == "images"
    assert (img["imageWidth"], img["imageHeight"]) == (1000, 1500)
    assert img["position"] == 3 and img["imageUrl"] == "http://i/full.jpg"
    assert news["category"] == "news" and news["date"] == "2024-01-01"
    assert news["snippet"] == "sn" and news["source"] == "SearXNG (unknown)"
    assert SEARX.parse("not json") == []


def test_google_task_and_parse():
    g = GoogleSearchEngine()
    t = g.build_task({"query": "x", "page": 3, "lang": "en"})
    assert "start=20" in t["url"] and t["require_proxy"] is True
    html = ('<div jscontroller="SC7lYd"><a href="http://r/1"><h3>T</h3></a>'
            '<div data-sncf="1">d</div></div>')
    assert g.parse(html)[0]["url"] == "http://r/1"


def test_registry_resolution():
    reg = SearchEngineRegistry(searxng_url="http://sx.test")
    assert reg.resolve_engine_name(None) == "google"
    assert reg.resolve_engine_name("default") == "google"
    assert reg.resolve_engine_name("SEARXNG") == "searxng"
    assert reg.resolve_engine_name("bogus") == "google"  # invalid -> default
    assert reg.get_engine("searxng") is reg.get_engine("searxng")  # cached

    # searxng unavailable without URL -> falls back to default
    reg2 = SearchEngineRegistry()
    assert reg2.resolve_engine_name("searxng") == "google"
    with pytest.raises(ValueError, match="not available"):
        reg2._create("searxng")

    # single enabled engine forces itself regardless of request
    reg3 = SearchEngineRegistry(searxng_url="http://sx.test",
                                enabled_engines=("searxng",))
    assert reg3.resolve_engine_name("google") == "searxng"
    # multiple enabled: requested-if-listed else default
    reg4 = SearchEngineRegistry(searxng_url="http://sx.test",
                                enabled_engines=("google", "searxng"))
    assert reg4.resolve_engine_name("searxng") == "searxng"


def test_effective_pages_direct_limit():
    class Direct:
        supports_direct_limit = True

    g = GoogleSearchEngine()
    assert SearchEngineRegistry.effective_pages(g, {"limit": 25}) == 3
    assert SearchEngineRegistry.effective_pages(Direct(), {"limit": 25}) == 1
    assert SearchEngineRegistry.effective_pages(g, {"pages": 2}) == 2
    assert SearchEngineRegistry.effective_pages(g, {"limit": 1000}) == 20  # cap


def test_default_resolution_falls_back_when_default_unavailable():
    """Reference parity (SearchService.ts:57-75): engine-less requests go
    through getDefaultEngine, which falls back to the first AVAILABLE
    engine when the configured default is unconfigured."""
    from anycrawl_ray.functions.search_engines import SearchEngineRegistry

    # default searxng but no URL -> google (always available)
    reg = SearchEngineRegistry(default_engine="searxng", searxng_url=None)
    assert reg.resolve_engine_name(None) == "google"
    assert reg.resolve_engine_name("default") == "google"
    assert reg.resolve_engine_name("searxng") == "google"  # invalid request
    # default searxng WITH url -> stays searxng
    reg2 = SearchEngineRegistry(default_engine="searxng",
                                searxng_url="http://sx.test")
    assert reg2.resolve_engine_name(None) == "searxng"
    # enabled list restricted to searxng: available list honors it
    reg3 = SearchEngineRegistry(default_engine="searxng", searxng_url=None,
                                enabled_engines=("searxng",))
    assert reg3.get_available_engines() == []  # searxng invalid, google not enabled
    assert reg3.resolve_engine_name(None) == "google"  # terminal fallback


def test_ac_engine_url_and_parse():
    """ACEngine.ts parity: direct-limit URL building (limit preferred,
    page*10 inferred), category dispatch, no-url skip."""
    import json

    from anycrawl_ray.functions.search_engines import (
        ACSearchEngine, SearchEngineRegistry)

    e = ACSearchEngine("http://ac.test/")
    t = e.build_task({"query": "ray data", "limit": 37, "offset": 20,
                      "lang": "en", "safe_search": 1})
    assert t["url"].startswith("http://ac.test/search?")
    assert "q=ray+data" in t["url"] and "limit=37" in t["url"]
    assert "start=20" in t["url"] and "safe_search=1" in t["url"]
    assert t["require_proxy"] is False
    # page -> inferred limit
    t2 = e.build_task({"query": "x", "page": 3})
    assert "limit=30" in t2["url"]

    payload = json.dumps({"results": [
        {"title": "W", "url": "http://a.test/1", "snippet": "s"},
        {"category": "images", "url": "http://a.test/2", "imageUrl": "http://i",
         "imageWidth": 10, "imageHeight": 20, "position": 1},
        {"category": "news", "url": "http://a.test/3", "date": "2026-01-01"},
        {"title": "no url skipped"},
    ]})
    rs = e.parse(payload)
    assert [r["category"] for r in rs] == ["web", "images", "news"]
    assert rs[0]["description"] == "s" and rs[0]["source"] == "AC-Engine"
    assert rs[1]["imageWidth"] == 10 and rs[2]["date"] == "2026-01-01"
    assert e.parse("not json") == []

    # registry integration: direct-limit engines take one request
    reg = SearchEngineRegistry(default_engine="ac-engine",
                               ac_engine_url="http://ac.test")
    eng = reg.get_engine(None)
    assert eng.name == "ac-engine"
    assert reg.effective_pages(eng, {"limit": 200}) == 1
    # unavailable without URL
    reg2 = SearchEngineRegistry(default_engine="ac-engine")
    assert reg2.resolve_engine_name(None) == "google"


def test_google_locale_resolution():
    """Mirror of Google.ts:77-146 semantics over the config tables."""
    g = GoogleSearchEngine()
    # explicit lang+country picks the locale's region and its ccTLD
    t = g.build_task({"query": "x", "lang": "de", "country": "AT"})
    assert "www.google.at/search" in t["url"]
    assert "hl=de-AT" in t["url"] and "lr=lang_de" in t["url"]
    assert "cr=countryAT" in t["url"]
    # skip-listed country falls back to the first non-skipped region for
    # the lang (ms -> MY is skip-listed; no other ms-* region exists -> US)
    t = g.build_task({"query": "x", "lang": "ms", "country": "MY"})
    assert "countryMY" not in t["url"]
    # lang only: first non-skipped region for that lang
    t = g.build_task({"query": "x", "lang": "fr"})
    assert "lr=lang_fr" in t["url"] and "cr=country" in t["url"]
    # zh maps to lang_zh-CN (underscore split yields code zh-CN)
    t = g.build_task({"query": "x", "lang": "zh", "country": "CN"})
    assert "lr=lang_zh-CN" in t["url"]
    # CN's "supported domain" is intentionally www.google.com.hk in the table
    assert "www.google.com.hk/search" in t["url"]
    # no lang/country: US default, www.google.com
    t = g.build_task({"query": "x"})
    assert "www.google.com/search" in t["url"] and "hl=en-US" in t["url"]


def test_google_limit_timerange_safe():
    g = GoogleSearchEngine()
    # per-page limit clamps to [1,100]; start = offset + (page-1)*per_page
    t = g.build_task({"query": "x", "limit": 250, "page": 2, "offset": 5})
    assert "num=100" in t["url"] and "start=105" in t["url"]
    t = g.build_task({"query": "x", "timeRange": "week", "safe_search": 2})
    assert "tbs=qdr%3Aw" in t["url"] and "safe=high" in t["url"]
    # unknown safe_search value degrades to medium (Google.ts:142-144)
    t = g.build_task({"query": "x", "safe_search": 9})
    assert "safe=medium" in t["url"]
