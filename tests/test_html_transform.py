"""Golden tests for the M3 selector-driven HTML transform
(HTMLTransformer.ts:176-270 semantics; tag catalogs :21-165; URL rewrite
:363-533)."""

import pytest

from anycrawl_ray.functions.htmltransform import (
    resolve_url,
    select,
    transform_html,
)
from anycrawl_ray.functions.serp import parse_html


# -- selector engine ---------------------------------------------------------


def _sel(html, selector):
    return select(parse_html(html), selector)


def test_select_tag_class_id_attr():
    html = (
        '<div id="a" class="x y"><p class="x">1</p><span role="main">2</span>'
        "</div><p>3</p>"
    )
    assert [n.tag for n in _sel(html, "p")] == ["p", "p"]
    assert len(_sel(html, ".x")) == 2
    assert [n.tag for n in _sel(html, "#a")] == ["div"]
    assert [n.tag for n in _sel(html, "[role='main']")] == ["span"]
    assert [n.tag for n in _sel(html, "[role]")] == ["span"]
    assert [n.tag for n in _sel(html, "p.x")] == ["p"]
    assert [n.tag for n in _sel(html, "div.x.y")] == ["div"]


def test_select_combinators_and_lists():
    html = "<div><ul><li><b>1</b></li></ul></div><b>2</b>"
    assert len(_sel(html, "div b")) == 1
    assert len(_sel(html, "li > b")) == 1
    assert len(_sel(html, "div > b")) == 0
    assert len(_sel(html, "b, li")) == 3
    assert len(_sel(html, "*")) == 5


def test_select_document_order():
    html = "<i>1</i><em>2</em><i>3</i>"
    assert [n.text() for n in _sel(html, "em, i")] == ["1", "2", "3"]


# -- always-remove + comments ------------------------------------------------


def test_always_removes_script_style_noscript_and_comments():
    html = (
        "<div><script>x<1</script><style>.a{}</style><noscript>n</noscript>"
        "<!-- gone --><p>keep</p></div>"
    )
    out = transform_html(html, only_main_content=False)
    assert out == "<div><p>keep</p></div>"


# -- include_tags ------------------------------------------------------------


def test_include_tags_extracts_outer_html_in_selector_then_document_order():
    html = '<p id="a">1</p><article><p id="b">2</p></article><h1>t</h1>'
    out = transform_html(html, include_tags=["h1", "article"])
    assert out == '<h1>t</h1><article><p id="b">2</p></article>'


def test_include_tags_duplicates_nested_matches():
    # parent and child both match -> both cloned (cheerio append-clone parity)
    html = "<div><div>inner</div></div>"
    out = transform_html(html, include_tags=["div"])
    assert out == "<div><div>inner</div></div><div>inner</div>"


def test_include_tags_keeps_comments_inside_clones():
    html = "<article><!-- c --><p>x</p></article>"
    assert transform_html(html, include_tags=["article"]) == (
        "<article><!-- c --><p>x</p></article>"
    )


def test_include_tags_wins_over_main_content_filter():
    html = "<header><p>h</p></header><p>b</p>"
    assert transform_html(html, include_tags=["header"]) == "<header><p>h</p></header>"


# -- only_main_content -------------------------------------------------------


def test_main_content_removes_chrome_by_default():
    html = (
        "<header>H</header><nav>N</nav>"
        '<div class="sidebar">S</div><div id="footer">F</div>'
        "<main><p>body</p></main><aside>A</aside>"
    )
    assert transform_html(html) == "<main><p>body</p></main>"


def test_main_content_false_keeps_chrome():
    html = "<header>H</header><main>M</main>"
    assert transform_html(html, only_main_content=False) == html


def test_force_include_descendant_preserves_container():
    # .sidebar containing an <article> descendant must be kept
    html = '<div class="sidebar"><article>real content</article></div><nav>N</nav>'
    assert transform_html(html) == (
        '<div class="sidebar"><article>real content</article></div>'
    )


def test_force_include_is_descendant_only_not_self():
    # an <article> that itself matches .related is removed: cheerio .find()
    # searches descendants only (HTMLTransformer.ts:238-245)
    html = '<article class="related">x</article><p>y</p>'
    assert transform_html(html) == "<p>y</p>"


def test_widget_class_is_not_removed():
    # HTMLTransformer.ts:107-112 — .widget deliberately not in the catalog
    html = '<div class="widget-ArticleFulltext">abstract</div>'
    assert transform_html(html) == html


def test_role_main_force_include():
    html = '<div class="menu"><div role="main">m</div></div>'
    assert transform_html(html) == html


# -- exclude_tags ------------------------------------------------------------


def test_exclude_tags_removes_after_main_filter():
    html = "<main><p class='x'>1</p><p>2</p></main>"
    out = transform_html(html, exclude_tags=[".x"])
    assert out == "<main><p>2</p></main>"


def test_exclude_tags_with_main_content_off():
    html = "<header>H</header><p>b</p>"
    assert transform_html(html, only_main_content=False, exclude_tags=["header"]) == (
        "<p>b</p>"
    )


# -- URL absolutization ------------------------------------------------------


def test_resolve_url_malformed_single_slash():
    assert resolve_url("https://a.com/x", "http:/example.com/p") == "http://example.com/p"
    assert resolve_url("https://a.com/x", "https:/example.com") == "https://example.com"


def test_anchor_and_img_absolutized():
    html = '<main><a href="/p">l</a><img src="i.png"></main>'
    out = transform_html(html, base_url="https://ex.com/dir/page")
    assert '<a href="https://ex.com/p">' in out
    assert '<img src="https://ex.com/dir/i.png"' in out


def test_transform_urls_disabled():
    html = '<main><a href="/p">l</a></main>'
    out = transform_html(html, base_url="https://ex.com/", transform_urls=False)
    assert 'href="/p"' in out


def test_srcset_width_descriptors_largest_becomes_src():
    html = '<main><img srcset="a.png 400w, b.png 800w" src="c.png"></main>'
    out = transform_html(html, base_url="https://ex.com/")
    # width descriptors present -> src NOT appended as 1x; largest (800w) wins
    assert 'src="https://ex.com/b.png"' in out
    assert 'srcset="https://ex.com/a.png 400w, https://ex.com/b.png 800w"' in out


def test_srcset_density_appends_src_as_1x():
    html = '<main><img srcset="a.png 2x" src="c.png"></main>'
    out = transform_html(html, base_url="https://ex.com/")
    # all-density srcset -> src joins as 1x; 2x is largest -> becomes src
    assert 'src="https://ex.com/a.png"' in out


def test_srcset_density_src_wins_when_larger():
    html = '<main><img srcset="a.png 0.5x" src="c.png"></main>'
    out = transform_html(html, base_url="https://ex.com/")
    assert 'src="https://ex.com/c.png"' in out


def test_srcset_bare_entry_defaults_1x():
    html = '<main><img srcset="a.png, b.png 2x"></main>'
    out = transform_html(html, base_url="https://ex.com/")
    assert 'src="https://ex.com/b.png"' in out
    assert 'srcset="https://ex.com/a.png, https://ex.com/b.png 2x"' in out


# -- end-to-end shape --------------------------------------------------------


def test_full_page_transform():
    html = (
        "<html><head><title>T</title><script>s()</script></head><body>"
        '<nav class="navbar">nav</nav>'
        '<div class="content"><article><h1>Hi</h1>'
        '<a href="rel/x">link</a><!-- note --></article></div>'
        '<footer class="site-footer">f</footer></body></html>'
    )
    out = transform_html(html, base_url="https://site.org/a/b")
    assert out == (
        "<html><head><title>T</title></head><body>"
        '<div class="content"><article><h1>Hi</h1>'
        '<a href="https://site.org/a/rel/x">link</a></article></div>'
        "</body></html>"
    )


def test_extract_formats_dag():
    from anycrawl_ray.functions.extract import extract_formats

    html = (
        "<html><head><title>T</title><meta name='d' content='x'></head><body>"
        "<nav>chrome</nav><article>" + "word " * 40 + '<a href="/n">n</a>'
        "</article></body></html>"
    )
    out = extract_formats(
        "https://s.io/base/", html, ("html", "markdown", "rawHtml", "text", "links")
    )
    assert out["title"] == "T"
    assert out["metadata"] == [{"name": "d", "content": "x", "property": None}]
    assert "<nav>" not in out["html"]  # main-content filter applied
    assert 'href="https://s.io/n"' in out["html"]  # absolutized
    assert "chrome" not in out["markdown"] and "word" in out["markdown"]
    assert out["rawHtml"] == html
    assert "chrome" in out["text"]  # text comes from RAW html
    assert out["links"] == ["https://s.io/n"]


def test_extract_formats_include_tags_drive_markdown():
    from anycrawl_ray.functions.extract import extract_formats

    body = "para " * 30
    html = f"<h1>skip</h1><section id='a'><p>{body}</p></section>"
    out = extract_formats(
        "https://s.io/", html, ("markdown",), include_tags=["#a"]
    )
    assert "skip" not in out["markdown"]
    assert "para" in out["markdown"]


def test_selector_errors_are_loud():
    with pytest.raises(ValueError):
        transform_html("<p>x</p>", include_tags=["p:nth-child(2)"])


def test_text_skips_comments_in_kept_tree():
    """Regression (code review): .text() on a keep_comments=True tree must
    skip ("c", str) entries instead of crashing."""
    from anycrawl_ray.functions.serp import parse_html

    root = parse_html("<p>a<!--hidden-->b</p>", keep_comments=True)
    p = root.find_all(lambda n: n.tag == "p")[0]
    assert p.text() == "ab"
