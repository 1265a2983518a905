"""html->markdown (M4), html->spans (M3), politeness/robots actors."""

import numpy as np
import pytest

from anycrawl_ray.corpus import generate_robots
from anycrawl_ray.functions.markdown import (
    fix_multiline_links,
    html_to_markdown,
    html_to_spans,
    post_process,
)
from anycrawl_ray.state.politeness import PolitenessCore, PolitenessSet


def test_headings_paragraphs_links():
    md = html_to_markdown("<h2>T</h2><p>a <a href='/x' title='tt'>link</a> b</p>")
    assert "## T" in md
    assert '[link](/x "tt")' in md


def test_empty_link_text_uses_href():
    # html-to-markdown.ts:171-173
    md = html_to_markdown('<a href="http://e.test/a"></a>')
    assert md == "[http://e.test/a](http://e.test/a)"


def test_lazy_image_priority_and_svg_skip():
    # html-to-markdown.ts:188-199: data-src > data-original > src
    md = html_to_markdown('<img data-src="http://i/lazy.png" src="http://i/eager.png" alt="x">')
    assert "![x](http://i/lazy.png)" in md and "eager" not in md
    md2 = html_to_markdown('<img data-original="http://i/orig.png" src="s.gif">')
    assert "orig.png" in md2
    assert html_to_markdown('<img src="data:image/svg+xml;base64,x">') == ""
    assert html_to_markdown("<img>") == ""


def test_code_block_language_and_line_numbers():
    # html-to-markdown.ts:130-153
    md = html_to_markdown(
        '<pre><code class="language-js">1 var a\n2 var b</code></pre>'
    )
    assert md.startswith("```js\n")
    assert "var a\nvar b" in md and "1 " not in md


def test_script_style_removed():
    md = html_to_markdown("<p>keep</p><script>x()</script><style>.a{}</style>")
    assert md == "keep"


def test_skip_to_content_removed():
    # html-to-markdown.ts:91-96
    md = html_to_markdown('<a href="#main">Skip to content</a><p>body</p>')
    assert "Skip" not in md and "body" in md


def test_multiline_link_fix():
    assert fix_multiline_links("[a\nb](x)") == "[a\\nb](x)"
    assert fix_multiline_links("no\nlink") == "no\nlink"


def test_blank_collapse_and_link_text_cleanup():
    assert post_process("a\n\n\n\n\nb") == "a\n\nb"
    assert post_process("[  spaced   text ](x)") == "[spaced text](x)"


def test_div_inline_vs_block():
    # html-to-markdown.ts:241-260
    inline = html_to_markdown("<div>a</div><div>b</div>")
    assert inline == "a b"
    block = html_to_markdown("<div><p>para</p></div>")
    assert block == "para"


def test_paragraph_inside_anchor_inline():
    # html-to-markdown.ts:222-233
    md = html_to_markdown('<a href="/x"><p>multi</p></a>')
    assert md == "[multi](/x)"


def test_html_to_spans_interleaving():
    html = (
        "<p>alpha</p>"
        '<img src="http://i/1.png">'
        "<p>beta <a href='/l'>anchor</a></p>"
        '<img src="http://i/2.png">'
    )
    _, spans = html_to_spans(html)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "link", "text", "media"] or kinds == [
        "text", "media", "text", "link", "media",
    ]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    media = [s["media_ref"] for s in spans if s["kind"] == "media"]
    assert media == ["http://i/1.png", "http://i/2.png"]
    link = [s for s in spans if s["kind"] == "link"][0]
    assert link["text"] == "anchor" and link["media_ref"] == "/l"


# -- politeness actors ------------------------------------------------------


def test_politeness_core_token_bucket():
    c = PolitenessCore(0, default_rate_per_sec=1.0, burst=2.0)
    hosts = ["h.test"] * 3
    first = c.admit(hosts, now=0.0)
    assert first.tolist() == [True, True, False]  # burst of 2
    assert c.admit(["h.test"], now=0.5).tolist() == [False]  # not refilled yet
    assert c.admit(["h.test"], now=1.6).tolist() == [True]   # ~1.6 tokens back


def test_politeness_core_robots_and_rates():
    robots = generate_robots()
    c = PolitenessCore(0, robots_table=robots)
    # host h02 disallows /p/000 (corpus.generate_robots: every 3rd host)
    mask = c.allowed(
        ["http://h02.example.test/p/0001", "http://h02.example.test/q/1",
         "http://h00.example.test/p/0001"]
    )
    assert mask.tolist() == [False, True, True]
    assert c.sitemaps("h01.example.test") == ["http://h01.example.test/sitemap.xml"]
    assert c.sitemaps("nope.test") == []


def test_politeness_per_round_cap_equivalence():
    """Token bucket with burst=cap and one period per round == per_host_cap."""
    cap = 3
    c = PolitenessCore(0, default_rate_per_sec=float(cap), burst=float(cap))
    for rnd in range(3):
        got = c.admit(["h.test"] * 5, now=float(rnd))
        assert got.sum() == cap  # exactly cap admits per round


def test_politeness_actor_set(ray_session):
    robots = generate_robots()
    p = PolitenessSet(n_shards=2, robots_table=robots, default_rate_per_sec=2.0, burst=1.0)
    try:
        hosts = [f"h{i:02d}.example.test" for i in range(6)]
        first = p.admit(hosts, now=0.0)
        assert first.all()  # burst 1 available everywhere
        again = p.admit(hosts, now=0.0)
        assert not again.any()  # buckets drained
        later = p.admit(hosts, now=1.0)
        assert later.all()  # refilled
        mask = p.allowed(
            ["http://h02.example.test/p/0009", "http://h03.example.test/p/0009"]
        )
        assert mask.tolist() == [False, True]
        assert p.sitemaps("h04.example.test") == ["http://h04.example.test/sitemap.xml"]
    finally:
        p.shutdown()
