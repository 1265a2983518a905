"""Golden html->markdown cases ported from the reference test suite
(reference packages/libs/src/__tests__/html-to-markdown.test.ts) — same
inputs, same contains/regex assertions."""

import re

import pytest

from anycrawl_ray.functions.markdown import html_to_markdown as md


# -- Basic conversion -------------------------------------------------------

def test_headings_h1_h6():
    html = "".join(f"<h{i}>Heading {i}</h{i}>" for i in range(1, 7))
    out = md(html)
    for i in range(1, 7):
        assert f"{'#' * i} Heading {i}" in out


def test_paragraphs():
    out = md("<p>This is a paragraph.</p><p>This is another paragraph.</p>")
    assert "This is a paragraph." in out
    assert "This is another paragraph." in out


def test_bold():
    out = md("<p>This is <strong>bold</strong> and <b>also bold</b>.</p>")
    assert "**bold**" in out and "**also bold**" in out


def test_italic():
    out = md("<p>This is <em>italic</em> and <i>also italic</i>.</p>")
    assert "*italic*" in out and "*also italic*" in out


def test_links():
    assert "[Example Link](https://example.com)" in md(
        '<a href="https://example.com">Example Link</a>'
    )


def test_links_with_title():
    assert '[Example Link](https://example.com "Example Title")' in md(
        '<a href="https://example.com" title="Example Title">Example Link</a>'
    )


def test_images():
    assert "![Example Image](https://example.com/image.jpg)" in md(
        '<img src="https://example.com/image.jpg" alt="Example Image">'
    )


def test_images_with_title():
    assert '![Example Image](https://example.com/image.jpg "Image Title")' in md(
        '<img src="https://example.com/image.jpg" alt="Example Image" title="Image Title">'
    )


def test_skip_svg_data_uris():
    assert "![SVG]" not in md('<img src="data:image/svg+xml;base64,..." alt="SVG">')


def test_unordered_lists():
    out = md("<ul><li>Item 1</li><li>Item 2</li><li>Item 3</li></ul>")
    for i in (1, 2, 3):
        assert re.search(rf"[-*]\s+Item {i}", out)


def test_ordered_lists():
    out = md("<ol><li>First</li><li>Second</li><li>Third</li></ol>")
    assert re.search(r"1\.\s+First", out)
    assert re.search(r"2\.\s+Second", out)
    assert re.search(r"3\.\s+Third", out)


def test_line_breaks():
    assert "Line 1\nLine 2\nLine 3" in md("Line 1<br>Line 2<br>Line 3")


# -- Code block extraction --------------------------------------------------

def test_code_block_language_class():
    out = md('<pre><code class="language-javascript">const x = 1;\nconst y = 2;</code></pre>')
    assert "```javascript" in out and "const x = 1;" in out and "const y = 2;" in out
    assert "```" in out


def test_code_block_lang_class():
    out = md('<pre><code class="lang-python">def hello():\n    print("Hello")</code></pre>')
    assert "```python" in out and "def hello():" in out and 'print("Hello")' in out


def test_code_block_no_language():
    assert "```\nplain code\nmore code\n```" in md(
        "<pre><code>plain code\nmore code</code></pre>"
    )


def test_code_block_line_numbers_removed():
    out = md("<pre><code>1 const x = 1;\n2 const y = 2;\n3 const z = 3;</code></pre>")
    assert not re.search(r"^\d+\s+const", out, re.MULTILINE)
    assert "const x = 1;" in out and "const y = 2;" in out


def test_inline_code():
    assert "`console.log()`" in md("<p>Use the <code>console.log()</code> function.</p>")


def test_code_block_content_preserved():
    out = md('<pre><code class="language-html">&lt;div&gt;Hello&lt;/div&gt;</code></pre>')
    assert "```html" in out and "<div>Hello</div>" in out


# -- GFM features -----------------------------------------------------------

def test_tables():
    html = (
        "<table><thead><tr><th>Header 1</th><th>Header 2</th></tr></thead>"
        "<tbody><tr><td>Cell 1</td><td>Cell 2</td></tr>"
        "<tr><td>Cell 3</td><td>Cell 4</td></tr></tbody></table>"
    )
    out = md(html)
    for s in ("Header 1", "Header 2", "Cell 1", "Cell 2", "|"):
        assert s in out


def test_strikethrough():
    assert re.search(r"~deleted~", md("<p>This is <del>deleted</del> text.</p>"))


def test_task_lists():
    html = ('<ul><li><input type="checkbox" checked> Completed task</li>'
            '<li><input type="checkbox"> Incomplete task</li></ul>')
    out = md(html)
    assert re.search(r"\[x\]\s+Completed task", out, re.IGNORECASE)
    assert re.search(r"\[\s*\]\s+Incomplete task", out, re.IGNORECASE)


# -- Post-processing --------------------------------------------------------

def test_normalize_blank_lines():
    out = md("<p>Paragraph 1</p><br><br><br><br><p>Paragraph 2</p>")
    assert not re.search(r"\n{3,}", out)


def test_skip_to_content_removed():
    out = md('<a href="#main">Skip to Content</a><p>Main content here</p>')
    assert "Skip to Content" not in out and "Main content here" in out


def test_skip_to_main_removed():
    assert "Skip to main" not in md('<a href="#main">Skip to main</a><p>Content</p>')


def test_link_text_whitespace_cleanup():
    assert "[Link with spaces](https://example.com)" in md(
        '<a href="https://example.com">Link   with   spaces</a>'
    )


def test_blank_lines_around_images():
    out = md('<p>Text before</p><img src="image.jpg" alt="Image"><p>Text after</p>')
    assert re.search(r"Text before\n\n!\[Image\]\(image\.jpg\)\n\nText after", out)


def test_empty_link_text_uses_url():
    assert "[https://example.com](https://example.com)" in md(
        '<a href="https://example.com"></a>'
    )


# -- Edge cases -------------------------------------------------------------

def test_empty_html():
    assert md("") == ""


def test_whitespace_only():
    assert md("   \n\n   ") == ""


def test_nested_lists():
    html = ("<ul><li>Item 1<ul><li>Nested 1</li><li>Nested 2</li></ul></li>"
            "<li>Item 2</li></ul>")
    out = md(html)
    for s in ("Item 1", "Nested 1", "Nested 2", "Item 2"):
        assert s in out


def test_linked_images():
    out = md('<a href="https://example.com"><img src="image.jpg" alt="Image"></a>')
    assert "![Image](image.jpg)" in out and "https://example.com" in out


def test_special_characters():
    assert '< > & "' in md("<p>Special chars: &lt; &gt; &amp; &quot;</p>")


def test_script_removed():
    out = md('<script>alert("XSS")</script><p>Content</p>')
    assert "alert" not in out and "Content" in out


def test_style_removed():
    out = md("<style>body { color: red; }</style><p>Content</p>")
    assert "color: red" not in out and "Content" in out


def test_blockquote():
    assert "> This is a quote" in md("<blockquote>This is a quote</blockquote>")


def test_horizontal_rule():
    out = md("<p>Before</p><hr><p>After</p>")
    assert "---" in out and "Before" in out and "After" in out


def test_figure_figcaption():
    out = md('<figure><img src="image.jpg" alt="Image">'
             "<figcaption>Image caption</figcaption></figure>")
    assert "![Image](image.jpg)" in out and "Image caption" in out


# -- Regressions ------------------------------------------------------------

def test_paragraph_blank_line_between():
    assert re.search(r"Paragraph 1\n\nParagraph 2", md("<p>Paragraph 1</p><p>Paragraph 2</p>"))


def test_div_content():
    assert "Content in div" in md("<div>Content in div</div>")


def test_span_content():
    assert re.search(r"Text with\s+span content\s+inside",
                     md("<p>Text with <span>span content</span> inside</p>"))
