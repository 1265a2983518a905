"""Content extraction operators (M1/M2/M5/M6/M9/M12).

Transcribed semantics:
- extract_base_content (M1): url + <title> text + raw HTML
  (reference packages/scrape/src/core/DataExtractor.ts:268-302)
- extract_metadata (M2): <meta> name/property/content entries
  (DataExtractor.ts:307-330)
- html_to_text (M6): visible text of the document (html-to-text convert of
  rawHtml, DataExtractor.ts:486-488)
- process_markdown (M5): main conversion, then minimal-filter fallback when
  result < 100 chars or < 20 words (DataExtractor.ts:335-394)
- OCR injection (M9): locate markdown image tokens (incl. linked-image
  wrappers), inject [ANYCRAWL_OCR_TEXT] blocks after each occurrence in
  image order; OCR text normalized + 4000-char cap
  (reference packages/scrape/src/core/MarkdownOCR.ts:168-240)
- should_scrape_url (M12): scrape_paths gate — emit content only for
  matching URLs, still expand links (reference engines/Base.ts:517-554)

All pure per-row functions for use inside map_batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..pathmatch import matches_paths
from .markdown import html_to_markdown
from .serp import parse_html

OCR_BLOCK_OPEN = "[ANYCRAWL_OCR_TEXT]"
OCR_BLOCK_CLOSE = "[/ANYCRAWL_OCR_TEXT]"
_OCR_MAX_LEN = 4000


def extract_base_content(url: str, html: str) -> dict:
    root = parse_html(html)
    titles = root.find_all(lambda n: n.tag == "title")
    title = titles[0].text().strip() if titles else ""
    return {"url": url, "title": title, "rawHtml": html}


def extract_metadata(html: str) -> list[dict]:
    root = parse_html(html)
    out = []
    for m in root.find_all(lambda n: n.tag == "meta"):
        name = m.attrs.get("name")
        prop = m.attrs.get("property")
        content = m.attrs.get("content")
        if (name or prop) and content:
            out.append(
                {"name": name or prop, "content": content.strip(), "property": prop}
            )
    return out


_BLOCKISH = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "br",
     "tr", "table", "blockquote", "pre", "section", "article", "header", "footer"}
)
_TEXT_SKIP = frozenset({"script", "style", "noscript", "head"})


def _collect_text(node, out: list[str]) -> None:
    if node.tag in _TEXT_SKIP:
        return
    for kind, payload in node.content:
        if kind == "t":
            out.append(payload)
        else:
            _collect_text(payload, out)
            if payload.tag in _BLOCKISH:
                out.append("\n")


def html_to_text(html: str) -> str:
    """Visible text, block elements separated, whitespace collapsed."""
    parts: list[str] = []
    _collect_text(parse_html(html), parts)
    return re.sub(r"\s+", " ", "".join(parts)).strip()


_COMMENT_RE = re.compile(r"<!--[\s\S]*?-->")
_SCRIPT_RE = re.compile(r"<script[\s\S]*?</script>", re.I)
_STYLE_RE = re.compile(r"<style[\s\S]*?</style>", re.I)


def fallback_html(html: str) -> str:
    """Minimal filtering only: scripts, styles, comments (DataExtractor
    getFallbackHtml)."""
    return _COMMENT_RE.sub("", _STYLE_RE.sub("", _SCRIPT_RE.sub("", html)))


def process_markdown(html: str, main_content_html: str | None = None) -> tuple[str, bool]:
    """(markdown, used_fallback) — DataExtractor.ts:335-394 thresholds."""
    markdown = html_to_markdown(main_content_html if main_content_html is not None else html)
    trimmed = markdown.strip()
    if len(trimmed) < 100 or len(trimmed.split()) < 20:
        return html_to_markdown(fallback_html(html)), True
    return markdown, False


# ---------------------------------------------------------------------------
# OCR injection (M9)
# ---------------------------------------------------------------------------


@dataclass
class ImageOccurrence:
    image_start: int
    image_end: int
    insert_after: int
    image_url: str


def _parse_balanced(text: str, start: int, open_ch: str, close_ch: str):
    """Span of balanced open/close starting at ``start`` (which must be
    open_ch); returns (content, end_index_exclusive) or None."""
    if start >= len(text) or text[start] != open_ch:
        return None
    depth = 0
    for i in range(start, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i], i + 1
    return None


def _parse_image_token(markdown: str, pos: int):
    """``![alt](url ...)`` starting at pos -> (image_url, end) or None."""
    if not markdown.startswith("![", pos):
        return None
    alt = _parse_balanced(markdown, pos + 1, "[", "]")
    if alt is None:
        return None
    _, after_alt = alt
    dest = _parse_balanced(markdown, after_alt, "(", ")")
    if dest is None:
        return None
    content, end = dest
    url = content.strip().split()[0] if content.strip() else ""
    return url, end


def collect_image_occurrences(markdown: str) -> list[ImageOccurrence]:
    """MarkdownOCR.ts:168-198 — all image tokens, linked-wrapper aware."""
    out: list[ImageOccurrence] = []
    cursor = 0
    n = len(markdown)
    while cursor < n:
        if not markdown.startswith("![", cursor):
            cursor += 1
            continue
        parsed = _parse_image_token(markdown, cursor)
        if parsed is None:
            cursor += 1
            continue
        url, img_end = parsed
        insert_after = img_end
        # linked image [![alt](img)](href): wrapper closes after the image
        if cursor > 0 and markdown[cursor - 1] == "[" and img_end < n and markdown[img_end] == "]":
            wrapper = _parse_balanced(markdown, img_end, "]", ")")  # not balanced pair
            # find the closing ) of the wrapper destination
            if img_end + 1 < n and markdown[img_end + 1] == "(":
                dest = _parse_balanced(markdown, img_end + 1, "(", ")")
                if dest is not None:
                    insert_after = dest[1]
        out.append(ImageOccurrence(cursor, img_end, insert_after, url))
        cursor = insert_after
    return out


def normalize_ocr_text(text: str) -> str:
    """MarkdownOCR.ts:200-214."""
    stripped = text.replace("\r", "")
    stripped = re.sub(r"\[/?ANYCRAWL_OCR_TEXT\]", "", stripped)
    stripped = re.sub(r"\n{3,}", "\n\n", stripped).strip()
    if len(stripped) <= _OCR_MAX_LEN:
        return stripped
    return stripped[:_OCR_MAX_LEN] + "..."


def inject_ocr_blocks(markdown: str, ocr_by_url: dict[str, str]) -> str:
    """MarkdownOCR.ts:220-240 — OCR block after each image occurrence, in
    occurrence order; unique image URLs OCR'd once (D5 dedup upstream)."""
    occurrences = collect_image_occurrences(markdown)
    if not occurrences:
        return markdown
    cursor = 0
    out = []
    for occ in occurrences:
        text = ocr_by_url.get(occ.image_url, "")
        out.append(markdown[cursor : occ.insert_after])
        out.append(f"\n\n{OCR_BLOCK_OPEN}\n{normalize_ocr_text(text)}\n{OCR_BLOCK_CLOSE}\n")
        cursor = occ.insert_after
    out.append(markdown[cursor:])
    return "".join(out)


def extract_formats(
    url: str,
    html: str,
    formats: list[str] | tuple[str, ...],
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
) -> dict:
    """Scrape-format DAG (reference DataExtractor.ts extractData :437-586):
    title/metadata always; ``html`` = the selector-driven transform (M3,
    functions/htmltransform.py) with URL absolutization; ``markdown`` =
    processMarkdown over that transformed HTML (:473-482); ``rawHtml`` the
    original; ``text`` = visible text of the RAW html (:487-488); ``links`` =
    absolutized a[href] targets of the raw document (:490-494).

    Pure per-row function for map_batches (the crawl DAG's span path covers
    json/summary; this is the scrape surface)."""
    from .htmltransform import resolve_url, select, transform_html
    from .serp import parse_html as _parse

    base = extract_base_content(url, html)
    out: dict = {"title": base["title"], "metadata": extract_metadata(html)}
    needs_html = any(f in formats for f in ("html", "markdown", "json", "summary"))
    transformed = None
    if needs_html:
        transformed = transform_html(
            html,
            base_url=url,
            include_tags=include_tags,
            exclude_tags=exclude_tags,
            only_main_content=only_main_content,
        )
    if "html" in formats:
        out["html"] = transformed
    if "markdown" in formats or "json" in formats or "summary" in formats:
        md, used_fallback = process_markdown(html, transformed)
        out["markdown"] = md
        out["markdown_used_fallback"] = used_fallback
    if "rawHtml" in formats:
        out["rawHtml"] = html
    if "text" in formats:
        out["text"] = html_to_text(html)
    if "links" in formats:
        root = _parse(html)
        out["links"] = [
            resolve_url(url, a.attrs["href"])
            for a in select(root, "a[href]")
            if a.attrs.get("href")
        ]
    return out


def should_scrape_url(url: str, scrape_paths: list[str] | tuple[str, ...]) -> bool:
    """M12: content emitted only for matching URLs; link expansion continues
    regardless (reference engines/Base.ts:517-554). Empty list -> scrape all."""
    if not scrape_paths:
        return True
    return matches_paths(url, list(scrape_paths), [])
