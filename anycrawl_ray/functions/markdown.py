"""HTML -> markdown conversion + interleaved-span extraction (M3/M4/M9).

Re-implements the reference's Turndown+GFM pipeline subset from scratch
(reference packages/libs/src/html-to-markdown.ts):

- pre>code blocks with language detect from ``language-x``/``lang-x`` class
  and line-number stripping (:130-153)
- inline links: whitespace-collapsed text, empty text -> href, title suffix
  (:156-178)
- images: ``data-src`` > ``data-original`` > ``src`` priority (lazy-load),
  skip empty/inline-SVG, blank lines around (:181-205)
- script/style/noscript/meta/link removed (:208-214)
- paragraphs: inline when inside an anchor (:218-238)
- divs: inline unless they contain block elements (:241-260)
- post-processing (:33-95): multiline-link newline escaping, skip-to-content
  link removal, >=3 blank-line collapse, link-text whitespace cleanup,
  image spacing, trim

``html_to_spans`` additionally emits the interleaved span sequence
(text / media / link, document order) — the page-side producer of the
DOCS_SCHEMA rows (BASELINE.json input_hint). OCR spans are injected after
their images by the OCR stage, preserving occurrence order
(reference packages/scrape/src/core/MarkdownOCR.ts:168-240).

Runs per-row inside map_batches (pure function; the HTML tree walker is the
stdlib-based one from functions/serp.py).
"""

from __future__ import annotations

import re

from .serp import _Node, parse_html

_BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "blockquote", "pre"}
)
_REMOVE_TAGS = frozenset({"script", "style", "noscript", "meta", "link", "head"})
_LANG_RE = re.compile(r"language-(\w+)|lang-(\w+)")
_LINE_NO_RE = re.compile(r"^\d+\s+", re.MULTILINE)
_SKIP_LINK_RE = re.compile(r"\[skip\s+to\s+(content|main)\]\(#[^\)]*\)", re.IGNORECASE)


def _has_block(node: _Node) -> bool:
    return bool(node.find_all(lambda n: n.tag in _BLOCK_TAGS and n is not node))


def _in_anchor(ancestors: list[str]) -> bool:
    return "a" in ancestors


class _Converter:
    def __init__(self, collect_spans: bool = False):
        self.collect = collect_spans
        self.spans: list[dict] = []
        self._text_buf: list[str] = []

    # -- span collection -------------------------------------------------
    def _flush_text_span(self) -> None:
        if not self.collect:
            return
        text = post_process("".join(self._text_buf))
        if text:
            self.spans.append(
                {"kind": "text", "text": text, "media_ref": "", "offset": len(self.spans)}
            )
        self._text_buf = []

    def _emit(self, md: str) -> str:
        if self.collect:
            self._text_buf.append(md)
        return md

    def _emit_media(self, ref: str) -> None:
        if self.collect:
            self._flush_text_span()
            self.spans.append(
                {"kind": "media", "text": "", "media_ref": ref, "offset": len(self.spans)}
            )

    def _emit_link(self, text: str, href: str) -> None:
        if self.collect:
            self._flush_text_span()  # keep document order: text-before-link
            self.spans.append(
                {"kind": "link", "text": text, "media_ref": href, "offset": len(self.spans)}
            )

    # -- conversion ------------------------------------------------------
    def convert(self, node: _Node, ancestors: list[str]) -> str:
        out: list[str] = []
        for kind, payload in node.content:  # document order
            if kind == "t":
                out.append(self._emit(re.sub(r"\s+", " ", payload)))
            else:
                out.append(self.convert_element(payload, ancestors))
        return "".join(out)

    def convert_element(self, node: _Node, ancestors: list[str]) -> str:
        tag = node.tag
        if tag in _REMOVE_TAGS:
            return ""
        anc = ancestors + [tag]

        if tag == "pre":
            code = next((c for c in node.children if c.tag == "code"), None)
            if code is not None:
                cls = code.attrs.get("class", "")
                m = _LANG_RE.search(cls)
                language = (m.group(1) or m.group(2)) if m else ""
                content = _LINE_NO_RE.sub("", code.text()).strip()
                return self._emit(f"\n\n```{language}\n{content}\n```\n\n")
            return self._emit("\n\n```\n" + node.text().strip() + "\n```\n\n")

        if tag == "img":
            src = (
                node.attrs.get("data-src")
                or node.attrs.get("data-original")
                or node.attrs.get("src")
                or ""
            )
            if not src or src.startswith("data:image/svg"):
                return ""
            alt = node.attrs.get("alt", "")
            title = node.attrs.get("title", "")
            title_part = f' "{title}"' if title else ""
            md = self._emit(f"\n\n![{alt}]({src}{title_part})\n\n")
            self._emit_media(src)
            return md

        if tag == "a" and node.attrs.get("href"):
            href = node.attrs.get("href", "").strip()
            inner = self.convert(node, anc)
            clean = re.sub(r"\s+", " ", inner).strip()
            link_text = clean or href
            title = node.attrs.get("title", "")
            title_part = f' "{title}"' if title else ""
            self._emit_link(link_text, href)
            return self._emit_replacing(inner, f"[{link_text}]({href}{title_part})")

        inner = self.convert(node, anc)

        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            return self._emit_replacing(
                inner, "\n\n" + "#" * level + " " + inner.strip() + "\n\n"
            )
        if tag == "p":
            t = inner.strip()
            if not t:
                return ""
            if _in_anchor(ancestors):
                return self._emit_replacing(inner, t)
            return self._emit_replacing(inner, f"\n\n{t}\n\n")
        if tag == "div":
            t = inner.strip()
            if not t:
                return ""
            if _in_anchor(ancestors):
                return self._emit_replacing(inner, t)
            if _has_block(node):
                return self._emit_replacing(inner, f"\n\n{t}\n\n")
            return self._emit_replacing(inner, t + " ")
        if tag in ("strong", "b"):
            t = inner.strip()
            return self._emit_replacing(inner, f"**{t}**" if t else "")
        if tag in ("em", "i"):
            t = inner.strip()
            return self._emit_replacing(inner, f"*{t}*" if t else "")
        if tag == "code":
            return self._emit_replacing(inner, f"`{inner.strip()}`")
        if tag == "br":
            return self._emit("\n")
        if tag == "hr":
            return self._emit("\n\n---\n\n")
        if tag in ("del", "s", "strike"):
            t = inner.strip()
            # GFM single-tilde strikethrough (reference golden: /~deleted~/)
            return self._emit_replacing(inner, f"~{t}~" if t else "")
        if tag == "input":
            # GFM task-list checkboxes (reference golden matrix)
            if node.attrs.get("type", "").lower() == "checkbox":
                return self._emit("[x] " if "checked" in node.attrs else "[ ] ")
            return ""
        if tag == "li":
            return self._emit_replacing(inner, f"\n- {inner.strip()}")
        if tag == "ol":
            # renumber the DIRECT items ("\n- " markers at this level);
            # nested lists were already wrapped in blank lines by their own
            # ul/ol pass, so direct markers are the ones after "\n- "
            items = ("\n" + inner.strip()).split("\n- ")
            items = [s for s in items if s != ""]
            numbered = "\n".join(f"{i + 1}. {s.strip()}" for i, s in enumerate(items))
            return self._emit_replacing(inner, f"\n\n{numbered}\n\n")
        if tag == "ul":
            return self._emit_replacing(inner, f"\n\n{inner.strip()}\n\n")
        if tag == "table":
            rows = node.find_all(lambda n: n.tag == "tr")
            lines = []
            # cells re-convert with a throwaway converter so the span buffer
            # keeps exactly ONE copy of the table text (inner), which
            # _emit_replacing then swaps for the pipe-table markdown
            sub = _Converter(collect_spans=False)
            for r_i, tr in enumerate(rows):
                cells = [
                    re.sub(r"\s+", " ", sub.convert(c, anc + [c.tag])).strip()
                    for c in tr.children
                    if c.tag in ("th", "td")
                ]
                if not cells:
                    continue
                lines.append("| " + " | ".join(cells) + " |")
                if r_i == 0:  # GFM header separator after the first row
                    lines.append("|" + " --- |" * len(cells))
            return self._emit_replacing(inner, "\n\n" + "\n".join(lines) + "\n\n")
        if tag == "blockquote":
            lines = inner.strip().split("\n")
            quoted = "\n".join("> " + l for l in lines)
            return self._emit_replacing(inner, f"\n\n{quoted}\n\n")
        return inner

    def _emit_replacing(self, inner: str, replacement: str) -> str:
        """Swap the inner emission for the wrapped form in the span buffer."""
        if self.collect and self._text_buf:
            # drop the raw inner text we appended while walking children and
            # append the wrapped markdown instead (best-effort suffix match)
            joined = "".join(self._text_buf)
            if inner and joined.endswith(inner):
                self._text_buf = [joined[: len(joined) - len(inner)]]
            self._text_buf.append(replacement)
        return replacement


def fix_multiline_links(markdown: str) -> str:
    """html-to-markdown.ts:59-86 — escape newlines inside link text."""
    out = []
    bracket_count = 0
    prev = ""
    for ch in markdown:
        if ch == "[" and prev != "\\":
            bracket_count += 1
        elif ch == "]" and prev != "\\":
            bracket_count = max(0, bracket_count - 1)
        if bracket_count > 0 and ch == "\n":
            out.append("\\n")
        else:
            out.append(ch)
        prev = ch
    return "".join(out)


def post_process(markdown: str) -> str:
    """html-to-markdown.ts:33-55."""
    result = fix_multiline_links(markdown)
    result = _SKIP_LINK_RE.sub("", result)
    result = re.sub(r"\n{3,}", "\n\n", result)
    result = re.sub(
        r"\[([^\]]+)\]", lambda m: "[" + re.sub(r"\s+", " ", m.group(1)).strip() + "]",
        result,
    )
    result = re.sub(r"([^\n])\n!\[", r"\1\n\n![", result)
    result = re.sub(r"!\[([^\]]*)\]\(([^\)]+)\)\n(?!\n)", r"![\1](\2)\n\n", result)
    return result.strip()


def html_to_markdown(html: str) -> str:
    """M4: the html-to-markdown operator (rule subset above)."""
    root = parse_html(html)
    conv = _Converter(collect_spans=False)
    return post_process(conv.convert(root, []))


def html_to_spans(html: str) -> tuple[str, list[dict]]:
    """M3+M4: markdown plus the interleaved span sequence (document order)."""
    root = parse_html(html)
    conv = _Converter(collect_spans=True)
    md = post_process(conv.convert(root, []))
    conv._flush_text_span()
    # reassign dense offsets (flush boundaries may have skipped empties)
    for i, s in enumerate(conv.spans):
        s["offset"] = i
    return md, conv.spans
