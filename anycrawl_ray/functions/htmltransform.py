"""Selector-driven HTML transform (M3 full surface).

Re-implements, from scratch over the stdlib DOM in functions/serp.py, the
reference's HTMLTransformer (packages/scrape/src/core/transformers/
HTMLTransformer.ts):

- ALWAYS_REMOVE_TAGS / EXCLUDE_NON_MAIN_TAGS / FORCE_INCLUDE_MAIN_TAGS
  selector catalogs (HTMLTransformer.ts:21-165, data lists transcribed)
- ``include_tags``: per-selector document-order clone into a fresh root,
  concatenated outerHTML (doExtractCleanHtml, :208-226)
- ``only_main_content`` (default True): remove each EXCLUDE_NON_MAIN_TAGS
  match unless it has a FORCE_INCLUDE_MAIN_TAGS *descendant*
  (cheerio ``$element.find`` searches descendants only, :232-252)
- ``exclude_tags`` removal, then comment removal, then full-document
  serialization (:255-268)
- relative-URL absolutization for ``a[href]``, ``img[src]`` and
  ``img[srcset]`` with pixel-density/width descriptor parsing, the
  largest-source-becomes-src rule, the src-appended-as-1x rule, and the
  ``http:/host`` single-slash fix (transformRelativeUrls, :363-533)

The CSS selector engine supports what the catalogs and realistic user
options need: tag, ``*``, ``.class``, ``#id``, ``[attr]``/``[attr=v]``
(bare/quoted), compounds (``div.a#b[c=d]``), descendant/child combinators
and comma lists. Everything is a pure per-row function for map_batches.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .serp import _Node, parse_html

# HTMLTransformer.ts:21-25
ALWAYS_REMOVE_TAGS = ("script", "style", "noscript")

# HTMLTransformer.ts:31-131 (order preserved — removal happens per selector
# against the live document, so order is observable)
EXCLUDE_NON_MAIN_TAGS = (
    "header", "footer", "nav", "aside",
    ".header", ".top", ".navbar", "#header", ".site-header", ".page-header",
    ".footer", ".bottom", "#footer", ".site-footer", ".page-footer",
    ".sidebar", ".side", ".aside", "#sidebar", ".left-sidebar",
    ".right-sidebar",
    ".modal", ".popup", "#modal", ".overlay", ".dialog", ".lightbox",
    ".ad", ".ads", ".advert", "#ad", ".advertisement", ".banner-ad",
    ".lang-selector", ".language", "#language-selector", ".locale-selector",
    ".social", ".social-media", ".social-links", "#social", ".social-share",
    ".share-buttons",
    ".menu", ".navigation", "#nav", ".nav-menu", ".site-nav",
    ".breadcrumbs", "#breadcrumbs", ".breadcrumb",
    ".share", "#share",
    # ".widget" deliberately absent (HTMLTransformer.ts:107-112 note)
    ".cookie", "#cookie", ".cookie-banner", ".cookie-notice",
    ".cookie-consent",
    ".related", ".related-posts", ".related-articles",
    ".fc-decoration",
)

# HTMLTransformer.ts:137-165
FORCE_INCLUDE_MAIN_TAGS = (
    "#main", "main", "[role='main']", ".main-content", ".content-main",
    "article", ".article", ".post-content", ".entry-content",
    ".swoogo-cols", ".swoogo-text", ".swoogo-table-div", ".swoogo-space",
    ".swoogo-alert", ".swoogo-sponsors", ".swoogo-title", ".swoogo-tabs",
    ".swoogo-logo", ".swoogo-image", ".swoogo-button", ".swoogo-agenda",
)


# ---------------------------------------------------------------------------
# CSS selector engine
# ---------------------------------------------------------------------------

_COMPOUND_PART = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
    | \.(?P<cls>[\w-]+)
    | \#(?P<id>[\w-]+)
    | \[\s*(?P<aname>[\w-]+)\s*(?:=\s*(?P<aval>"[^"]*"|'[^']*'|[^\]\s]+)\s*)?\]
    """,
    re.VERBOSE,
)


class _Compound:
    __slots__ = ("tag", "classes", "ids", "attrs")

    def __init__(self):
        self.tag: str | None = None
        self.classes: list[str] = []
        self.ids: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []

    def matches(self, node: _Node) -> bool:
        if node.tag.startswith("#"):  # synthetic root
            return False
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.ids and node.attrs.get("id") not in self.ids:
            return False
        if self.classes:
            have = (node.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, val in self.attrs:
            if name not in node.attrs:
                return False
            if val is not None and (node.attrs.get(name) or "") != val:
                return False
        return True


def _parse_compound(text: str) -> _Compound:
    comp = _Compound()
    pos = 0
    while pos < len(text):
        m = _COMPOUND_PART.match(text, pos)
        if m is None:
            raise ValueError(f"unsupported selector: {text!r}")
        if m.group("tag"):
            comp.tag = m.group("tag").lower()
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        elif m.group("id"):
            comp.ids.append(m.group("id"))
        elif m.group("aname"):
            val = m.group("aval")
            if val is not None and val[:1] in "\"'":
                val = val[1:-1]
            comp.attrs.append((m.group("aname").lower(), val))
        pos = m.end()
    return comp


_COMBINATOR_SPLIT = re.compile(r"\s*>\s*|\s+")


def _parse_complex(text: str) -> list[tuple[str, _Compound]]:
    """-> [(combinator, compound)] left-to-right; first combinator is ' '."""
    out: list[tuple[str, _Compound]] = []
    pos = 0
    comb = " "
    text = text.strip()
    while pos < len(text):
        m = _COMBINATOR_SPLIT.match(text, pos)
        if m and m.start() == pos:
            comb = ">" if ">" in m.group(0) else " "
            pos = m.end()
            continue
        # consume one compound (up to next whitespace or '>')
        end = pos
        depth = 0
        while end < len(text):
            ch = text[end]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth == 0 and (ch.isspace() or ch == ">"):
                break
            end += 1
        out.append((comb, _parse_compound(text[pos:end])))
        comb = " "
        pos = end
    if not out:
        raise ValueError(f"empty selector: {text!r}")
    return out


def parse_selector(selector: str) -> list[list[tuple[str, _Compound]]]:
    return [_parse_complex(part) for part in selector.split(",") if part.strip()]


def _matches_complex(node: _Node, complex_sel: list[tuple[str, _Compound]]) -> bool:
    """querySelectorAll semantics: rightmost compound on node, walk up."""
    comb, comp = complex_sel[-1]
    if not comp.matches(node):
        return False
    return _matches_prefix(node, complex_sel, len(complex_sel) - 1)


def _matches_prefix(node: _Node, sel, idx: int) -> bool:
    if idx == 0:
        return True
    comb, _ = sel[idx]
    prev_comp = sel[idx - 1][1]
    anc = node.parent
    if comb == ">":
        return (
            anc is not None
            and prev_comp.matches(anc)
            and _matches_prefix(anc, sel, idx - 1)
        )
    while anc is not None:
        if prev_comp.matches(anc) and _matches_prefix(anc, sel, idx - 1):
            return True
        anc = anc.parent
    return False


def select(root: _Node, selector: str) -> list[_Node]:
    """Document-order matches of a (possibly comma-separated) selector."""
    sels = parse_selector(selector)
    out: list[_Node] = []

    def walk(n: _Node) -> None:
        if any(_matches_complex(n, s) for s in sels):
            out.append(n)
        for c in n.children:
            walk(c)

    for c in root.children:
        walk(c)
    return out


def _find_descendant(node: _Node, sels) -> bool:
    """cheerio $el.find(sel): any strict descendant matching (full-document
    anchoring, querySelectorAll-style)."""
    stack = list(node.children)
    while stack:
        n = stack.pop()
        if any(_matches_complex(n, s) for s in sels):
            return True
        stack.extend(n.children)
    return False


# ---------------------------------------------------------------------------
# DOM mutation + serialization
# ---------------------------------------------------------------------------


def _remove_node(node: _Node) -> None:
    p = node.parent
    if p is None:
        return
    try:
        p.children.remove(node)
    except ValueError:
        pass
    p.content = [(k, v) for k, v in p.content if not (k == "n" and v is node)]
    node.parent = None


# single void-element catalog shared with the parser (serializer and parser
# must agree or round-tripping affected tags breaks)
from .serp import _VOID  # noqa: E402


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


def serialize_inner(node: _Node, drop_comments: bool = False) -> str:
    parts: list[str] = []
    for kind, payload in node.content:
        if kind == "t":
            if node.tag in ("script", "style"):
                parts.append(payload)
            else:
                parts.append(_esc_text(payload))
        elif kind == "c":
            if not drop_comments:
                parts.append(f"<!--{payload}-->")
        else:
            parts.append(serialize_node(payload, drop_comments))
    return "".join(parts)


def serialize_node(node: _Node, drop_comments: bool = False) -> str:
    attrs = "".join(
        f' {k}="{_esc_attr(v)}"' if v is not None else f" {k}"
        for k, v in node.attrs.items()
    )
    if node.tag in _VOID:
        return f"<{node.tag}{attrs}>"
    return f"<{node.tag}{attrs}>{serialize_inner(node, drop_comments)}</{node.tag}>"


# ---------------------------------------------------------------------------
# Relative-URL absolutization (HTMLTransformer.ts:363-533)
# ---------------------------------------------------------------------------


def resolve_url(base_url: str, relative_url: str) -> str:
    """WHATWG-ish resolve with the reference's ``http:/host`` fix
    (HTMLTransformer.ts resolveUrl :537-556)."""
    fixed = relative_url
    if fixed.startswith("http:/") and not fixed.startswith("http://"):
        fixed = "http://" + fixed[6:]
    elif fixed.startswith("https:/") and not fixed.startswith("https://"):
        fixed = "https://" + fixed[7:]
    try:
        return urljoin(base_url, fixed)
    except ValueError:
        return relative_url


def _transform_srcset(img: _Node, base_url: str) -> None:
    srcset = img.attrs.get("srcset")
    if not srcset:
        return
    entries = [e.strip() for e in srcset.split(",")]
    sources: list[tuple[str, float, bool]] = []  # (abs_url, size, is_density)
    for entry in entries:
        parts = entry.split()
        if not parts:
            continue
        url = parts[0]
        descriptor = parts[1] if len(parts) > 1 else "1x"
        size, is_density = 1.0, True
        if descriptor.endswith("x"):
            try:
                size = float(descriptor[:-1])
            except ValueError:
                pass
        elif descriptor.endswith("w"):
            try:
                size = int(descriptor[:-1])
                is_density = False
            except ValueError:
                pass
        sources.append((resolve_url(base_url, url), size, is_density))
    if sources and all(s[2] for s in sources):
        src = img.attrs.get("src")
        if src:
            sources.append((resolve_url(base_url, src), 1.0, True))
    sources.sort(key=lambda s: -s[1])
    if sources:
        img.attrs["src"] = sources[0][0]
    new_entries = []
    for entry in entries:
        parts = entry.split()
        if not parts or not parts[0]:
            new_entries.append(entry)
            continue
        absolute = resolve_url(base_url, parts[0])
        new_entries.append(f"{absolute} {parts[1]}" if len(parts) > 1 else absolute)
    img.attrs["srcset"] = ", ".join(new_entries)


def transform_relative_urls(root: _Node, base_url: str) -> None:
    for img in select(root, "img[srcset]"):
        _transform_srcset(img, base_url)
    for img in select(root, "img[src]"):
        src = img.attrs.get("src")
        if src:
            img.attrs["src"] = resolve_url(base_url, src)
    for a in select(root, "a[href]"):
        href = a.attrs.get("href")
        if href:
            a.attrs["href"] = resolve_url(base_url, href)


# ---------------------------------------------------------------------------
# Extraction / cleaning (HTMLTransformer.ts doExtractCleanHtml :203-270)
# ---------------------------------------------------------------------------

_FORCE_INCLUDE_PARSED = [parse_selector(s)[0] for s in FORCE_INCLUDE_MAIN_TAGS]


def extract_clean_html(
    root: _Node,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
) -> str:
    # always remove technical tags first
    for sel in ALWAYS_REMOVE_TAGS:
        for n in select(root, sel):
            _remove_node(n)

    if include_tags:
        # per-selector document-order clones, concatenated (comments kept —
        # the reference's include branch returns before comment removal)
        parts: list[str] = []
        for selector in include_tags:
            for n in select(root, selector):
                parts.append(serialize_node(n, drop_comments=False))
        return "".join(parts)

    if only_main_content:
        for selector in EXCLUDE_NON_MAIN_TAGS:
            for n in select(root, selector):
                if n.parent is None:  # removed by an earlier selector
                    continue
                if not _find_descendant(n, _FORCE_INCLUDE_PARSED):
                    _remove_node(n)

    if exclude_tags:
        for selector in exclude_tags:
            for n in select(root, selector):
                _remove_node(n)

    return serialize_inner(root, drop_comments=True)


def transform_html(
    html: str,
    base_url: str | None = None,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
    transform_urls: bool = True,
) -> str:
    """Full M3 transform: absolutize URLs then clean/extract
    (HTMLTransformer.ts transformHtml :176-187)."""
    root = parse_html(html, keep_comments=True)
    if transform_urls and base_url:
        transform_relative_urls(root, base_url)
    return extract_clean_html(
        root,
        include_tags=include_tags,
        exclude_tags=exclude_tags,
        only_main_content=only_main_content,
    )
