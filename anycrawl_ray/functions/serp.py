"""SERP HTML parser (M15) — fixture-backed, stdlib only (no cheerio).

Transcribed selector semantics from reference
packages/search/src/engines/Google.ts:201-257:
- result block:  div[jscontroller="SC7lYd"]
- title:         first  a > h3  text (trimmed); skip block if absent
- url:           href of the <a> wrapping that h3; skip if empty
- description:   text of div[data-sncf="1"] with <script> removed; skip if empty
- emitted shape: {category: web, title, url, description, source}

Pagination math (O4) from SearchService.ts:219-229: pages = ceil(limit/10)
capped at 20; final slice(0, limit).

Implemented as a small stack-based HTML walker (html.parser) so it handles
nested divs correctly; runs per-row inside map_batches.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _Node:
    __slots__ = ("tag", "attrs", "children", "content", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        # document-ordered mix of ("t", str) and ("n", _Node) — order matters
        # for markdown conversion and span interleaving
        self.content: list[tuple[str, object]] = []
        self.parent = parent

    def text(self, skip_tags: frozenset = frozenset({"script", "style"})) -> str:
        if self.tag in skip_tags:
            return ""
        parts = []
        for kind, payload in self.content:
            if kind == "t":
                parts.append(payload)
            elif kind == "n":
                parts.append(payload.text(skip_tags))
            # "c" (comment, keep_comments=True trees) contributes no text
        return "".join(parts)

    def find_all(self, pred) -> list["_Node"]:
        out = []
        if pred(self):
            out.append(self)
        for c in self.children:
            out.extend(c.find_all(pred))
        return out


_VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        self.cur.content.append(("n", node))
        if tag not in _VOID:
            self.cur = node

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.content.append(("t", data))


class _CommentTreeBuilder(_TreeBuilder):
    """Tree builder that also records comments as ("c", text) content entries
    (needed by the HTML transformer, which must strip them from the cleaned
    output but keep them inside include_tags clones — HTMLTransformer.ts
    doExtractCleanHtml comment filter)."""

    def handle_comment(self, data):
        self.cur.content.append(("c", data))


def parse_html(html: str, keep_comments: bool = False) -> _Node:
    b = _CommentTreeBuilder() if keep_comments else _TreeBuilder()
    b.feed(html)
    return b.root


def parse_serp(html: str) -> list[dict]:
    """Google.ts parse(): one dict per valid result block, document order."""
    root = parse_html(html)
    results = []
    for block in root.find_all(
        lambda n: n.tag == "div" and n.attrs.get("jscontroller") == "SC7lYd"
    ):
        h3s = [
            h for h in block.find_all(lambda n: n.tag == "h3")
            if h.parent is not None and h.parent.tag == "a"
        ]
        if not h3s:
            continue
        title = h3s[0].text().strip()
        url = h3s[0].parent.attrs.get("href", "")
        if not url:
            continue
        content_nodes = block.find_all(
            lambda n: n.tag == "div" and n.attrs.get("data-sncf") == "1"
        )
        content = "".join(n.text() for n in content_nodes).strip()
        if not content:
            continue
        results.append(
            {
                "category": "web",
                "title": title,
                "url": url,
                "description": content,
                "source": "Google Search Result",
            }
        )
    return results


def effective_pages(limit: int, per_page: int = 10, max_pages: int = 20) -> int:
    """SearchService.ts:219-229."""
    return min(max(1, -(-limit // per_page)), max_pages)


def reassemble_pages(pages: list[tuple[int, list[dict]]], limit: int) -> list[dict]:
    """Concurrent page fetches reassembled in page order, then slice(0, limit)
    (SearchService.ts:280-306)."""
    out: list[dict] = []
    for _, results in sorted(pages, key=lambda p: p[0]):
        out.extend(results)
    return out[:limit]
