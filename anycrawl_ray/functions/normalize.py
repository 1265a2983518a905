"""Content normalization for change monitoring (M16/M17).

Transcribed semantics from reference packages/scrape/src/monitor/normalize.ts:
- stripVolatileFields (:14-20): drop timestamp/screenshot keys
- pickContentField (:26-32): markdown -> text -> html -> rawHtml priority
- applyIgnoreSelectors (:40-48): drop lines containing any selector substring
- normalizeWhitespace (:55-57): collapse 3+ newlines to 2, trim
- hashContent (:84-86): sha256 hex of normalized utf-8
- truncateForStorage (:92-96): 256 KB cap + marker

Used per-row inside ``map_batches`` (pure, vectorizes by mapping over a
string column); the 256 KB cap mirrors config.monitor.maxInlineContentChars
(reference packages/libs/src/config.ts:89-91).
"""

from __future__ import annotations

import hashlib
import re

VOLATILE_KEYS = frozenset({"timestamp", "screenshot", "screenshot@fullPage"})
MAX_INLINE_CHARS = 256 * 1024  # reference config.ts:89-91 default

_BLANKS = re.compile(r"\n{3,}")


def strip_volatile_fields(data: dict) -> dict:
    return {k: v for k, v in data.items() if k not in VOLATILE_KEYS}


def pick_content_field(data: dict) -> str:
    for key in ("markdown", "text", "html", "rawHtml"):
        v = data.get(key)
        if isinstance(v, str) and v.strip():
            return v
    return ""


def apply_ignore_selectors(content: str, ignore_selectors: list[str]) -> str:
    if not ignore_selectors:
        return content
    lines = content.split("\n")
    return "\n".join(
        line for line in lines if not any(sel in line for sel in ignore_selectors)
    )


def normalize_whitespace(text: str) -> str:
    return _BLANKS.sub("\n\n", text).strip()


def normalize_content(data: dict, ignore_selectors: list[str] | None = None) -> str:
    clean = strip_volatile_fields(data)
    content = pick_content_field(clean)
    if ignore_selectors:
        content = apply_ignore_selectors(content, ignore_selectors)
    return normalize_whitespace(content)


def hash_content(normalized: str) -> str:
    return hashlib.sha256(normalized.encode("utf-8")).hexdigest()


def hash_content_md5(normalized: str) -> str:
    """md5 variant for DuckDB-oracle parity (duckdb ships md5())."""
    return hashlib.md5(normalized.encode("utf-8")).hexdigest()


def truncate_for_storage(content: str, max_chars: int = MAX_INLINE_CHARS) -> str:
    if len(content) <= max_chars:
        return content
    return content[:max_chars] + "\n…[truncated]"
