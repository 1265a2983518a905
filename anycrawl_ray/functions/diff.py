"""Text / JSON / price diff operators for monitoring (M18/M19).

Transcribed from reference packages/scrape/src/monitor/diff.ts:
- textDiff (:24-47): LCS line diff -> unified hunks + change ratio
- computeLineDiff (:63-125): DP edit distance + backtrack, hunk collapse
- renderUnifiedDiff (:129-158): ±3 context lines
- priceDiff (:170-201): recursive JSON field diff with numeric deltas
- classifyPriceChange (:217-261): price_up/price_down/stock/content

In the pipeline these run per-row after the monitor as-of self-join
(groupby(url) sort(captured_at) pairwise — SURVEY.md §2.4 J5).
"""

from __future__ import annotations

from dataclasses import dataclass
import re

CONTEXT = 3

_MISSING = object()  # JS `undefined` for absent array elements / keys


@dataclass
class TextDiffResult:
    changed: bool
    diff_text: str
    ratio: float


@dataclass
class Hunk:
    prev_start: int
    del_count: int
    next_start: int
    add_count: int


def compute_line_diff(prev: list[str], next_: list[str]) -> list[Hunk]:
    m, n = len(prev), len(next_)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if prev[i - 1] == next_[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = 1 + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])

    ops: list[tuple[str, int, int]] = []  # (type, prev_idx, next_idx)
    i, j = m, n
    while i > 0 or j > 0:
        if i > 0 and j > 0 and prev[i - 1] == next_[j - 1]:
            ops.append(("keep", i - 1, j - 1))
            i -= 1
            j -= 1
        elif j > 0 and (i == 0 or dp[i][j - 1] <= dp[i - 1][j]):
            ops.append(("add", i, j - 1))
            j -= 1
        else:
            ops.append(("del", i - 1, j))
            i -= 1
    ops.reverse()

    hunks: list[Hunk] = []
    k = 0
    while k < len(ops):
        typ, pi, ni = ops[k]
        if typ == "keep":
            k += 1
            continue
        h = Hunk(prev_start=pi, del_count=0, next_start=ni, add_count=0)
        while k < len(ops) and ops[k][0] != "keep":
            if ops[k][0] == "del":
                h.del_count += 1
            else:
                h.add_count += 1
            k += 1
        hunks.append(h)
    return hunks


def render_unified_diff(hunks: list[Hunk], prev: list[str], next_: list[str]) -> str:
    if not hunks:
        return ""
    lines: list[str] = []
    for h in hunks:
        ctx_start = max(0, h.prev_start - CONTEXT)
        ctx_end = min(len(prev), h.prev_start + h.del_count + CONTEXT)
        a_start = ctx_start + 1
        a_len = ctx_end - ctx_start
        b_start = h.next_start - (h.prev_start - ctx_start) + 1
        b_len = a_len - h.del_count + h.add_count
        lines.append(f"@@ -{a_start},{a_len} +{b_start},{b_len} @@")
        for p in range(ctx_start, h.prev_start):
            lines.append(f" {prev[p]}")
        for p in range(h.prev_start, h.prev_start + h.del_count):
            lines.append(f"-{prev[p]}")
        for q in range(h.next_start, h.next_start + h.add_count):
            lines.append(f"+{next_[q]}")
        for p in range(h.prev_start + h.del_count, ctx_end):
            lines.append(f" {prev[p]}")
    return "\n".join(lines)


def text_diff(prev: str, next_: str) -> TextDiffResult:
    if prev == next_:
        return TextDiffResult(False, "", 0.0)
    prev_lines = prev.split("\n")
    next_lines = next_.split("\n")
    hunks = compute_line_diff(prev_lines, next_lines)
    diff_text = render_unified_diff(hunks, prev_lines, next_lines)
    changed_lines = sum(max(h.del_count, h.add_count) for h in hunks)
    total = max(len(prev_lines), len(next_lines), 1)
    return TextDiffResult(True, diff_text, min(changed_lines / total, 1.0))


@dataclass
class FieldDiff:
    path: str
    from_: object
    to: object
    delta: float | None = None


def _build_diff(path: str, from_, to) -> FieldDiff:
    d = FieldDiff(path, from_, to)
    if isinstance(from_, (int, float)) and not isinstance(from_, bool) and isinstance(
        to, (int, float)
    ) and not isinstance(to, bool):
        d.delta = to - from_
    return d


def price_diff(prev, next_, path: str = "") -> list[FieldDiff]:
    if prev is None and next_ is None:
        return []
    js_type_differs = (_js_type(prev) != _js_type(next_)) or (
        (prev is None) != (next_ is None)
    )
    if js_type_differs:
        return [_build_diff(path or "root", prev, next_)]
    if not isinstance(prev, (dict, list)):
        return [] if prev == next_ else [_build_diff(path or "root", prev, next_)]
    if isinstance(prev, list) and isinstance(next_, list):
        diffs: list[FieldDiff] = []
        for i in range(max(len(prev), len(next_))):
            p = f"{path}[{i}]"
            if i >= len(prev):
                diffs.append(_build_diff(p, None, next_[i]))
            elif i >= len(next_):
                diffs.append(_build_diff(p, prev[i], None))
            else:
                diffs.extend(price_diff(prev[i], next_[i], p))
        return diffs
    keys = set(prev) | set(next_)
    diffs = []
    for key in keys:
        p = f"{path}.{key}" if path else key
        diffs.extend(price_diff(prev.get(key), next_.get(key), p))
    return diffs


def _js_type(v) -> str:
    """typeof-equivalent for the diff's type comparison (diff.ts:172)."""
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if v is None:
        return "object"  # typeof null === 'object'
    return "object"


_PRICE_PATH_RE = re.compile(r"price|cost|amount|rate", re.IGNORECASE)
_STOCK_PATH_RE = re.compile(r"stock|inventory|available|quantity", re.IGNORECASE)


def classify_price_change(
    diffs: list[FieldDiff], price_change_pct: float = 0.0
) -> str | None:
    has_up = has_down = has_stock = False
    for d in diffs:
        if _STOCK_PATH_RE.search(d.path):
            has_stock = True
            continue
        if (
            _PRICE_PATH_RE.search(d.path)
            and isinstance(d.from_, (int, float))
            and not isinstance(d.from_, bool)
            and isinstance(d.to, (int, float))
            and not isinstance(d.to, bool)
        ):
            pct = abs((d.to - d.from_) / d.from_) * 100 if d.from_ != 0 else 100
            if pct >= price_change_pct:
                if d.delta is not None and d.delta > 0:
                    has_up = True
                elif d.delta is not None and d.delta < 0:
                    has_down = True
    if has_up:
        return "price_up"
    if has_down:
        return "price_down"
    if has_stock:
        return "stock"
    if diffs:
        return "content"
    return None
