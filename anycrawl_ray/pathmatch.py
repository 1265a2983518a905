"""include/exclude URL-path matching: minimatch-style globs + /regex/flags.

Semantics transcribed from:
- reference packages/scrape/src/utils/crawlCoordinator.ts:155-168
  (``matchesPaths``: exclude wins, then include-any, empty include = pass;
  minimatch with ``{dot: true}`` against the FULL URL string)
- reference packages/scrape/src/engines/Base.ts:391-417
  (``/pattern/flags`` regex-literal support; invalid regex falls back to glob)

Matchers compile once (broadcast to tasks) — the hot path is a compiled-regex
scan over a batch of URLs.
"""

from __future__ import annotations

import re
from functools import lru_cache

_REGEX_LITERAL = re.compile(r"^/(.*)/([gimsuy]*)$", re.DOTALL)

# JS RegExp flag -> Python re flag (g/y have no Python equivalent for .search)
_FLAG_MAP = {"i": re.IGNORECASE, "m": re.MULTILINE, "s": re.DOTALL, "u": 0, "g": 0, "y": 0}


def _glob_to_regex(pattern: str) -> str:
    """minimatch subset: ``**`` crosses ``/``, ``*``/``?`` do not; char classes;
    ``{a,b}`` brace alternation. ``dot: true`` => no special-casing of leading dots.
    """
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern.startswith("**", i):
                out.append(".*")
                i += 2
                # collapse "**/" -> also match zero path segments
                if i < n and pattern[i] == "/":
                    out.append("/?")
                    i += 1
            else:
                out.append("[^/]*")
                i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))
                i += 1
            else:
                body = pattern[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j + 1
        elif c == "{":
            j = pattern.find("}", i)
            if j == -1:
                out.append(re.escape(c))
                i += 1
            else:
                alts = pattern[i + 1 : j].split(",")
                out.append("(?:" + "|".join(_glob_to_regex(a) for a in alts) + ")")
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


@lru_cache(maxsize=4096)
def compile_pattern(pattern: str) -> tuple[re.Pattern, bool]:
    """Compile one include/exclude pattern.

    Returns (compiled, is_regex_literal). Regex literals are *searched*
    (JS ``RegExp.test``); globs are *fully matched* (minimatch).
    """
    m = _REGEX_LITERAL.match(pattern)
    if m:
        body, flags = m.group(1), m.group(2)
        py_flags = 0
        for f in flags:
            py_flags |= _FLAG_MAP.get(f, 0)
        try:
            return re.compile(body, py_flags), True
        except re.error:
            pass  # invalid regex -> treat as glob (Base.ts:404-406)
    return re.compile(_glob_to_regex(pattern) + r"\Z"), False


def _matches_one(url: str, pattern: str) -> bool:
    rx, is_regex = compile_pattern(pattern)
    return bool(rx.search(url) if is_regex else rx.match(url))


def matches_paths(url: str, include: list[str], exclude: list[str]) -> bool:
    """exclude-any -> False; include non-empty and no include matches -> False.

    reference packages/scrape/src/utils/crawlCoordinator.ts:155-168
    """
    if exclude and any(_matches_one(url, p) for p in exclude):
        return False
    if include:
        return any(_matches_one(url, p) for p in include)
    return True


class PathMatcher:
    """Pre-compiled vectorizable matcher for batch link filtering."""

    def __init__(self, include: list[str], exclude: list[str]):
        self.include = [compile_pattern(p) for p in include]
        self.exclude = [compile_pattern(p) for p in exclude]

    def match_many(self, urls) -> list[bool]:
        out = []
        for u in urls:
            ok = True
            for rx, is_regex in self.exclude:
                if rx.search(u) if is_regex else rx.match(u):
                    ok = False
                    break
            if ok and self.include:
                ok = False
                for rx, is_regex in self.include:
                    if rx.search(u) if is_regex else rx.match(u):
                        ok = True
                        break
            out.append(ok)
        return out
