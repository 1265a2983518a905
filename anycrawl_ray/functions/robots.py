"""robots.txt parser with RFC 9309 (Robots Exclusion Protocol) semantics.

The crawl CONFORMANCE path keeps the reference model's simple path-prefix
rules (refmodel.robots_disallowed — what the synthetic corpus encodes);
this module is the real-world S9 surface for robots BODIES fetched from
the wild, feeding the politeness cache:

- group selection: the group whose ``User-agent`` token is the LONGEST
  match for the product token wins; ``*`` is the fallback group; multiple
  ``User-agent`` lines stack onto the following rule block (RFC 9309 §2.2.1).
- rules: ``Allow``/``Disallow`` values are path patterns supporting ``*``
  (any chars) and a ``$`` end anchor (§2.2.2/2.2.3).
- evaluation: the longest-matching rule (by pattern octet length) decides;
  ``Allow`` wins a length tie; no match => allowed; empty ``Disallow:``
  matches nothing (§2.2.2).
- extras carried for the cache: ``Crawl-delay`` (de-facto standard; seconds)
  and ``Sitemap:`` lines (global, order-preserved — same contract as
  ``sitemap.parse_robots_sitemaps``).

Batch path: patterns compile once into one alternation-free regex each;
``allowed_batch`` evaluates a URL-path batch without per-row Python parsing
beyond the urlsplit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(seg) for seg in body.split("*")]
    rx = ".*".join(parts)
    return re.compile("^" + rx + ("$" if anchored else ""))


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    # (is_allow, pattern, compiled, octet_len)
    rules: list[tuple[bool, str, re.Pattern, int]] = field(default_factory=list)
    crawl_delay: float | None = None


@dataclass
class RobotsPolicy:
    """Evaluated view for ONE user agent over one robots.txt body."""

    rules: list[tuple[bool, str, re.Pattern, int]] = field(default_factory=list)
    crawl_delay: float | None = None
    sitemaps: list[str] = field(default_factory=list)

    def is_allowed(self, path: str) -> bool:
        path = path or "/"
        best: tuple[int, bool] | None = None  # (octet_len, is_allow)
        for is_allow, _pat, rx, plen in self.rules:
            if rx.match(path):
                if best is None or plen > best[0] or (plen == best[0] and is_allow):
                    best = (plen, is_allow)
        return True if best is None else best[1]

    def allowed_batch(self, paths: list[str]):
        import numpy as np

        return np.fromiter((self.is_allowed(p) for p in paths), bool, len(paths))


_TOKEN_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyz0123456789-_"
)


def _token_matches(agent: str, ua: str) -> bool:
    """RFC 9309 §2.2.1 product-token matching (both already lowercased).

    A group's ``User-agent`` value matches when it equals the crawler's
    product token, or is a prefix of it ending at a non-token character
    (``anycrawl`` matches UA string ``anycrawl/1.2``; ``-`` and ``_`` ARE
    token characters, so ``googlebot`` does NOT capture ``googlebot-image``
    — distinct product tokens). Arbitrary substring containment is NOT a
    match — a hostile group like ``User-agent: a`` or ``User-agent: craw``
    must not capture the ``anycrawl`` UA.
    """
    if agent == ua:
        return True
    if not ua.startswith(agent):
        return False
    nxt = ua[len(agent)]
    return nxt not in _TOKEN_CHARS


def parse_robots(text: str, user_agent: str = "anycrawl") -> RobotsPolicy:
    """Parse one robots.txt body and resolve the group for ``user_agent``."""
    groups: list[RobotsGroup] = []
    sitemaps: list[str] = []
    cur: RobotsGroup | None = None
    in_agent_run = False  # consecutive User-agent lines stack onto one group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if key == "user-agent":
            if cur is None or not in_agent_run:
                cur = RobotsGroup()
                groups.append(cur)
            cur.agents.append(value.lower())
            in_agent_run = True
            continue
        in_agent_run = False
        if cur is None:
            continue  # rules before any User-agent line: ignored (RFC 9309)
        if key in ("allow", "disallow"):
            if not value:
                continue  # empty pattern matches nothing
            cur.rules.append(
                (key == "allow", value, _pattern_to_regex(value), len(value.encode()))
            )
        elif key == "crawl-delay":
            try:
                cur.crawl_delay = float(value)
            except ValueError:
                pass

    ua = user_agent.lower()
    best: tuple[int, RobotsGroup] | None = None  # (match_len, group)
    for g in groups:
        for agent in g.agents:
            if agent == "*":
                if best is None:
                    best = (-1, g)  # fallback, outranked by any token match
            elif agent and _token_matches(agent, ua):
                if best is None or len(agent) > best[0]:
                    best = (len(agent), g)
    if best is None:
        return RobotsPolicy(sitemaps=sitemaps)
    g = best[1]
    return RobotsPolicy(rules=list(g.rules), crawl_delay=g.crawl_delay,
                        sitemaps=sitemaps)


def is_url_allowed(policy: RobotsPolicy, url: str) -> bool:
    try:
        parts = urlsplit(url)
        path = parts.path or "/"
        if parts.query:
            path = f"{path}?{parts.query}"
    except ValueError:
        return True
    return policy.is_allowed(path)
