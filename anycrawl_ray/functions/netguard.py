"""Network guards: webhook SSRF private-IP check + client-IP allowlisting.

Deterministic transcriptions of the reference's two IP utilities (SURVEY.md
§2.8 scalar row):

- ``is_private_ip_url`` — reference ``packages/scrape/src/managers/
  Webhook.ts:9-46``: localhost names, RFC-1918 IPv4 ranges, link-local
  169.254/16, IPv6 link-local (fe80:) and unique-local (fc../fd..);
  an unparseable URL is treated as unsafe (returns True).
- ``get_client_ip`` / ``is_ip_allowed`` — reference ``apps/api/src/utils/
  ipUtils.ts``: proxy-header priority (cf-connecting-ip, first hop of
  x-forwarded-for, x-real-ip, transport fallback) and exact-or-CIDR
  allowlist matching (empty allowlist allows all; unknown IP denied).

CIDR containment uses the stdlib ``ipaddress`` module — observable semantics
(exact match or network membership, invalid patterns never match) are what
the reference's hand-rolled ipToNumber/mask math computes.
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import urlsplit

_PRIVATE_V4 = (
    re.compile(r"^10\."),                         # 10.0.0.0/8
    re.compile(r"^172\.(1[6-9]|2[0-9]|3[0-1])\."),  # 172.16.0.0/12
    re.compile(r"^192\.168\."),                   # 192.168.0.0/16
    re.compile(r"^169\.254\."),                   # link-local
    # strictness extensions beyond Webhook.ts:14-17 (which checks only the
    # literal 127.0.0.1): the whole loopback /8 and the unspecified address
    # are equally unsafe SSRF targets
    re.compile(r"^127\."),                        # 127.0.0.0/8
    re.compile(r"^0\.0\.0\.0$"),
)


def is_private_ip_url(url: str) -> bool:
    """True if the webhook target resolves to a private/loopback host —
    deliveries to such targets are blocked (SSRF guard)."""
    try:
        hostname = (urlsplit(url).hostname or "").strip("[]").lower()
        if not hostname:
            return True
        if hostname in ("localhost", "127.0.0.1", "::1"):
            return True
        for rng in _PRIVATE_V4:
            if rng.match(hostname):
                return True
        if ":" in hostname:
            if hostname.startswith("fe80:") or hostname.startswith("fc") or \
                    hostname.startswith("fd"):
                return True
        return False
    except (ValueError, AttributeError):
        return True  # unparseable -> potentially unsafe


def get_client_ip(headers: dict[str, str], transport_ip: str | None = None) -> str | None:
    """Client IP with proxy-header priority (header keys case-insensitive)."""
    h = {k.lower(): v for k, v in headers.items()}
    cf = h.get("cf-connecting-ip")
    if cf and cf.strip():
        return cf.strip()
    fwd = h.get("x-forwarded-for")
    if fwd:
        first = fwd.split(",")[0].strip()
        if first:
            return first
    real = h.get("x-real-ip")
    if real and real.strip():
        return real.strip()
    return transport_ip or None


def _matches_pattern(ip: str, pattern: str) -> bool:
    if ip == pattern:
        return True
    if "/" in pattern:
        try:
            return ipaddress.ip_address(ip) in ipaddress.ip_network(pattern, strict=False)
        except ValueError:
            return False
    return False


def is_ip_allowed(ip: str | None, whitelist: list[str] | None) -> bool:
    """Empty/None allowlist allows everyone; unknown IP is denied."""
    if not whitelist:
        return True
    if not ip:
        return False
    return any(_matches_pattern(ip, p) for p in whitelist)
