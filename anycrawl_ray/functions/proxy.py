"""Proxy tier ladder + rotation (T2/T3) — deterministic model of the
reference's proxy subsystem.

Reference semantics transcribed (no network — the "proxies" are opaque URL
strings and the fetch outcome is a caller-provided deterministic function):

- mode -> tier resolution: base = [base] (never upgrades), stealth =
  [stealth, base] (falls back), auto = [base, stealth] (escalates), custom
  URL = single tier, unconfigured pools collapse/fall back
  (reference packages/scrape/src/managers/Proxy.ts:595-726)
- simple counter rotation within a tier (Proxy.ts:671-697
  ``proxyModeRotationIndex++ % proxies.length``)
- per-attempt tier stepping: attempt i (0-based) uses tier min(i, tiers-1),
  one fresh proxy per attempt, retries+1 total attempts, terminal
  HTTP_REQUEST_ERROR after the last
  (reference packages/scrape/src/HttpClient.ts:48-118)

Ray shape: a ``ProxyRotator`` is per-fetch-actor state (built once in
__init__ like the reference's per-process rotation counter); the ladder
computation itself is pure and can annotate fetch batches vectorized.
"""

from __future__ import annotations


def resolve_proxy_mode_with_fallback(
    proxy_value: str | None,
    base_urls: list[str] = (),
    stealth_urls: list[str] = (),
) -> list[list[str]] | None:
    """Proxy.ts:595-646 — mode string (or custom URL) -> ordered tiers."""
    if not proxy_value:
        return None
    base_urls = list(base_urls)
    stealth_urls = list(stealth_urls)
    if proxy_value == "base":
        # base mode never upgrades to stealth
        return [base_urls] if base_urls else None
    if proxy_value == "stealth":
        if not stealth_urls:
            return [base_urls] if base_urls else None
        return [stealth_urls, base_urls] if base_urls else [stealth_urls]
    if proxy_value == "auto":
        if base_urls:
            return [base_urls, stealth_urls] if stealth_urls else [base_urls]
        if stealth_urls:
            return [stealth_urls]
        return None
    return [[proxy_value]]  # custom URL — no fallback


def resolve_proxy_mode(proxy_value, base_urls=(), stealth_urls=()) -> list[str] | None:
    """Proxy.ts:652-662 — primary tier only."""
    tiered = resolve_proxy_mode_with_fallback(proxy_value, base_urls, stealth_urls)
    if not tiered or not tiered[0]:
        return None
    return [u for u in tiered[0] if u is not None]


def can_proxy_fallback(proxy_value: str | None) -> bool:
    """Proxy.ts:704-711 — only stealth and auto modes may step tiers."""
    if not proxy_value:
        return False
    return proxy_value in ("stealth", "auto")


def get_proxy_tier_count(proxy_value, base_urls=(), stealth_urls=()) -> int:
    tiered = resolve_proxy_mode_with_fallback(proxy_value, base_urls, stealth_urls)
    return len(tiered) if tiered else 0


class ProxyRotator:
    """Per-worker rotation state (Proxy.ts:671 module counter; here one per
    fetch actor so rotation is deterministic within a worker)."""

    def __init__(self, base_urls=(), stealth_urls=()):
        self.base_urls = list(base_urls)
        self.stealth_urls = list(stealth_urls)
        self._index = 0

    def get(self, proxy_value: str | None, tier: int = 0) -> str | None:
        """Proxy.ts:676-697 — clamp to last tier, rotate by shared counter."""
        tiered = resolve_proxy_mode_with_fallback(
            proxy_value, self.base_urls, self.stealth_urls
        )
        if not tiered:
            return None
        tier_urls = [u for u in tiered[min(tier, len(tiered) - 1)] if u]
        if not tier_urls:
            return None
        proxy = tier_urls[self._index % len(tier_urls)]
        self._index += 1
        return proxy

    def attempt_ladder(self, proxy_value: str | None, retries: int = 2) -> list[str | None]:
        """HttpClient.ts:48-64 — the proxy each of the retries+1 attempts
        would use: attempt i steps to tier i (clamped), fresh rotation each."""
        return [self.get(proxy_value, tier=i) for i in range(max(1, retries + 1))]


def simulate_request(
    ladder: list[str | None], outcome, require_proxy: bool = True
) -> dict:
    """HttpClient.ts request loop: walk the attempt ladder until
    ``outcome(proxy, attempt_index)`` succeeds; terminal failure raises the
    HTTP_REQUEST_ERROR analog as a status row (no exceptions — this feeds a
    fetch batch column). Returns {ok, attempts, proxy}."""
    last_proxy = None
    for i, proxy in enumerate(ladder, start=1):
        if require_proxy and proxy is None:
            return {"ok": False, "attempts": i, "proxy": None,
                    "error": "PROXY_REQUIRED"}
        last_proxy = proxy
        if outcome(proxy, i):
            return {"ok": True, "attempts": i, "proxy": proxy, "error": None}
    return {"ok": False, "attempts": len(ladder), "proxy": last_proxy,
            "error": "HTTP_REQUEST_ERROR"}
