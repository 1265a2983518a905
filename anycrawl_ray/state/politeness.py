"""Per-host politeness + robots-cache actors (north-rule component).

The reference has NO explicit politeness — a hot host simply occupies crawler
pool slots (SURVEY.md §4.1 "skew: none"; sessions rotate implicitly,
reference packages/scrape/src/core/EngineConfigurator.ts:563-583). Robots
handling exists only on the map path (RobotsTxtFile.find ->
getSitemaps, reference services/MapService.ts:172-201). The rebuild makes
both explicit, as the design demands at 10^10-URL scale:

- hosts are hash-sharded across N ``PolitenessShard`` actors
  (``shard = stable_hash64(host) % n_shards`` — same routing discipline as
  the seen-set, SURVEY.md §7.4)
- each shard holds, per host: a token bucket (capacity = burst, refill =
  1000/crawl_delay_ms tokens/sec) and the parsed robots rules + sitemap list
  (the per-host caches the reference keeps in Redis: DomainCache
  utils/DomainCache.ts:1-41, ProxyCacheManager managers/ProxyCacheManager.ts)
- ``admit(hosts, now)`` answers which fetches may proceed this instant;
  denied rows stay at the frontier head (Frontier.pop_wave defers in order)
- ``allowed(urls)`` answers robots path rules; ``sitemaps(host)`` serves the
  map pipeline's sitemap discovery (S9)

The deterministic conformance path uses ``CrawlOptions.per_host_cap`` +
``robots`` applied synchronously (refmodel.form_wave / robots_disallowed) so
the oracle stays single-threaded; these actors are the scale path, and
``admit``'s token-bucket semantics degrade to exactly ``per_host_cap`` per
round when ``now`` advances one period per round (tested).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import ray

from ..urlnorm import hostname_of
from .seen import stable_hash64


class PolitenessCore:
    """Plain-Python shard logic (actor-wrapped below)."""

    def __init__(
        self,
        shard_id: int,
        robots_table: pa.Table | None = None,
        default_rate_per_sec: float = 10.0,
        burst: float = 4.0,
    ):
        self.shard_id = shard_id
        self.default_rate = default_rate_per_sec
        self.burst = burst
        self.tokens: dict[str, float] = {}
        self.last: dict[str, float] = {}
        self.rules: dict[str, dict] = {}
        if robots_table is not None:
            self.load_robots(robots_table)

    # -- robots cache (S9) ----------------------------------------------
    def _delay_to_rate(self, delay_sec) -> float:
        """Untrusted Crawl-delay -> token rate. Clamp to a sane positive
        window (0 < delay <= 3600 s); anything else (negative, zero, inf,
        NaN, denormal like 1e-300) is ignored so a hostile robots.txt can
        neither starve a host's bucket forever nor unbound its rate."""
        try:
            d = float(delay_sec)
        except (TypeError, ValueError):
            return self.default_rate
        if not (1e-3 <= d <= 3600.0):
            return self.default_rate
        return 1.0 / d

    def load_robots(self, table: pa.Table) -> None:
        for row in table.to_pylist():
            rate = (
                self._delay_to_rate(row["crawl_delay_ms"] / 1000.0)
                if row.get("crawl_delay_ms")
                else self.default_rate
            )
            self.rules[row["host"]] = {
                "disallow": list(row.get("disallow") or []),
                "rate": rate,
                "sitemaps": list(row.get("sitemaps") or []),
            }

    def load_robots_text(self, host: str, text: str,
                         user_agent: str = "anycrawl") -> None:
        """Full RFC 9309 robots BODY for a host (the real-world S9 path):
        wildcard Allow/Disallow with longest-match precedence, Crawl-delay
        feeding the token bucket, Sitemap lines into the cache. Takes
        precedence over the prefix-rule table for that host."""
        from ..functions.robots import parse_robots

        policy = parse_robots(text, user_agent)
        rate = (
            self._delay_to_rate(policy.crawl_delay)
            if policy.crawl_delay is not None
            else self.default_rate
        )
        entry = self.rules.setdefault(host, {"disallow": [], "rate": rate,
                                             "sitemaps": []})
        entry["policy"] = policy
        entry["rate"] = rate
        if policy.sitemaps:
            entry["sitemaps"] = list(policy.sitemaps)

    def allowed(self, urls: list[str]) -> np.ndarray:
        """Robots check: hosts with a parsed RFC 9309 policy use full
        longest-match semantics; prefix-rule hosts keep the reference
        model's startswith semantics (refmodel.robots_disallowed — the
        crawl conformance contract)."""
        out = np.ones(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            rule = self.rules.get(hostname_of(u))
            if not rule:
                continue
            policy = rule.get("policy")
            if policy is not None:
                from ..functions.robots import is_url_allowed

                out[i] = is_url_allowed(policy, u)
                continue
            if not rule["disallow"]:
                continue
            try:
                path = urlsplit(u).path or "/"
            except ValueError:
                continue
            if any(path.startswith(p) for p in rule["disallow"]):
                out[i] = False
        return out

    def sitemaps(self, host: str) -> list[str]:
        rule = self.rules.get(host)
        return rule["sitemaps"] if rule else []

    # -- token buckets ---------------------------------------------------
    def _rate(self, host: str) -> float:
        rule = self.rules.get(host)
        return rule["rate"] if rule else self.default_rate

    def admit(self, hosts: list[str], now: float) -> np.ndarray:
        """True where the host bucket has a token at ``now``; admitted rows
        consume one. Callers pass a monotonic clock (or a round counter
        scaled to seconds — deterministic in tests)."""
        out = np.zeros(len(hosts), dtype=bool)
        for i, h in enumerate(hosts):
            rate = self._rate(h)
            cap = self.burst
            tok = min(
                cap, self.tokens.get(h, cap) + (now - self.last.get(h, now)) * rate
            )
            self.last[h] = now
            if tok >= 1.0:
                tok -= 1.0
                out[i] = True
            self.tokens[h] = tok
        return out

    def stats(self) -> dict:
        return {"shard": self.shard_id, "hosts": len(self.tokens), "rules": len(self.rules)}


PolitenessShard = ray.remote(PolitenessCore)


class PolitenessSet:
    """Client facade: routes host batches to shards, reassembles masks."""

    def __init__(self, n_shards: int = 2, robots_table: pa.Table | None = None,
                 default_rate_per_sec: float = 10.0, burst: float = 4.0):
        self.n_shards = n_shards
        self.shards = [
            # num_cpus=0 + SPREAD: same rationale as SeenSet — bookkeeping
            # actors must not participate in CPU-slot gang allocation or
            # concurrent jobs can circular-wait on partial shard gangs.
            PolitenessShard.options(num_cpus=0, scheduling_strategy="SPREAD").remote(
                i, robots_table, default_rate_per_sec, burst
            )
            for i in range(n_shards)
        ]

    def _route_hosts(self, hosts: list[str]) -> list[list[int]]:
        h = stable_hash64(hosts)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        groups: list[list[int]] = [[] for _ in range(self.n_shards)]
        for i, s in enumerate(shard_of):
            groups[s].append(i)
        return groups

    def admit(self, hosts: list[str], now: float) -> np.ndarray:
        if not hosts:
            return np.zeros(0, dtype=bool)
        groups = self._route_hosts(hosts)
        refs, idxs = [], []
        for s, g in enumerate(groups):
            if g:
                refs.append(self.shards[s].admit.remote([hosts[i] for i in g], now))
                idxs.append(g)
        out = np.zeros(len(hosts), dtype=bool)
        for mask, g in zip(ray.get(refs), idxs):
            out[g] = mask
        return out

    def allowed(self, urls: list[str]) -> np.ndarray:
        if not urls:
            return np.zeros(0, dtype=bool)
        hosts = [hostname_of(u) for u in urls]
        groups = self._route_hosts(hosts)
        refs, idxs = [], []
        for s, g in enumerate(groups):
            if g:
                refs.append(self.shards[s].allowed.remote([urls[i] for i in g]))
                idxs.append(g)
        out = np.ones(len(urls), dtype=bool)
        for mask, g in zip(ray.get(refs), idxs):
            out[g] = mask
        return out

    def load_robots_text(self, host: str, text: str,
                         user_agent: str = "anycrawl") -> None:
        """Route a fetched robots.txt body to its host's shard (RFC 9309)."""
        groups = self._route_hosts([host])
        for s, g in enumerate(groups):
            if g:
                ray.get(self.shards[s].load_robots_text.remote(host, text, user_agent))
                return

    def sitemaps(self, host: str) -> list[str]:
        groups = self._route_hosts([host])
        for s, g in enumerate(groups):
            if g:
                return ray.get(self.shards[s].sitemaps.remote(host))
        return []

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
