"""Page cache: (urlHash, optionsHash, maxAge) keyed result store (S8/J2/T7).

Transcribed key semantics from reference packages/libs/src/cache/index.ts:
- url_hash = sha256(normalized url) (:170-173)
- options_hash = sha256(canonical JSON of the cacheable option subset, with
  sorted formats/tags, engine defaulting, proxy normalization) (:175-210)
- lookup returns the LATEST entry with cached_at > now - max_age
  (reference packages/scrape/src/managers/Cache.ts:46-66)

Storage: a storage.py table (Lance/parquet) instead of Postgres+S3 — the
lookup is the broadcast-small-side hash join of SURVEY.md §2.4 J2, and batch
``lookup_many`` is the anti-join used to skip already-fetched URLs.
"""

from __future__ import annotations

import hashlib
import json
import time

import pyarrow as pa

from .. import storage

CACHE_SCHEMA = pa.schema(
    [
        pa.field("url_hash", pa.string()),
        pa.field("options_hash", pa.string()),
        pa.field("url", pa.string()),
        pa.field("cached_at", pa.float64()),   # epoch seconds
        pa.field("payload", pa.string()),      # result JSON
    ]
)

DEFAULT_MAX_AGE_S = 2 * 24 * 3600  # cache/index.ts DEFAULT_MAX_AGE (2 days)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def normalize_proxy(proxy) -> str:
    """cache/index.ts:175-185."""
    if not proxy:
        return "none"
    if proxy is True:
        return "true"
    if not isinstance(proxy, str):
        return "unknown"
    lowered = proxy.lower()
    if lowered in ("auto", "base", "stealth"):
        return lowered
    return "custom:" + _sha(proxy)[:12]


def compute_cache_key(
    url: str,
    engine: str | None = None,
    formats: list[str] | None = None,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    proxy=None,
    only_main_content: bool = True,
    extract_source: str = "markdown",
    ocr_options: bool = False,
    json_options: dict | None = None,
) -> tuple[str, str]:
    """(url_hash, options_hash) — cache/index.ts:170-210 subset."""
    url_hash = _sha(url)
    cacheable = {
        "engine": engine or "cheerio",
        "formats": sorted(formats or ["markdown"]),
        "json_options": json.dumps(json_options, sort_keys=True) if json_options else None,
        "include_tags": sorted(include_tags) if include_tags else None,
        "exclude_tags": sorted(exclude_tags) if exclude_tags else None,
        "only_main_content": only_main_content,
        "extract_source": extract_source,
        "ocr_options": ocr_options,
        "proxy": normalize_proxy(proxy),
    }
    options_hash = _sha(json.dumps(cacheable, sort_keys=True))
    return url_hash, options_hash


class PageCache:
    """In-memory index + storage-backed persistence of cached page results."""

    def __init__(self):
        self._rows: list[dict] = []

    def save(self, url: str, payload: str, now: float | None = None, **key_kwargs) -> None:
        uh, oh = compute_cache_key(url, **key_kwargs)
        self._rows.append(
            {
                "url_hash": uh,
                "options_hash": oh,
                "url": url,
                "cached_at": now if now is not None else time.time(),
                "payload": payload,
            }
        )

    def lookup(
        self, url: str, max_age_s: float = DEFAULT_MAX_AGE_S,
        now: float | None = None, **key_kwargs,
    ) -> dict | None:
        """Latest non-expired entry for (url_hash, options_hash) or None
        (Cache.ts:46-66)."""
        uh, oh = compute_cache_key(url, **key_kwargs)
        now = now if now is not None else time.time()
        best = None
        for r in self._rows:
            if r["url_hash"] == uh and r["options_hash"] == oh:
                if r["cached_at"] > now - max_age_s:
                    if best is None or r["cached_at"] > best["cached_at"]:
                        best = r
        return best

    def lookup_many(self, urls: list[str], max_age_s: float = DEFAULT_MAX_AGE_S,
                    now: float | None = None, **key_kwargs) -> list[bool]:
        """Anti-join mask: True where a fresh cache entry exists."""
        return [
            self.lookup(u, max_age_s, now, **key_kwargs) is not None for u in urls
        ]

    def to_table(self) -> pa.Table:
        return pa.Table.from_pylist(self._rows, schema=CACHE_SCHEMA)

    def dump(self, uri: str) -> None:
        storage.write_table(self.to_table(), uri)

    @classmethod
    def restore(cls, uri: str) -> "PageCache":
        c = cls()
        c._rows = storage.read_table(uri).to_pylist()
        return c
