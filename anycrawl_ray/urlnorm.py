"""URL canonicalization — the identity function of the URL-seen set.

Mirrors the reference's WHATWG-``new URL(href, base).href`` behaviour as used by
the crawl coordinator + HTML transformer:

- malformed-scheme repair ``http:/x`` -> ``http://x``
  (reference packages/scrape/src/core/transformers/HTMLTransformer.ts:514-532)
- relative-URL resolution against the page URL
  (reference packages/scrape/src/core/DataExtractor.ts:490-494 via
  crawlee ``extractUrlsFromCheerio($, 'a[href]', baseUrl)``)
- the coordinator's ``visited`` set compares full resolved URL strings —
  fragments are KEPT (reference packages/scrape/src/utils/crawlCoordinator.ts:43-44);
  only the map/dedup path strips fragments
  (reference packages/scrape/src/services/MapService.ts:271-273).

Both the conformance reference model (``refmodel.py``) and the Ray pipeline
(``pipelines/crawl.py``) call exactly these functions, so seen-set identity is
byte-for-byte shared.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def repair_scheme(url: str) -> str:
    """``http:/example.com`` -> ``http://example.com`` (and https variant).

    reference packages/scrape/src/core/transformers/HTMLTransformer.ts:516-522
    """
    if url.startswith("http:/") and not url.startswith("http://"):
        return "http://" + url[6:]
    if url.startswith("https:/") and not url.startswith("https://"):
        return "https://" + url[7:]
    return url


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 / WHATWG path normalization: resolve "." and ".."
    segments of an ABSOLUTE path ('..' at the root is ignored; a trailing
    dot segment leaves a trailing slash)."""
    segments = path.split("/")
    out: list[str] = []
    last = len(segments) - 1
    for i, seg in enumerate(segments):
        if seg == ".":
            if i == last:
                out.append("")
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            if i == last:
                out.append("")
            continue
        out.append(seg)
    return "/".join(out) or "/"


def canonicalize_url(href: str, base: str | None = None) -> str:
    """Resolve ``href`` against ``base`` and normalize like WHATWG URL.href.

    Normalizations applied (all of which ``new URL(...).href`` performs):
    lowercase scheme+host, strip default port, empty path -> "/", dot-segment
    removal (also for ALREADY-absolute hrefs, which urljoin alone does not
    normalize — round-1 ADVICE), keep query and fragment verbatim. On
    unparsable input, returns the input unchanged
    (reference HTMLTransformer.ts:527-531 returns the original URL on failure).
    """
    href = repair_scheme(href.strip())
    try:
        resolved = urljoin(base, href) if base else href
        parts = urlsplit(resolved)
        if not parts.scheme or not parts.netloc:
            return href
        scheme = parts.scheme.lower()
        netloc = parts.netloc
        host, sep, port = netloc.partition(":")
        host = host.lower()
        if sep and port == _DEFAULT_PORTS.get(scheme, None):
            netloc = host
        elif sep:
            netloc = f"{host}:{port}"
        else:
            netloc = host
        path = parts.path or "/"
        if "/." in path:
            path = _remove_dot_segments(path)
        out = urlunsplit((scheme, netloc, path, parts.query, parts.fragment))
        # WHATWG href KEEPS bare '?' / '#' markers (new URL('http://x#').href
        # is 'http://x/#'); urlunsplit — and urljoin before it — drop empty
        # components, so recover the markers from the ORIGINAL href (urljoin
        # never inherits query/fragment from the base) or, for href='',
        # from the base-as-resolved
        pre_frag = resolved.split("#", 1)[0]
        href_pre = href.split("#", 1)[0]
        if parts.query == "" and (href_pre.endswith("?") or pre_frag.endswith("?")):
            out = out.replace("#", "?#", 1) if "#" in out else out + "?"
        if parts.fragment == "" and ("#" in href or "#" in resolved):
            out += "#"
        return out
    except ValueError:
        return href


def strip_fragment(url: str) -> str:
    """``url.split('#')[0]`` — map-path dedup identity.

    reference packages/scrape/src/services/MapService.ts:271-273
    """
    return url.split("#", 1)[0]


def hostname_of(url: str) -> str:
    """Hostname (no port), lowercased; '' on failure.

    reference packages/scrape/src/utils/crawlCoordinator.ts:144-145
    """
    try:
        host = urlsplit(url).hostname
        return host or ""
    except ValueError:
        return ""


def origin_of(url: str) -> str:
    """scheme://host[:non-default-port] — WHATWG ``URL.origin``.

    reference packages/scrape/src/utils/crawlCoordinator.ts:147-148
    """
    try:
        parts = urlsplit(url)
        if not parts.scheme or not parts.hostname:
            return ""
        scheme = parts.scheme.lower()
        host = parts.hostname.lower()
        port = parts.port
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
            return f"{scheme}://{host}:{port}"
        return f"{scheme}://{host}"
    except ValueError:
        return ""


def base_domain_of(url: str) -> str:
    """Registrable-ish domain: last two labels of the hostname.

    reference packages/scrape/src/services/MapService.ts:325-329 (naive
    two-label heuristic; no PSL in the reference either).
    """
    host = hostname_of(url)
    if not host:
        return ""
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


# ---------------------------------------------------------------------------
# Batch fast paths — semantically identical to the scalar functions above
# (conformance tests pin pipeline == reference model, which uses the scalar
# path), but avoid urlsplit's ~30µs/url cost on the crawl hot loop.
# ---------------------------------------------------------------------------

# An absolute URL that is ALREADY in canonical form: lowercase scheme+host,
# no default-port suffix handled below, non-empty path, no dot segments.
_ABS_RE = re.compile(
    r"^(https?)://([a-z0-9][a-z0-9.-]*)(?::(\d+))?((?:/[^?#]*)?)(\?[^#]*)?(#.*)?$"
)


def canonicalize_links(hrefs: list[str], base: str | None) -> list[str]:
    """Canonicalize many hrefs against ONE base (a page's outlinks).

    Fast paths cover the overwhelmingly common shapes (already-absolute http
    URLs, site-relative ``/path`` links, ``http:/`` scheme repairs); anything
    else falls back to :func:`canonicalize_url`. Byte-identical output to the
    scalar function (pinned by tests).
    """
    base_m = _ABS_RE.match(base) if base else None
    if base_m:
        b_scheme, b_host, b_port = base_m.group(1), base_m.group(2), base_m.group(3)
        if b_port and b_port != _DEFAULT_PORTS.get(b_scheme):
            b_origin = f"{b_scheme}://{b_host}:{b_port}"
        else:
            b_origin = f"{b_scheme}://{b_host}"
    else:
        b_origin = None

    out = []
    for href in hrefs:
        h = repair_scheme(href.strip())
        if h.startswith("http"):
            m = _ABS_RE.match(h)
            # "/." catches every dot-segment shape ("/./", "/..", trailing
            # "/.") — those fall back to the scalar path, which normalizes
            if m and "/." not in (m.group(4) or ""):
                scheme, host, port, path, query, frag = m.groups()
                if port and port == _DEFAULT_PORTS.get(scheme):
                    port = None
                netloc = f"{host}:{port}" if port else host
                out.append(
                    f"{scheme}://{netloc}{path or '/'}{query or ''}{frag or ''}"
                )
                continue
        elif b_origin and h.startswith("/") and not h.startswith("//"):
            if "/." not in h:
                out.append(b_origin + h)
                continue
        out.append(canonicalize_url(href, base))
    return out


# scheme optional: protocol-relative "//host/x" also carries a hostname
_HOST_EXTRACT = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?(?P<host>[^/?#:]+)"


def hosts_of_batch(urls: list[str] | pa.Array) -> np.ndarray:
    """Vectorized hostname extraction ('' where unparsable) — matches
    :func:`hostname_of` on http(s) URLs."""
    arr = urls if isinstance(urls, pa.Array) else pa.array(urls, pa.string())
    ex = pc.extract_regex(arr, _HOST_EXTRACT)
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    return np.asarray(host.fill_null(""))


def origins_of_batch(urls: list[str]) -> list[str]:
    """Vectorized-ish origin extraction — matches :func:`origin_of`."""
    return [origin_of(u) for u in urls]


def matches_strategy_batch(
    urls: list[str], hosts: np.ndarray, seed_url: str, strategy: str
) -> np.ndarray:
    """Vectorized strategy filter == [matches_strategy(u, seed, s) for u]."""
    seed_host = hostname_of(seed_url)
    valid = hosts != ""
    if not seed_host:
        return np.zeros(len(urls), dtype=bool)
    if strategy in ("same-domain", "same-hostname"):
        return valid & (hosts == seed_host)
    if strategy == "same-origin":
        seed_origin = origin_of(seed_url)
        return valid & np.array(
            [origin_of(u) == seed_origin for u in urls], dtype=bool
        )
    return valid  # "all"


def matches_strategy(url: str, seed_url: str, strategy: str) -> bool:
    """Crawl-scope strategy filter.

    reference packages/scrape/src/utils/crawlCoordinator.ts:138-153
    (note: the coordinator's "same-domain" compares *hostnames* — transcribed
    faithfully; enum packages/libs/src/types/CrawlSchema.ts:43 also has
    same-hostname which the engine path maps to Crawlee's same-hostname).
    """
    seed_host = hostname_of(seed_url)
    url_host = hostname_of(url)
    if not seed_host or not url_host:
        return False
    if strategy == "same-domain":
        return url_host == seed_host
    if strategy == "same-hostname":
        return url_host == seed_host
    if strategy == "same-origin":
        return origin_of(url) == origin_of(seed_url)
    return True  # "all"
