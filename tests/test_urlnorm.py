"""Unit tests for URL canonicalization — seen-set identity (SURVEY.md §2.8)."""

from anycrawl_ray.urlnorm import (
    base_domain_of,
    canonicalize_url,
    hostname_of,
    matches_strategy,
    origin_of,
    repair_scheme,
    strip_fragment,
)


def test_repair_scheme():
    # reference HTMLTransformer.ts:516-522
    assert repair_scheme("http:/example.com/x") == "http://example.com/x"
    assert repair_scheme("https:/example.com") == "https://example.com"
    assert repair_scheme("http://ok.com") == "http://ok.com"
    assert repair_scheme("ftp:/weird") == "ftp:/weird"


def test_canonicalize_absolute():
    assert canonicalize_url("HTTP://Example.COM") == "http://example.com/"
    assert canonicalize_url("http://example.com:80/a") == "http://example.com/a"
    assert canonicalize_url("https://example.com:443/a") == "https://example.com/a"
    assert canonicalize_url("http://example.com:8080/a") == "http://example.com:8080/a"
    # fragments KEPT (coordinator compares full URL strings, :43-44)
    assert canonicalize_url("http://e.com/a#frag") == "http://e.com/a#frag"
    assert canonicalize_url("http://e.com/a?q=1&b=2") == "http://e.com/a?q=1&b=2"


def test_canonicalize_relative():
    base = "http://h00.example.test/p/0001"
    assert canonicalize_url("/p/0002", base) == "http://h00.example.test/p/0002"
    assert canonicalize_url("../q/x", base) == "http://h00.example.test/q/x"
    assert canonicalize_url("other", base) == "http://h00.example.test/p/other"
    # base fragment does not leak into resolution
    assert canonicalize_url("/p/2", "http://h.test/p/1#x") == "http://h.test/p/2"
    # malformed scheme repaired before resolution
    assert canonicalize_url("http:/h01.test/a", base) == "http://h01.test/a"


def test_canonicalize_garbage_passthrough():
    # HTMLTransformer.ts:527-531: unresolvable input returned unchanged
    assert canonicalize_url("not a url") == "not a url"


def test_fragment_and_host_helpers():
    assert strip_fragment("http://e.com/a#b#c") == "http://e.com/a"
    assert hostname_of("http://A.B.com:8080/x") == "a.b.com"
    assert hostname_of("::::") == ""
    assert origin_of("http://E.com:80/x") == "http://e.com"
    assert origin_of("http://e.com:81/x") == "http://e.com:81"
    assert base_domain_of("http://a.b.example.test/x") == "example.test"


def test_matches_strategy():
    # reference crawlCoordinator.ts:138-153
    seed = "http://h00.example.test/p/0000"
    assert matches_strategy("http://h00.example.test/p/9", seed, "same-domain")
    assert not matches_strategy("http://h01.example.test/p/9", seed, "same-domain")
    assert matches_strategy("http://anything.else/x", seed, "all")
    assert matches_strategy("http://h00.example.test:80/x", seed, "same-origin")
    assert not matches_strategy("https://h00.example.test/x", seed, "same-origin")
    assert not matches_strategy("not a url", seed, "all")  # parse failure -> False


def test_dot_segment_normalization_absolute():
    """WHATWG new URL(...).href resolves dot segments even for already-
    absolute hrefs (urljoin alone does not — round-1 ADVICE)."""
    assert canonicalize_url("http://h/a/../b") == "http://h/b"
    assert canonicalize_url("http://h/a/./b") == "http://h/a/b"
    assert canonicalize_url("http://h/a/.") == "http://h/a/"
    assert canonicalize_url("http://h/a/..") == "http://h/"
    assert canonicalize_url("http://h/..") == "http://h/"
    assert canonicalize_url("http://h/./") == "http://h/"
    assert canonicalize_url("http://h/a/../../b") == "http://h/b"
    assert canonicalize_url("http://h/a/../b?q=1#f") == "http://h/b?q=1#f"
    # dot-LIKE segments that are NOT dot segments stay verbatim
    assert canonicalize_url("http://h/a..b/c") == "http://h/a..b/c"
    assert canonicalize_url("http://h/.hidden") == "http://h/.hidden"


def test_dot_segment_fast_path_agrees_with_scalar():
    from anycrawl_ray.urlnorm import canonicalize_links

    base = "http://h00.example.test/p/0000"
    hrefs = [
        "http://h/a/../b", "http://h/a/.", "http://h/a/./b", "/x/../y",
        "/x/.", "http://h/.hidden", "/ok/path", "http://h/a..b",
    ]
    batch = canonicalize_links(hrefs, base)
    scalar = [canonicalize_url(h, base) for h in hrefs]
    assert batch == scalar
