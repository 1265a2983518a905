"""Property-based hardening of the URL identity function (M20): the batch
fast path must be byte-identical to the scalar path on ARBITRARY hrefs, and
canonicalization must be idempotent — divergence here silently corrupts the
crawl seen set."""

from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.urlnorm import canonicalize_links, canonicalize_url

# href fragments that stress every fast-path guard: dot segments, ports,
# fragments, queries, scheme repairs, relative forms, junk
_SEGMENT = st.sampled_from(
    ["a", "b", "p-1", "..", ".", "a..b", ".hidden", "00%20x", "é", ""]
)
_HOST = st.sampled_from(
    ["example.com", "EXAMPLE.com", "h00.example.test", "x", "127.0.0.1"]
)
_PORT = st.sampled_from(["", ":80", ":443", ":8080", ":0"])
_SCHEME = st.sampled_from(["http://", "https://", "http:/", "https:/", "//", "", "/"])
_SUFFIX = st.sampled_from(["", "?q=1", "?a=/../b", "#frag", "?q=1#f", "#", "?"])


@st.composite
def hrefs(draw):
    scheme = draw(_SCHEME)
    host = draw(_HOST) + draw(_PORT) if scheme not in ("", "/") else ""
    path = "/".join(draw(st.lists(_SEGMENT, max_size=4)))
    sep = "/" if (host or scheme == "/") and path else ""
    return f"{scheme}{host}{sep}{path}{draw(_SUFFIX)}"


@given(st.lists(hrefs(), min_size=1, max_size=20),
       st.sampled_from(["http://h00.example.test/p/0000",
                        "https://base.test:8080/a/b?x=1",
                        "http://base.test/a/"]))
@settings(max_examples=300, deadline=None)
def test_batch_fast_path_equals_scalar(links, base):
    assert canonicalize_links(links, base) == [
        canonicalize_url(h, base) for h in links
    ]


@given(hrefs())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(href):
    once = canonicalize_url(href)
    assert canonicalize_url(once) == once
