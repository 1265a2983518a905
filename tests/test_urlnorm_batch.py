"""Batch fast paths must be byte-identical to the scalar oracle functions."""

import numpy as np

from anycrawl_ray.urlnorm import (
    canonicalize_links,
    canonicalize_url,
    hostname_of,
    hosts_of_batch,
    matches_strategy,
    matches_strategy_batch,
)

TRICKY = [
    "http://h00.example.test/p/0001",
    "HTTP://UPPER.test/Path",
    "http://h.test:80/x",
    "http://h.test:8080/x",
    "https://h.test:443/",
    "http://h.test",
    "/p/0005",
    "/p/0005?q=1#frag",
    "../up/one",
    "rel/path",
    "http:/h01.example.test/p/0002",
    "https:/h.test/y",
    "http://h.test/p/0001#sec2",
    "http://h.test/a/../b",
    "http://h.test/a/./b",
    "not a url",
    "//protocol.relative/x",
    "http://user:pw@h.test/x",
    "",
]

BASES = [
    "http://h00.example.test/p/0000",
    "http://h00.example.test/p/0000#frag",
    "https://other.test:8443/deep/page?x=1",
]


def test_canonicalize_links_matches_scalar():
    for base in BASES:
        fast = canonicalize_links(TRICKY, base)
        slow = [canonicalize_url(h, base) for h in TRICKY]
        assert fast == slow, f"base={base}: {list(zip(TRICKY, fast, slow))}"


def test_hosts_of_batch_matches_scalar():
    urls = [canonicalize_url(h, BASES[0]) for h in TRICKY] + TRICKY
    fast = hosts_of_batch(urls)
    slow = [hostname_of(u) for u in urls]
    mism = [(u, f, s) for u, f, s in zip(urls, fast, slow) if f != s]
    assert not mism, mism


def test_matches_strategy_batch_matches_scalar():
    seed = "http://h00.example.test/p/0000"
    urls = [canonicalize_url(h, seed) for h in TRICKY]
    hosts = hosts_of_batch(urls)
    for strategy in ("same-domain", "same-hostname", "same-origin", "all"):
        fast = matches_strategy_batch(urls, hosts, seed, strategy)
        slow = np.array([matches_strategy(u, seed, strategy) for u in urls])
        assert (fast == slow).all(), (
            strategy,
            [(u, f, s) for u, f, s in zip(urls, fast, slow) if f != s],
        )
