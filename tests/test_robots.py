"""RFC 9309 robots.txt parser (functions/robots.py) + politeness wiring."""

import pytest

from anycrawl_ray.functions.robots import is_url_allowed, parse_robots

BODY = """
# example robots
User-agent: googlebot
Disallow: /private/

User-agent: anycrawl
User-agent: otherbot
Allow: /shop/deals
Disallow: /shop/
Disallow: /tmp/*.log$
Crawl-delay: 2

User-agent: *
Disallow: /

Sitemap: https://ex.test/sitemap.xml
Sitemap: https://ex.test/sitemap2.xml
"""


def test_group_selection_specific_beats_star():
    p = parse_robots(BODY, user_agent="anycrawl/1.0")
    assert p.crawl_delay == 2.0
    assert p.is_allowed("/anything") is True        # star group not used
    p_star = parse_robots(BODY, user_agent="unknownbot")
    assert p_star.is_allowed("/anything") is False  # star group: Disallow /


def test_longest_match_and_allow_tiebreak():
    p = parse_robots(BODY, user_agent="anycrawl")
    assert p.is_allowed("/shop/deals/today") is True   # Allow is longer
    assert p.is_allowed("/shop/cart") is False
    assert p.is_allowed("/shop") is True               # /shop does not match /shop/
    # tie: Allow and Disallow same length -> Allow wins
    tie = parse_robots(
        "User-agent: *\nAllow: /a/b\nDisallow: /a/b\n", "x")
    assert tie.is_allowed("/a/b/c") is True


def test_wildcards_and_end_anchor():
    p = parse_robots(BODY, user_agent="anycrawl")
    assert p.is_allowed("/tmp/x.log") is False
    assert p.is_allowed("/tmp/x.log.1") is True        # $ anchors the match
    wild = parse_robots("User-agent: *\nDisallow: /*/print\n", "x")
    assert wild.is_allowed("/a/print") is False
    assert wild.is_allowed("/a/b/print") is False
    assert wild.is_allowed("/print") is True


def test_empty_disallow_and_unknown_keys():
    p = parse_robots(
        "User-agent: *\nDisallow:\nNoiseKey: zzz\nDisallow: /x\n", "bot")
    assert p.is_allowed("/anything") is True
    assert p.is_allowed("/x/1") is False


def test_sitemaps_are_global():
    for ua in ("anycrawl", "googlebot", "nobody"):
        p = parse_robots(BODY, ua)
        assert p.sitemaps == [
            "https://ex.test/sitemap.xml", "https://ex.test/sitemap2.xml"]


def test_query_string_participates():
    p = parse_robots("User-agent: *\nDisallow: /s?q=\n", "x")
    assert is_url_allowed(p, "http://h.test/s?q=1") is False
    assert is_url_allowed(p, "http://h.test/s") is True


def test_politeness_core_rfc9309_path():
    from anycrawl_ray.state.politeness import PolitenessCore

    core = PolitenessCore(0)
    core.load_robots_text("h.test", BODY, user_agent="anycrawl")
    mask = core.allowed([
        "http://h.test/shop/deals/x",   # allowed (longest Allow)
        "http://h.test/shop/cart",      # disallowed
        "http://other.test/shop/cart",  # no rules for host -> allowed
    ])
    assert mask.tolist() == [True, False, True]
    # crawl-delay 2s -> rate 0.5/s in the token bucket
    assert core._rate("h.test") == pytest.approx(0.5)
    assert core.sitemaps("h.test") == [
        "https://ex.test/sitemap.xml", "https://ex.test/sitemap2.xml"]


def test_politeness_set_routing(ray_session):
    from anycrawl_ray.state.politeness import PolitenessSet

    ps = PolitenessSet(2)
    try:
        ps.load_robots_text("h.test", BODY, user_agent="anycrawl")
        mask = ps.allowed(["http://h.test/shop/a", "http://h.test/shop/deals/b"])
        assert mask.tolist() == [False, True]
        assert ps.sitemaps("h.test")
    finally:
        ps.shutdown()


def test_prefix_only_bodies_match_startswith_semantics():
    """Property bridge between the two robots paths: for bodies with only
    plain path-prefix Disallow rules (no wildcards/anchors/Allow), the RFC
    9309 matcher must agree with the reference model's startswith check."""
    import random

    rng = random.Random(99)
    prefixes = ["/a/", "/b", "/c/d/", "/long/prefix/path"]
    body = "User-agent: *\n" + "".join(f"Disallow: {p}\n" for p in prefixes)
    p = parse_robots(body, "any")
    for _ in range(200):
        path = "/" + "/".join(
            rng.choice(["a", "b", "c", "d", "long", "prefix", "path", "x"])
            for _ in range(rng.randrange(1, 5))
        ) + rng.choice(["", "/"])
        want = not any(path.startswith(pre) for pre in prefixes)
        assert p.is_allowed(path) is want, path
