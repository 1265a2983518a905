"""T2/T3 proxy tier ladder + rotation (reference Proxy.ts:595-726,
HttpClient.ts:48-118 semantics)."""

from anycrawl_ray.functions import proxy as px

BASE = ["http://b1", "http://b2"]
STEALTH = ["http://s1"]


def test_mode_tier_matrix():
    f = px.resolve_proxy_mode_with_fallback
    assert f("base", BASE, STEALTH) == [BASE]           # base never upgrades
    assert f("base", [], STEALTH) is None               # unconfigured
    assert f("stealth", BASE, STEALTH) == [STEALTH, BASE]
    assert f("stealth", BASE, []) == [BASE]             # stealth falls back
    assert f("stealth", [], []) is None
    assert f("auto", BASE, STEALTH) == [BASE, STEALTH]
    assert f("auto", [], STEALTH) == [STEALTH]
    assert f("auto", [], []) is None
    assert f("http://custom:1", BASE, STEALTH) == [["http://custom:1"]]
    assert f(None, BASE, STEALTH) is None


def test_primary_tier_and_counts():
    assert px.resolve_proxy_mode("auto", BASE, STEALTH) == BASE
    assert px.resolve_proxy_mode("stealth", BASE, STEALTH) == STEALTH
    assert px.resolve_proxy_mode(None) is None
    assert px.get_proxy_tier_count("auto", BASE, STEALTH) == 2
    assert px.get_proxy_tier_count("base", BASE, STEALTH) == 1
    assert px.get_proxy_tier_count(None) == 0


def test_fallback_flags():
    assert px.can_proxy_fallback("stealth") and px.can_proxy_fallback("auto")
    assert not px.can_proxy_fallback("base")
    assert not px.can_proxy_fallback("http://custom:1")
    assert not px.can_proxy_fallback(None)


def test_rotation_counter():
    r = px.ProxyRotator(BASE, STEALTH)
    # shared counter rotates through the tier's pool
    assert [r.get("base") for _ in range(4)] == ["http://b1", "http://b2",
                                                 "http://b1", "http://b2"]


def test_tier_clamp():
    r = px.ProxyRotator(BASE, STEALTH)
    assert r.get("base", tier=5) in BASE       # clamped to last tier
    assert r.get("stealth", tier=1) in BASE    # stealth tier 1 = base pool
    assert r.get("http://c", tier=9) == "http://c"


def test_attempt_ladder_steps_tiers():
    r = px.ProxyRotator(BASE, STEALTH)
    ladder = r.attempt_ladder("auto", retries=2)  # 3 attempts
    assert ladder[0] in BASE
    assert ladder[1] == "http://s1"   # attempt 2 escalates to stealth tier
    assert ladder[2] == "http://s1"   # clamped at last tier
    assert len(r.attempt_ladder("auto", retries=0)) == 1


def test_simulate_request_lifecycle():
    r = px.ProxyRotator(BASE, STEALTH)
    ladder = r.attempt_ladder("auto", retries=2)
    ok = px.simulate_request(ladder, lambda p, a: a == 2)
    assert ok == {"ok": True, "attempts": 2, "proxy": "http://s1", "error": None}
    bad = px.simulate_request(ladder, lambda p, a: False)
    assert bad["ok"] is False and bad["error"] == "HTTP_REQUEST_ERROR"
    assert bad["attempts"] == 3
    none = px.simulate_request([None], lambda p, a: True)
    assert none["error"] == "PROXY_REQUIRED"
    noproxy_ok = px.simulate_request([None], lambda p, a: True, require_proxy=False)
    assert noproxy_ok["ok"] is True
