"""Session pool (T2) lifecycle tests — EngineConfigurator.ts:563-583 config,
Crawlee Session state machine, proxy binding."""

from anycrawl_ray.functions.proxy import ProxyRotator
from anycrawl_ray.state.sessions import (
    Session,
    SessionPool,
    normalize_blocked_status_codes,
)


def test_normalize_blocked_codes_default_excludes_403():
    assert normalize_blocked_status_codes() == [401, 429]


def test_normalize_blocked_codes_custom_still_drops_403_and_nonfinite():
    assert normalize_blocked_status_codes([403, 418, "x", None, 429.0, True]) == [418, 429]


def test_session_state_machine():
    s = Session(id=0, max_error_score=1.0)
    assert s.is_usable
    s.mark_bad()
    assert s.is_blocked and not s.is_usable
    s2 = Session(id=1, max_error_score=3.0)
    s2.mark_bad()
    assert s2.is_usable  # 1 < 3
    s2.mark_good()
    assert s2.error_score == 0.5
    s2.retire()
    assert not s2.is_usable


def test_blocked_code_retires_403_does_not():
    pool = SessionPool()
    r1 = pool.use("h", 401)
    assert r1["retired"]
    r2 = pool.use("h", 200)
    assert r2["session_id"] == r1["session_id"] + 1  # rotated
    # 403 not in blocked codes but marks bad -> maxErrorScore 1 rotates anyway
    r3 = pool.use("h", 403)
    assert r3["retired"] and r3["session_id"] == r2["session_id"]
    r4 = pool.use("h", 200)
    assert r4["session_id"] == r3["session_id"] + 1


def test_success_streak_keeps_session_until_max_usage():
    pool = SessionPool(max_usage_count=3)
    ids = [pool.use("h", 200)["session_id"] for _ in range(7)]
    assert ids == [0, 0, 0, 1, 1, 1, 2]  # usage rotation every 3


def test_per_host_isolation_and_proxy_binding():
    rot = ProxyRotator(base_urls=["http://b1", "http://b2"])
    pool = SessionPool(proxy_mode="base", rotator=rot)
    a = pool.use("a.com", 200)
    b = pool.use("b.com", 200)
    assert a["session_id"] != b["session_id"]
    assert a["proxy"] == "http://b1" and b["proxy"] == "http://b2"
    pool.use("a.com", 500)  # kill a's session
    a2 = pool.use("a.com", 200)
    assert a2["proxy"] == "http://b1"  # rotation advanced 3x: b1,b2,b1
    assert pool.use("b.com", 200)["proxy"] == "http://b2"  # b keeps its session


def test_higher_max_error_score_survives_one_error():
    pool = SessionPool(max_error_score=2.0)
    r1 = pool.use("h", 500)
    assert not r1["retired"]
    r2 = pool.use("h", 200)
    assert r2["session_id"] == r1["session_id"]  # decayed, still usable
