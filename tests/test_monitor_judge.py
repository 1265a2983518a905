"""Monitor change judge + notification shaping parity
(reference monitor/judge.ts, MonitorPostProcessor.ts:271-280,
EmailNotifier.ts buildEmailText/buildEmailHtml)."""

import pytest

from anycrawl_ray.functions.judge import (
    DEGRADED, JudgmentResult, judge_change, judge_changes_batch)
from anycrawl_ray.functions.notify import (
    build_change_email, build_change_html, build_change_text, change_subject)

DIFF_PRICE = """--- prev
+++ next
@@ -1,2 +1,2 @@
-price: $19.99 widget v1
+price: $24.99 widget v2
 name: gadget
"""

DIFF_NOISE = """--- prev
+++ next
@@ -1,2 +1,2 @@
-token: 0123456789abcdef0123456789abcdef
+token: fedcba9876543210fedcba9876543210
-updated: 2026-08-18 01:00
+updated: 2026-08-18 02:00
"""


# -- judge parity matrix -----------------------------------------------------


def test_degraded_mode_matches_reference_no_provider():
    """judge.ts:20-22: no provider => meaningful/medium with the exact
    degraded reason — monitoring never goes blind."""
    v = judge_change("any goal", DIFF_PRICE, mode="degraded")
    assert v == DEGRADED
    assert v.meaningful is True
    assert v.confidence == "medium"
    assert "defaulting to meaningful" in v.reason


def test_empty_goal_is_degraded():
    """MonitorPostProcessor.ts:273 judges only when a goal exists; an
    empty goal cannot reject changes."""
    assert judge_change("", DIFF_PRICE) == DEGRADED


def test_strict_mode_raises():
    with pytest.raises(NotImplementedError):
        judge_change("goal", DIFF_PRICE, mode="strict")


def test_goal_term_hits_drive_confidence():
    # two distinct goal terms in changed lines => high
    v = judge_change("watch the price of the widget", DIFF_PRICE)
    assert v.meaningful and v.confidence == "high"
    assert "price" in v.reason and "widget" in v.reason
    # one term => medium
    v = judge_change("watch the price", DIFF_PRICE)
    assert v.meaningful and v.confidence == "medium"
    # no terms, small change => not meaningful
    v = judge_change("stock availability", DIFF_PRICE)
    assert not v.meaningful and v.confidence == "medium"


def test_mechanical_noise_never_meaningful():
    """judge.ts:33 ignore list: rotating tokens / timestamps are stripped;
    a pure-noise diff is confidently not meaningful, whatever the goal."""
    v = judge_change("price of the widget", DIFF_NOISE)
    assert not v.meaningful and v.confidence == "high"
    assert "noise" in v.reason


def test_large_offgoal_change_is_weakly_meaningful():
    diff = "\n".join(f"+new line {i} of body text" for i in range(6))
    v = judge_change("price", diff)
    assert v.meaningful and v.confidence == "low"


def test_diff_truncated_to_3000_chars():
    """judge.ts:40: only the first 3000 chars reach the judge — a goal term
    appearing only beyond the window must not count."""
    filler = "+filler aaaa\n" * 300  # > 3000 chars
    diff = filler + "+price: changed\n"
    v = judge_change("price", diff)
    assert not v.meaningful or "price" not in v.reason


def test_determinism_and_batch_wrapper():
    goals = ["price", "", "stock"]
    diffs = [DIFF_PRICE, DIFF_PRICE, DIFF_NOISE]
    a = judge_changes_batch(goals, diffs)
    b = judge_changes_batch(goals, diffs)
    assert a == b
    m, c, r = a
    assert m == [True, True, False]


# -- pipeline wiring ----------------------------------------------------------


def test_monitor_judged_dataset_end_to_end(ray_session):
    """Changed rows get verdicts, unchanged rows pass un-judged (null),
    only_meaningful suppresses judge-rejected changes."""
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.pipelines.monitor import monitor_judged_dataset

    rows = []
    for uid, texts in [
        ("u1", ["price $10", "price $12"]),            # on-goal change
        ("u2", ["hello world", "hello world"]),        # no change
        ("u3", ["alpha beta", "alpha gamma"]),         # off-goal change
    ]:
        for i, txt in enumerate(texts):
            rows.append({"user_id": uid, "event_id": i, "ts": i, "props": txt})
    ds = rd.from_pandas(pd.DataFrame(rows))

    all_rows = monitor_judged_dataset(
        ds, goal="track the price", only_meaningful=False, n_parts=2
    ).take_all()
    by = {(r["user_id"], r["event_id"]): r for r in all_rows}
    assert by[("u1", 1)]["changed"] and by[("u1", 1)]["judged_meaningful"]
    assert by[("u2", 1)]["changed"] is False
    assert by[("u2", 1)]["judged_meaningful"] is None  # never judged
    assert by[("u3", 1)]["changed"] and not by[("u3", 1)]["judged_meaningful"]

    kept = monitor_judged_dataset(
        ds, goal="track the price", only_meaningful=True, n_parts=2
    ).take_all()
    keys = {(r["user_id"], r["event_id"]) for r in kept}
    assert ("u1", 1) in keys          # meaningful change kept
    assert ("u2", 1) in keys          # unchanged rows always pass
    assert ("u3", 1) not in keys      # judge-rejected change suppressed


# -- notification shaping ------------------------------------------------------

MON = {"name": "Acme watch", "monitor_type": "text"}
CHANGE = {
    "url": "http://x.test/p",
    "change_type": "price_up",
    "diff_text": "x" * 900,
    "diff_json": [{"path": f"f{i}", "from": 1, "to": 2, "delta": 1}
                  for i in range(12)],
    "judgment": {"meaningful": True, "confidence": "high", "reason": "ok"},
}


def test_subject_singular_plural():
    assert change_subject(MON, [CHANGE]).endswith("1 change detected")
    assert change_subject(MON, [CHANGE] * 2).endswith("2 changes detected")


def test_text_digest_shape():
    txt = build_change_text(MON, [CHANGE])
    assert "Monitor: Acme watch (text)" in txt
    assert "Change type: price_up" in txt
    assert "AI assessment: meaningful (high confidence) — ok" in txt
    # field diffs capped at 10
    assert "f9:" in txt and "f10:" not in txt
    assert "1 → 2 (+1)" in txt
    # diff truncated to 500 chars
    assert "x" * 500 in txt and "x" * 501 not in txt


def test_html_digest_escapes_and_truncates():
    mon = {"name": 'A<b>"x"', "monitor_type": "mixed"}
    ch = dict(CHANGE, url="http://x.test/?a=<script>", diff_text="y" * 2500)
    html = build_change_html(mon, [ch])
    assert "<script>" not in html
    assert "&lt;script&gt;" in html
    assert "A&lt;b&gt;&quot;x&quot;" in html
    assert "y" * 2000 in html and "y" * 2001 not in html
    assert "✅ Meaningful" in html


def test_build_email_empty_recipients_is_noop():
    assert build_change_email(MON, [CHANGE], []) is None
    msg = build_change_email(MON, [CHANGE], ["a@x.test"])
    assert msg["to"] == ["a@x.test"]
    assert msg["subject"].startswith("[AnyCrawl Monitor] Acme watch")
