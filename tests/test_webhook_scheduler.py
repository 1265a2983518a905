"""S11 webhook sink + T9 scheduler model unit tests (reference semantics:
packages/scrape/src/managers/Webhook.ts / Scheduler.ts)."""

import pyarrow as pa
import pytest

from anycrawl_ray.functions import webhook as wh


def test_event_catalog_matches_reference():
    # reference packages/libs/src/types/WebhookEvents.ts:6-47 — 27 types
    assert len(wh.WEBHOOK_EVENT_TYPES) == 27
    assert "crawl.completed" in wh.WEBHOOK_EVENT_TYPES
    assert "monitor.price.changed" in wh.WEBHOOK_EVENT_TYPES
    assert "webhook.test" in wh.WEBHOOK_EVENT_TYPES


def _sub(**kw):
    base = dict(subscription_id="s1", url="http://x/h",
                event_types=("crawl.completed", "crawl.failed"))
    base.update(kw)
    return wh.WebhookSubscription(**base)


def test_match_subscriptions_filters():
    s_all = _sub()
    s_user = _sub(subscription_id="s2", user_id="u1")
    s_scope = _sub(subscription_id="s3", scope="specific",
                   specific_task_ids=("job-7",))
    s_off = _sub(subscription_id="s4", active=False)
    subs = [s_all, s_user, s_scope, s_off]

    got = {s.subscription_id for s in
           wh.match_subscriptions(subs, "crawl.completed", "job-7", user_id="u1")}
    assert got == {"s1", "s2", "s3"}
    got = {s.subscription_id for s in
           wh.match_subscriptions(subs, "crawl.completed", "job-8", user_id="u2")}
    assert got == {"s1"}  # wrong user, wrong scope id, inactive all excluded
    assert wh.match_subscriptions(subs, "map.completed", "job-7") == []


def test_backoff_schedule_reference_values():
    # Webhook.ts:299-301 — mult**attempt * 60000, base one minute
    assert wh.backoff_schedule_ms(0) == []
    assert wh.backoff_schedule_ms(1) == [120_000]
    assert wh.backoff_schedule_ms(2) == [120_000, 240_000]
    assert wh.backoff_schedule_ms(2, multiplier=3) == [180_000, 540_000]


def test_account_delivery_lifecycle():
    assert wh.account_delivery(lambda a: True) == ("delivered", 1, 0)
    assert wh.account_delivery(lambda a: a == 2) == ("delivered", 2, 120_000)
    assert wh.account_delivery(lambda a: a == 3) == ("delivered", 3, 360_000)
    assert wh.account_delivery(lambda a: False) == ("failed", 3, 360_000)
    # maxAttempts honored (Webhook.ts:297)
    assert wh.account_delivery(lambda a: a == 3, max_attempts=2) == ("failed", 2, 120_000)


def test_deliver_events_table():
    sub = _sub(event_types=("crawl.created", "crawl.completed"))
    events = wh.job_events("crawl", "job-1", ok=True)
    t = wh.deliver_events(events, [sub], lambda s, e, i, a: a == 1)
    assert t.schema.equals(wh.DELIVERY_SCHEMA)
    # started not subscribed -> 2 deliveries
    assert t.num_rows == 2
    assert set(t.column("event_type").to_pylist()) == {"crawl.created", "crawl.completed"}
    assert set(t.column("status").to_pylist()) == {"delivered"}


def test_job_events_transition_triple():
    ok = wh.job_events("search", "j", ok=True)
    bad = wh.job_events("search", "j", ok=False)
    assert [e[0] for e in ok] == ["search.created", "search.started", "search.completed"]
    assert [e[0] for e in bad] == ["search.created", "search.started", "search.failed"]
