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


# ---------------------------------------------------------------------------
# T9 scheduler lifecycle (mirrors reference Scheduler.lifecycle.test.ts)
# ---------------------------------------------------------------------------

from anycrawl_ray.functions import scheduler as sch


def test_dispatch_committed_error_preserves_job_uuid():
    # lifecycle test: "recognizes dispatch-committed errors and preserves
    # job UUID from error payload"
    d, j = sch.resolve_dispatch_state_from_error(
        False, None, {"dispatch_committed": True, "job_uuid": "job-9"}
    )
    assert (d, j) == (True, "job-9")
    d, j = sch.resolve_dispatch_state_from_error(False, "kept", {"dispatch_committed": True, "job_uuid": "x"})
    assert (d, j) == (True, "kept")  # existing uuid wins
    d, j = sch.resolve_dispatch_state_from_error(False, None, {"other": 1})
    assert (d, j) == (False, None)


def test_scheduled_for_resolution_and_idempotency_key():
    # "uses nextExecutionAt as scheduledFor when it is available" +
    # "builds stable idempotency keys"
    assert sch.resolve_scheduled_for(120.0, 999.0) == 120.0
    assert sch.resolve_scheduled_for("120.5", 999.0) == 120.5
    assert sch.resolve_scheduled_for(None, 999.0) == 999.0
    assert sch.resolve_scheduled_for("garbage", 999.0) == 999.0
    k = sch.build_idempotency_key("t1", 120.0)
    assert k == sch.build_idempotency_key("t1", 120.0) and k.startswith("t1-")


def test_overdue_catch_up_once_and_schedule_advance():
    st = sch.SchedulerState()
    st.add_task(sch.ScheduledTask("t1", "daily", interval_s=100.0))
    # 3 periods missed -> exactly ONE catch-up execution, schedule past now
    r = st.sync(now=350.0)
    assert r["triggered"] == 1
    assert len(st.executions) == 1
    assert st.tasks["t1"].next_execution_at == 400.0
    # idempotent within the same instant
    assert st.sync(now=350.0)["triggered"] == 0
    # next period fires once more
    assert st.sync(now=401.0)["triggered"] == 1


def test_finalize_transition_guard():
    # "skips ... when finalizeExecution does not transition" /
    # "updates ... when finalizeExecution transitions"
    st = sch.SchedulerState()
    st.add_task(sch.ScheduledTask("t1", "x", interval_s=10.0))
    st.sync(now=10.0)
    ex = st.executions[0]
    assert st.finalize_execution(ex.uuid, "completed", 11.0) is True
    assert ex.status == "completed"
    assert st.finalize_execution(ex.uuid, "failed", 12.0) is False  # terminal: no-op
    assert ex.status == "completed" and ex.error_code is None
    assert st.finalize_execution("missing", "failed", 12.0) is False


def test_stale_pending_cleanup():
    st = sch.SchedulerState()
    st.add_task(sch.ScheduledTask("t1", "x", interval_s=10.0))
    st.sync(now=10.0)  # creates pending execution at t=10
    r = st.sync(now=10.0 + sch.STALE_PENDING_SECONDS + 1)
    assert r["stale_failed"] == 1
    ex = st.executions[0]
    assert ex.status == "failed" and ex.error_code == sch.STALE_PENDING_CODE
    # started executions are NOT stale-failed
    st2 = sch.SchedulerState()
    st2.add_task(sch.ScheduledTask("t2", "x", interval_s=10.0))
    st2.sync(now=10.0)
    st2.executions[0].started_at = 11.0
    assert st2.sync(now=1000.0)["stale_failed"] == 0


def test_pause_resume_lifecycle():
    st = sch.SchedulerState()
    st.add_task(sch.ScheduledTask("t1", "x", interval_s=10.0))
    st.pause("t1")
    r = st.sync(now=100.0)
    assert r == {"triggered": 0, "skipped_paused": 1, "stale_failed": 0}
    assert st.tasks["t1"].next_execution_at == 10.0  # schedule untouched while paused
    st.resume("t1")
    assert st.sync(now=100.0)["triggered"] == 1
    assert st.tasks["t1"].next_execution_at == 110.0


def test_monitor_webhook_events(ray_session):
    """Monitor diffs feed the monitor.* webhook catalog: one check.completed
    per key, changed -> monitor.changed, price moves -> monitor.price.changed."""
    import pyarrow as pa

    from anycrawl_ray.pipelines.monitor import monitor_webhook_events

    t = pa.table(
        {"user_id": ["u1", "u1", "u2", "u2", "u3"],
         "changed": [False, True, True, True, False],
         "change_type": [None, "price_up", "content", "price_down", None]}
    )
    events = monitor_webhook_events(t)
    kinds = [e[0] for e in events]
    # check-completed fires only as the NO-changes summary (u3); changed
    # keys notify their changes instead (MonitorPostProcessor:140-143)
    assert kinds.count("monitor.check.completed") == 1
    assert ("monitor.check.completed", "monitor", "u3") in events
    assert kinds.count("monitor.price.changed") == 2
    assert kinds.count("monitor.changed") == 1
    # deliverable through the S11 sink
    sub = wh.WebhookSubscription(
        "m1", "http://x/h",
        ("monitor.changed", "monitor.price.changed", "monitor.check.completed"),
    )
    dt = wh.deliver_events(events, [sub], lambda s, e, i, a: True)
    assert dt.num_rows == len(events)
