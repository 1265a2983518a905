"""Webhook event sink (S11) — deterministic local model of the reference's
webhook subsystem.

Reference semantics transcribed (no network in this sandbox — deliveries are
simulated by a caller-provided deterministic outcome function, and the sink
is a typed Arrow table instead of HTTP POSTs):

- typed event catalog: reference packages/libs/src/types/WebhookEvents.ts:6-47
  (scrape/crawl/search/map x created/started/completed/failed/cancelled,
  task.*, monitor.*, webhook.test)
- subscription matching: event type containment, per-user filter, and
  scope="specific" task-id filter
  (reference packages/scrape/src/managers/Webhook.ts:93-120)
- delivery records: status pending -> delivered | retrying -> failed,
  attemptNumber starting at 1, maxAttempts = subscription.maxRetries or 3
  (Webhook.ts:137-151)
- retry/backoff: after a failed attempt a, the next try is scheduled at
  ``backoff_multiplier ** a * 60000`` ms (base one minute, default
  multiplier 2); attempts stop at max_attempts -> status "failed"
  (Webhook.ts:297-321)

Ray shape: event generation and delivery accounting are pure vectorizable
functions over Arrow batches — the crawl/search/map pipelines call
``job_events`` at job transitions and a ``map_batches`` stage can expand
per-page/monitor events at scale; the sink is partitioned parquet like every
other table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# reference packages/libs/src/types/WebhookEvents.ts:6-47
WEBHOOK_EVENT_TYPES: tuple[str, ...] = (
    "scrape.created", "scrape.started", "scrape.completed", "scrape.failed",
    "scrape.cancelled",
    "crawl.created", "crawl.started", "crawl.completed", "crawl.failed",
    "crawl.cancelled",
    "search.created", "search.started", "search.completed", "search.failed",
    "map.created", "map.started", "map.completed", "map.failed",
    "task.executed", "task.failed", "task.paused", "task.resumed",
    "monitor.check.completed", "monitor.changed", "monitor.price.changed",
    "monitor.error",
    "webhook.test",
)

BACKOFF_BASE_MS = 60_000  # Webhook.ts:300 — "Base: 1 minute"


@dataclass(frozen=True)
class WebhookSubscription:
    """reference packages/scrape/src/managers/Webhook.ts subscription row."""

    subscription_id: str
    url: str
    event_types: tuple[str, ...]
    user_id: str | None = None
    scope: str = "all"  # "all" | "specific"
    specific_task_ids: tuple[str, ...] = ()
    max_retries: int = 3  # Webhook.ts:146 maxAttempts default
    backoff_multiplier: int = 2  # Webhook.ts:299 default
    active: bool = True


def match_subscriptions(
    subscriptions: list[WebhookSubscription],
    event_type: str,
    event_source_id: str,
    user_id: str | None = None,
) -> list[WebhookSubscription]:
    """Subscriptions that receive this event (Webhook.ts:93-120)."""
    out = []
    for sub in subscriptions:
        if not sub.active or event_type not in sub.event_types:
            continue
        if user_id is not None and sub.user_id is not None and sub.user_id != user_id:
            continue
        if sub.scope != "all" and sub.specific_task_ids:
            if event_source_id not in sub.specific_task_ids:
                continue
        out.append(sub)
    return out


def backoff_schedule_ms(attempts_failed: int, multiplier: int = 2) -> list[int]:
    """Backoffs scheduled after each failed attempt 1..attempts_failed
    (Webhook.ts:299-301: ``mult ** attemptNumber * 60000``)."""
    return [multiplier ** a * BACKOFF_BASE_MS for a in range(1, attempts_failed + 1)]


def account_delivery(
    succeeds_on_attempt, max_attempts: int = 3, multiplier: int = 2
) -> tuple[str, int, int]:
    """(status, attempts, total_backoff_ms) for one delivery given a
    predicate ``succeeds_on_attempt(a) -> bool`` over attempts 1..max.

    Mirrors the retry processor's lifecycle: failed attempt a < max schedules
    a retry after ``mult**a * base``; failure at max -> status "failed"."""
    for a in range(1, max_attempts + 1):
        if succeeds_on_attempt(a):
            return "delivered", a, sum(backoff_schedule_ms(a - 1, multiplier))
    return "failed", max_attempts, sum(backoff_schedule_ms(max_attempts - 1, multiplier))


DELIVERY_SCHEMA = pa.schema(
    [
        pa.field("subscription_id", pa.string()),
        pa.field("event_type", pa.string()),
        pa.field("event_source", pa.string()),
        pa.field("event_source_id", pa.string()),
        pa.field("status", pa.string()),
        pa.field("attempts", pa.int32()),
        pa.field("backoff_ms", pa.int64()),
    ]
)


def deliver_events(
    events: list[tuple[str, str, str]],  # (event_type, event_source, source_id)
    subscriptions: list[WebhookSubscription],
    outcome,  # (sub, event_type, source_id, attempt) -> bool, deterministic
    user_id: str | None = None,
) -> pa.Table:
    """Fan events out to matching subscriptions and account each delivery's
    retry lifecycle — the whole S11 pipeline as one deterministic function.
    Returns a DELIVERY_SCHEMA table (the local "webhook events" sink).

    SSRF guard (Webhook.ts:9-46): a subscription whose target URL points at
    a private/loopback host is never attempted — recorded as status
    "blocked_private_ip" with zero attempts."""
    from .netguard import is_private_ip_url

    rows = {k: [] for k in DELIVERY_SCHEMA.names}
    for event_type, event_source, source_id in events:
        for sub in match_subscriptions(subscriptions, event_type, source_id, user_id):
            if is_private_ip_url(sub.url):
                status, attempts, backoff = "blocked_private_ip", 0, 0
            else:
                status, attempts, backoff = account_delivery(
                    lambda a: outcome(sub, event_type, source_id, a),
                    sub.max_retries, sub.backoff_multiplier,
                )
            rows["subscription_id"].append(sub.subscription_id)
            rows["event_type"].append(event_type)
            rows["event_source"].append(event_source)
            rows["event_source_id"].append(source_id)
            rows["status"].append(status)
            rows["attempts"].append(attempts)
            rows["backoff_ms"].append(backoff)
    return pa.Table.from_pydict(rows, schema=DELIVERY_SCHEMA)


def job_events(kind: str, job_id: str, ok: bool) -> list[tuple[str, str, str]]:
    """The (created, started, completed|failed) transition triple the
    reference emits around one job (Webhook.ts trigger sites in api/)."""
    final = f"{kind}.completed" if ok else f"{kind}.failed"
    return [
        (f"{kind}.created", kind, job_id),
        (f"{kind}.started", kind, job_id),
        (final, kind, job_id),
    ]
