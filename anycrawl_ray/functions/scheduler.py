"""Scheduler (T9) — deterministic model of the reference's repeatable-job
scheduler.

Reference semantics transcribed (no Redis/BullMQ/wall-clock here — time is
an explicit ``now`` float, storage is in-memory rows; the driver-cron loop
is ``SchedulerState.sync(now)`` called on whatever cadence the host wants):

- scheduledFor resolution + fallback
  (reference packages/scrape/src/managers/Scheduler.ts:26-42)
- idempotency key ``{taskUuid}-{scheduledForISO}``  (Scheduler.ts:44-49)
- dispatch-committed error recovery  (Scheduler.ts:52-76)
- overdue catch-up: due tasks trigger ONE catch-up execution (idempotency
  key dedupes), then nextExecutionAt advances past now  (Scheduler.ts:1565-1614)
- stale cleanup: pending executions never started within 5 minutes are
  auto-failed with STALE_PENDING_TIMEOUT  (Scheduler.ts:1620-1655)
- finalizeExecution transition guard: only pending/running rows transition
  to a terminal status; a second finalize is a no-op (mirrored by the
  reference's Scheduler.lifecycle.test.ts timed-out cases)
- pause/resume: paused tasks are skipped by sync and keep their schedule
  (Scheduler.ts syncScheduledTasks isActive/isPaused filter :146-151)
"""

from __future__ import annotations

from dataclasses import dataclass, field

STALE_PENDING_SECONDS = 5 * 60  # Scheduler.ts:1622 — "5 minutes ago"
STALE_PENDING_CODE = "STALE_PENDING_TIMEOUT"


def resolve_scheduled_for(next_execution_at, fallback: float) -> float:
    """Scheduler.ts:26-42 — use nextExecutionAt when it parses, else fallback."""
    if isinstance(next_execution_at, (int, float)) and next_execution_at == next_execution_at:
        return float(next_execution_at)
    if isinstance(next_execution_at, str):
        try:
            return float(next_execution_at)
        except ValueError:
            pass
    return fallback


def build_idempotency_key(task_uuid: str, scheduled_for: float) -> str:
    """Scheduler.ts:44-49 — stable `{uuid}-{scheduled time}` key."""
    return f"{task_uuid}-{scheduled_for:.3f}"


def resolve_dispatch_state_from_error(
    execution_dispatched: bool, job_uuid: str | None, error
) -> tuple[bool, str | None]:
    """Scheduler.ts:52-76 — an error object may carry dispatchCommitted=True
    (the job actually enqueued before the failure); recognize it and recover
    the job uuid from the error payload."""
    committed = bool(getattr(error, "dispatch_committed", False)) or (
        isinstance(error, dict) and error.get("dispatch_committed") is True
    )
    err_uuid = getattr(error, "job_uuid", None) or (
        error.get("job_uuid") if isinstance(error, dict) else None
    )
    if not execution_dispatched and committed:
        execution_dispatched = True
        if not job_uuid and isinstance(err_uuid, str) and err_uuid:
            job_uuid = err_uuid
    return execution_dispatched, job_uuid


@dataclass
class ScheduledTask:
    """scheduledTasks row (interval model stands in for the cron string —
    the schedule algebra, not the cron grammar, is what T9 exercises)."""

    uuid: str
    name: str
    interval_s: float
    next_execution_at: float | None = None
    is_active: bool = True
    is_paused: bool = False
    executions: int = 0


@dataclass
class TaskExecution:
    uuid: str
    task_uuid: str
    idempotency_key: str
    status: str = "pending"  # pending | running | completed | failed
    created_at: float = 0.0
    started_at: float | None = None
    completed_at: float | None = None
    error_code: str | None = None
    source: str = "schedule"


class SchedulerState:
    """In-memory scheduledTasks + taskExecutions store with the sync loop."""

    def __init__(self):
        self.tasks: dict[str, ScheduledTask] = {}
        self.executions: list[TaskExecution] = []
        self._by_key: dict[str, TaskExecution] = {}
        self._next_exec_id = 0

    def add_task(self, task: ScheduledTask) -> None:
        if task.next_execution_at is None:
            task.next_execution_at = task.interval_s  # first tick after one period
        self.tasks[task.uuid] = task

    def pause(self, uuid: str) -> None:
        self.tasks[uuid].is_paused = True

    def resume(self, uuid: str) -> None:
        self.tasks[uuid].is_paused = False

    # -- execution lifecycle ---------------------------------------------
    def _create_execution(self, task: ScheduledTask, scheduled_for: float,
                          now: float, source: str) -> TaskExecution | None:
        key = build_idempotency_key(task.uuid, scheduled_for)
        if key in self._by_key:  # Scheduler.ts:1597-1604 — catch-up once
            return None
        self._next_exec_id += 1
        ex = TaskExecution(
            uuid=f"exec-{self._next_exec_id}", task_uuid=task.uuid,
            idempotency_key=key, created_at=now, source=source,
        )
        self.executions.append(ex)
        self._by_key[key] = ex
        task.executions += 1
        return ex

    def finalize_execution(
        self, execution_uuid: str, status: str, completed_at: float,
        error_code: str | None = None, source: str = "lifecycle",
    ) -> bool:
        """Terminal transition with guard: returns False (no-op) when the
        row is already terminal — callers must skip their follow-up updates
        then (reference lifecycle tests 'skips timed-out job status update
        when finalizeExecution does not transition')."""
        for ex in self.executions:
            if ex.uuid == execution_uuid:
                if ex.status in ("completed", "failed"):
                    return False
                ex.status = status
                ex.completed_at = completed_at
                ex.error_code = error_code
                return True
        return False

    # -- the driver-cron body --------------------------------------------
    def sync(self, now: float) -> dict:
        """One polling pass (Scheduler.ts pollDatabaseChanges): trigger
        overdue active tasks once each, advance schedules past now, fail
        stale pending executions. Returns counters for observability."""
        triggered, skipped_paused, stale_failed = 0, 0, 0
        for task in self.tasks.values():
            if not task.is_active:
                continue
            if task.is_paused:
                skipped_paused += 1
                continue
            if task.next_execution_at is not None and task.next_execution_at <= now:
                scheduled_for = resolve_scheduled_for(task.next_execution_at, now)
                if self._create_execution(task, scheduled_for, now, "schedule"):
                    triggered += 1
                # advance past now — ONE catch-up regardless of how many
                # periods were missed (Scheduler.ts:1543-1547)
                while task.next_execution_at <= now:
                    task.next_execution_at += task.interval_s
        for ex in self.executions:
            if (
                ex.status == "pending" and ex.started_at is None
                and ex.created_at < now - STALE_PENDING_SECONDS
            ):
                if self.finalize_execution(
                    ex.uuid, "failed", now, STALE_PENDING_CODE, source="cleanup"
                ):
                    stale_failed += 1
        return {
            "triggered": triggered,
            "skipped_paused": skipped_paused,
            "stale_failed": stale_failed,
        }
