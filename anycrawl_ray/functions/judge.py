"""Monitor change judge — "is this diff meaningful relative to the goal?"

Transcribed semantics from reference
packages/scrape/src/monitor/judge.ts:24-59 (verdict schema
{meaningful, confidence in low|medium|high, reason}; diff truncated to
3000 chars; the system prompt's mechanical-noise ignore list) and
MonitorPostProcessor.ts:271-280 (judge runs only when the monitor has a
goal AND a diff exists; ``only_meaningful`` — default ON — suppresses
changes the judge rejects).

No LLM runtime ships in this container, so the generateObject call is
replaced by two fully deterministic modes (same contract as
functions/agents.LLMAgentStub):

- ``degraded``: the reference's no-provider path (judge.ts:20-22) —
  every change is ``{meaningful: True, confidence: "medium", reason:
  "AI judge unavailable; defaulting to meaningful"}`` so monitoring
  keeps running without AI, never silently dropping alerts.
- ``heuristic``: a goal-keyword model over the diff's CHANGED lines.
  Mechanical noise the reference prompt tells the model to ignore
  (rotating tokens/session ids, timestamps, cache-buster query strings,
  judge.ts:33) is stripped by regex first; then the goal's content
  words are matched against the surviving +/- lines. ≥2 distinct goal
  terms hit => meaningful/high, 1 => meaningful/medium, 0 but the
  surviving change is large (≥5 lines) => meaningful/low (volume alone
  is weak evidence), otherwise not meaningful/medium. Pure-noise diffs
  are never meaningful regardless of size.
- ``strict``: raises — for callers that must not run without a real
  model.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

DIFF_JUDGE_CHARS = 3000  # judge.ts:40 — first 3000 chars of the diff

# mechanical-noise line patterns (the judge prompt's ignore list)
_NOISE_PATTERNS = [
    re.compile(r"\b[0-9a-f]{16,}\b", re.I),          # rotating tokens / ids
    re.compile(r"\bsession[-_]?id\b", re.I),
    re.compile(r"\b(csrf|nonce|cache[-_]?buster)\b", re.I),
    re.compile(r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"),  # timestamps
    re.compile(r"[?&](v|ts|t|cb|_)=\d{6,}"),          # cache-buster params
]

_STOPWORDS = frozenset(
    "a an and are as at be by for from has if in into is it of on or the to "
    "when whether this that with monitor track watch change changes any".split()
)


@dataclass
class JudgmentResult:
    meaningful: bool
    confidence: str  # "low" | "medium" | "high"
    reason: str


DEGRADED = JudgmentResult(
    True, "medium", "AI judge unavailable; defaulting to meaningful"
)


def _goal_terms(goal: str) -> list[str]:
    return [w for w in re.findall(r"[a-z0-9]+", goal.lower())
            if len(w) >= 3 and w not in _STOPWORDS]


def _changed_lines(diff_text: str) -> list[str]:
    """Unified-diff +/- lines with mechanical noise stripped."""
    out = []
    for line in diff_text[:DIFF_JUDGE_CHARS].splitlines():
        if not line or line[0] not in "+-" or line[:3] in ("+++", "---"):
            continue
        body = line[1:]
        if any(p.search(body) for p in _NOISE_PATTERNS):
            continue
        out.append(body.lower())
    return out


def judge_change(goal: str, diff_text: str, url: str = "",
                 mode: str = "heuristic") -> JudgmentResult:
    """One verdict per (goal, diff). Deterministic — same inputs, same
    verdict, both engines (suitable for oracle mirroring)."""
    if mode == "strict":
        raise NotImplementedError("no LLM runtime in this container")
    if mode == "degraded" or not goal:
        return DEGRADED
    terms = _goal_terms(goal)
    lines = _changed_lines(diff_text)
    if not lines:
        return JudgmentResult(
            False, "high", "only mechanical noise changed"
        )
    if not terms:
        # a goal with no content words can't be matched — degraded verdict
        return DEGRADED
    hits = sorted({t for t in terms if any(t in ln for ln in lines)})
    if len(hits) >= 2:
        return JudgmentResult(
            True, "high", f"goal terms changed: {', '.join(hits)}"
        )
    if len(hits) == 1:
        return JudgmentResult(
            True, "medium", f"goal term changed: {hits[0]}"
        )
    if len(lines) >= 5:
        return JudgmentResult(
            True, "low",
            f"{len(lines)} substantive lines changed (no goal terms)"
        )
    return JudgmentResult(
        False, "medium", "changed lines unrelated to goal"
    )


def judge_changes_batch(goals, diffs, mode: str = "heuristic"):
    """Columnar wrapper: three parallel lists (meaningful, confidence,
    reason) for a batch of (goal, diff_text) rows."""
    m, c, r = [], [], []
    for g, d in zip(goals, diffs):
        v = judge_change(g or "", d or "", mode=mode)
        m.append(v.meaningful)
        c.append(v.confidence)
        r.append(v.reason)
    return m, c, r
