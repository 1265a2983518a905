"""Monitor change-notification shaping (deterministic, SMTP-free).

Transcribed from reference packages/scrape/src/monitor/EmailNotifier.ts:
the event -> notification ASSEMBLY (subject line :48, plain-text digest
buildEmailText :64-90, HTML digest buildEmailHtml :92-121, escHtml :126-132)
is pure string construction and fully testable; the transport (nodemailer /
SMTP, :30-60) is environment I/O and out of scope — callers hand the built
message to whatever transport exists (the webhook sink's delivery shape).

Shaping rules preserved exactly:
- subject: ``[AnyCrawl Monitor] {name} — {n} change{s} detected``
  (singular/plural on n == 1);
- per change: url, change type, optional AI-judgment line
  ("meaningful"/"not meaningful" + confidence + reason);
- field diffs capped at 10 rows, each ``path: from → to (+delta)`` with the
  sign rendered only for positive deltas;
- text digest truncates diff_text to 500 chars, HTML to 2000;
- HTML escapes &, <, >, " in every interpolated value.
"""

from __future__ import annotations

import json


def esc_html(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _delta_suffix(d: dict) -> str:
    if d.get("delta") is None:
        return ""
    delta = d["delta"]
    return f" ({'+' if delta > 0 else ''}{delta})"


def change_subject(monitor: dict, changes: list[dict]) -> str:
    n = len(changes)
    return (f"[AnyCrawl Monitor] {monitor['name']} — "
            f"{n} change{'' if n == 1 else 's'} detected")


def build_change_text(monitor: dict, changes: list[dict]) -> str:
    lines = [
        f"Monitor: {monitor['name']} ({monitor['monitor_type']})",
        f"Changes detected: {len(changes)}",
        "",
    ]
    for c in changes:
        lines.append(f"URL: {c['url']}")
        lines.append(f"Change type: {c['change_type']}")
        j = c.get("judgment")
        if j:
            lines.append(
                "AI assessment: "
                f"{'meaningful' if j['meaningful'] else 'not meaningful'} "
                f"({j['confidence']} confidence) — {j['reason']}"
            )
        diff_json = c.get("diff_json") or []
        if diff_json:
            lines.append("Field changes:")
            for d in diff_json[:10]:
                lines.append(
                    f"  {d['path']}: {json.dumps(d.get('from'))} → "
                    f"{json.dumps(d.get('to'))}{_delta_suffix(d)}"
                )
        if c.get("diff_text"):
            lines.append("Diff (first 500 chars):")
            lines.append(c["diff_text"][:500])
        lines.append("")
    return "\n".join(lines)


def build_change_html(monitor: dict, changes: list[dict]) -> str:
    blocks = []
    for c in changes:
        rows = "".join(
            f"<tr><td>{esc_html(d['path'])}</td>"
            f"<td>{esc_html(json.dumps(d.get('from')))}</td><td>→</td>"
            f"<td>{esc_html(json.dumps(d.get('to')))}"
            f"{esc_html(_delta_suffix(d))}</td></tr>"
            for d in (c.get("diff_json") or [])[:10]
        )
        j = c.get("judgment")
        judgment = (
            f"<p><strong>AI assessment:</strong> "
            f"{'✅ Meaningful' if j['meaningful'] else '⚠️ Not meaningful'} "
            f"({esc_html(j['confidence'])} confidence) — "
            f"{esc_html(j['reason'])}</p>"
            if j else ""
        )
        diff = (f"<pre>{esc_html(c['diff_text'][:2000])}</pre>"
                if c.get("diff_text") else "")
        blocks.append(
            f"<div><h3>{esc_html(c['url'])}</h3>"
            f"<p><strong>Change type:</strong> "
            f"<code>{esc_html(c['change_type'])}</code></p>"
            f"{judgment}"
            f"{f'<table>{rows}</table>' if rows else ''}{diff}</div>"
        )
    return (
        "<!DOCTYPE html><html><body>"
        f"<h2>🔔 AnyCrawl Monitor — {esc_html(monitor['name'])}</h2>"
        f"<p><strong>Type:</strong> {esc_html(monitor['monitor_type'])}"
        f" &nbsp; <strong>Changes:</strong> {len(changes)}</p>"
        + "".join(blocks)
        + "</body></html>"
    )


def build_change_email(monitor: dict, changes: list[dict],
                       recipients: list[str]) -> dict | None:
    """The full assembled message (EmailNotifier.sendChangeEmail minus the
    transport). ``None`` when there is no one to notify — the reference
    returns early on empty recipients (:28)."""
    if not recipients:
        return None
    return {
        "to": list(recipients),
        "subject": change_subject(monitor, changes),
        "text": build_change_text(monitor, changes),
        "html": build_change_html(monitor, changes),
    }
