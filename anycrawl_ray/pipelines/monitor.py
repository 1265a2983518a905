"""Monitor pipeline: as-of self-join -> text/JSON diff -> classification.

The distributed form of the reference's MonitorPostProcessor flow
(reference packages/scrape/src/monitor/MonitorPostProcessor.ts:199-246):
per (monitor,url) the current snapshot is compared against the latest
previous one; here snapshots are grouped per key, ordered by capture time,
and diffed pairwise inside ``groupby().map_groups`` — the as-of join is the
sort within each group (SURVEY.md §2.4 J5).

Diff semantics come from functions/diff.py (transcribed LCS line diff +
recursive JSON diff + price classification, monitor/diff.ts).
"""

from __future__ import annotations

import json

import pandas as pd

from ..functions.diff import classify_price_change, price_diff, text_diff
from ..functions.normalize import hash_content, normalize_content


def snapshot_changes(group: pd.DataFrame, content_col: str = "props",
                     time_cols: tuple[str, ...] = ("ts", "event_id"),
                     keep_diff_text: bool = False) -> pd.DataFrame:
    """Pairwise consecutive diffs for one monitored key's snapshots.

    ``keep_diff_text`` additionally carries the unified diff text per row
    (the judge's input, MonitorPostProcessor.ts:274 diffForJudge) — off by
    default so the plain diff outputs stay byte-identical and small."""
    g = group.sort_values(list(time_cols))
    contents = g[content_col].tolist()
    rows = []
    prev = None
    prev_json = None
    for i, raw in enumerate(contents):
        norm = normalize_content({"text": raw or ""})
        try:
            cur_json = json.loads(raw) if raw else None
        except (ValueError, TypeError):
            cur_json = None
        if prev is None:
            row = {"changed": False, "ratio": 0.0, "change_type": None,
                   "content_hash": hash_content(norm)}
            if keep_diff_text:
                row["diff_text"] = ""
        else:
            td = text_diff(prev, norm)
            ctype = None
            if td.changed and prev_json is not None and cur_json is not None:
                ctype = classify_price_change(price_diff(prev_json, cur_json))
            elif td.changed:
                ctype = "content"
            row = {"changed": td.changed, "ratio": round(td.ratio, 6),
                   "change_type": ctype, "content_hash": hash_content(norm)}
            if keep_diff_text:
                row["diff_text"] = td.diff_text if td.changed else ""
        rows.append(row)
        prev = norm
        prev_json = cur_json
    out = g.reset_index(drop=True)
    diff_df = pd.DataFrame(rows)
    return pd.concat([out, diff_df], axis=1)


def monitor_webhook_events(diff_table, key_col: str = "user_id"):
    """Map changed snapshots to the reference's monitor webhook event types
    (WebhookEvents.ts monitor.* catalog; MonitorPostProcessor:140-143 fires
    _notify when a check found changes and a "check completed, no changes"
    summary otherwise): price_up/price_down -> monitor.price.changed, other
    changes -> monitor.changed; keys whose check found NOTHING emit one
    monitor.check.completed summary. Returns (event_type, event_source,
    source_id) triples for functions/webhook.deliver_events."""
    events: list[tuple[str, str, str]] = []
    keys = diff_table.column(key_col).to_pylist()
    changed = diff_table.column("changed").to_pylist()
    ctypes = diff_table.column("change_type").to_pylist()
    changed_keys = {k for k, ch in zip(keys, changed) if ch}
    for k in dict.fromkeys(keys):  # first-seen order
        if k not in changed_keys:
            events.append(("monitor.check.completed", "monitor", str(k)))
    for k, ch, ct in zip(keys, changed, ctypes):
        if not ch:
            continue
        if ct in ("price_up", "price_down"):
            events.append(("monitor.price.changed", "monitor", str(k)))
        else:
            events.append(("monitor.changed", "monitor", str(k)))
    return events


def monitor_judged_dataset(ds, goal: str, key_col: str = "user_id",
                           n_parts: int = 32, only_meaningful: bool = True,
                           mode: str = "heuristic", content_col: str = "props"):
    """Diff -> judge -> (optionally) suppress non-meaningful changes.

    The distributed form of MonitorPostProcessor.ts:271-280: when the
    monitor carries a ``goal``, every detected change is judged
    ("is this diff meaningful relative to the goal?") and, with
    ``only_meaningful`` (reference default: ``only_meaningful !==
    false``), rejected changes never become change records. The judge
    verdict rides along as three columns (judged_meaningful,
    judge_confidence, judge_reason) exactly like the reference's
    ``judgment`` JSON on monitorChanges rows. Unchanged rows pass
    through un-judged (the reference judges only when a diff exists).

    Judge stage shape: a vectorized ``map_batches`` over the diff output
    (the judge is a pure per-row function — no state, no shuffle beyond
    the diff's own co-partitioned groupby).
    """
    import pyarrow as pa

    from ..functions.judge import judge_changes_batch

    diffed = monitor_diff_dataset(ds, key_col=key_col, n_parts=n_parts,
                                  keep_diff_text=True,
                                  content_col=content_col)

    def judge_batch(t: pa.Table) -> pa.Table:
        changed = t.column("changed").to_numpy(zero_copy_only=False)
        diffs = t.column("diff_text").to_pylist()
        goals = [goal if ch else "" for ch in changed]
        m, c, r = judge_changes_batch(goals, diffs, mode=mode)
        # unchanged rows are never judged: null verdict columns
        m = [mm if ch else None for mm, ch in zip(m, changed)]
        c = [cc if ch else None for cc, ch in zip(c, changed)]
        r = [rr if ch else None for rr, ch in zip(r, changed)]
        t = t.drop_columns(["diff_text"])
        t = t.append_column("judged_meaningful", pa.array(m, pa.bool_()))
        t = t.append_column("judge_confidence", pa.array(c, pa.string()))
        t = t.append_column("judge_reason", pa.array(r, pa.string()))
        if only_meaningful:
            import pyarrow.compute as pc

            keep = pc.or_kleene(
                pc.invert(pc.fill_null(t.column("changed"), False)),
                pc.fill_null(t.column("judged_meaningful"), True),
            )
            t = t.filter(keep)
        return t

    return diffed.map_batches(judge_batch, batch_format="pyarrow")


def monitor_diff_dataset(ds, key_col: str = "user_id", n_parts: int = 32,
                         keep_diff_text: bool = False,
                         content_col: str = "props"):
    """Co-partitioned as-of diffs: keys hash into ``n_parts`` partitions
    (process-stable polars hash), ONE groupby("part") shuffle, and each
    partition task loops its keys locally — P map_groups invocations instead
    of one per key, and a hot key costs a loop iteration, not a dedicated
    serialized group frame (round-1 VERDICT skew note). The LCS/JSON diff
    itself is inherently per-snapshot-pair Python (functions/diff.py)."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    def add_part(t: pa.Table) -> pa.Table:
        h = pl.from_arrow(t.column(key_col)).hash(seed=4242)
        part = (h.to_numpy() % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def part_kernel(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["part"]).to_pandas()
        outs = [
            snapshot_changes(g, content_col=content_col,
                             keep_diff_text=keep_diff_text)
            for _, g in df.groupby(key_col, sort=False)
        ]
        return pa.Table.from_pandas(pd.concat(outs), preserve_index=False)

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        part_kernel, batch_format="pyarrow"
    )
