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
                     time_cols: tuple[str, ...] = ("ts", "event_id")) -> pd.DataFrame:
    """Pairwise consecutive diffs for one monitored key's snapshots."""
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
            rows.append({"changed": False, "ratio": 0.0, "change_type": None,
                         "content_hash": hash_content(norm)})
        else:
            td = text_diff(prev, norm)
            ctype = None
            if td.changed and prev_json is not None and cur_json is not None:
                ctype = classify_price_change(price_diff(prev_json, cur_json))
            elif td.changed:
                ctype = "content"
            rows.append({"changed": td.changed, "ratio": round(td.ratio, 6),
                         "change_type": ctype, "content_hash": hash_content(norm)})
        prev = norm
        prev_json = cur_json
    out = g.reset_index(drop=True)
    diff_df = pd.DataFrame(rows)
    return pd.concat([out, diff_df], axis=1)


def monitor_diff_dataset(ds, key_col: str = "user_id"):
    """groupby(key) -> as-of ordered pairwise diffs (Ray Dataset in/out)."""
    return ds.groupby(key_col).map_groups(snapshot_changes, batch_format="pandas")
