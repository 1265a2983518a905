"""Monitor-diff and search->scrape pipelines (J3/J5 end-to-end)."""

import pandas as pd
import pytest

from anycrawl_ray.corpus import host_name, page_url
from anycrawl_ray.pipelines.monitor import snapshot_changes
from anycrawl_ray.pipelines.search import search_scrape, serp_fixture_pages


def test_snapshot_changes_pairwise():
    g = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04"]),
            "props": ['{"price": 10}', '{"price": 10}', '{"price": 12}', "not json at all"],
        }
    )
    out = snapshot_changes(g)
    assert out["changed"].tolist() == [False, False, True, True]
    assert out["change_type"].tolist()[2] == "price_up"
    assert out["change_type"].tolist()[3] == "content"  # non-JSON -> content
    assert out["ratio"].iloc[2] > 0
    assert out["content_hash"].iloc[0] == out["content_hash"].iloc[1]


def test_snapshot_changes_out_of_order_input():
    g = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_id": [2, 1],
            "ts": pd.to_datetime(["2026-01-02", "2026-01-01"]),
            "props": ["b", "a"],
        }
    )
    out = snapshot_changes(g)  # as-of ordering by (ts, event_id)
    assert out["event_id"].tolist() == [1, 2]
    assert out["changed"].tolist() == [False, True]


def test_serp_fixture_pagination():
    pages = serp_fixture_pages([f"http://r/{i}" for i in range(23)], per_page=10)
    assert [p[0] for p in pages] == [0, 1, 2]


def test_search_scrape_merge(ray_session, small_corpus):
    live = [page_url(host_name(0), i) for i in range(12)]
    dead = [page_url(host_name(0), 9000)]
    t = search_scrape(small_corpus, live + dead, limit=13)
    assert t.num_rows == 13
    ok = t.column("scraped_ok").to_pylist()
    assert all(ok[:12]) and not ok[12]  # dead URL merged with scraped_ok=False
    assert t.column("status_code").to_pylist()[12] == 404
    assert t.column("url").to_pylist() == live + dead  # page-order preserved
    assert all(b > 0 for b in t.column("bytes").to_pylist()[:12])
