"""Monitor normalize/diff unit tests — mirrors reference
packages/scrape/src/__tests__/monitor/diff.test.ts:1-62 and normalize.test.ts."""

from anycrawl_ray.functions.diff import (
    classify_price_change,
    price_diff,
    text_diff,
)
from anycrawl_ray.functions.normalize import (
    hash_content,
    normalize_content,
    truncate_for_storage,
)


def test_identical_no_change():
    r = text_diff("a\nb\nc", "a\nb\nc")
    assert not r.changed and r.ratio == 0 and r.diff_text == ""


def test_changed_ratio_and_lines():
    r = text_diff("price: $19\nin stock", "price: $24\nin stock")
    assert r.changed and r.ratio > 0
    assert "-price: $19" in r.diff_text
    assert "+price: $24" in r.diff_text
    assert r.diff_text.startswith("@@")


def test_diff_context_lines():
    prev = "\n".join(f"l{i}" for i in range(10))
    next_ = prev.replace("l5", "CHANGED")
    r = text_diff(prev, next_)
    assert " l2" in r.diff_text and " l8" in r.diff_text  # ±3 context
    assert " l1" not in r.diff_text


def test_price_diff_nested_path():
    prev = {"plans": [{"price": 10}, {"price": 20}]}
    next_ = {"plans": [{"price": 15}, {"price": 20}]}
    diffs = price_diff(prev, next_)
    assert len(diffs) == 1
    assert diffs[0].path == "plans[0].price"
    assert diffs[0].delta == 5


def test_classify_price_up():
    diffs = price_diff({"price": 10}, {"price": 12})
    assert classify_price_change(diffs) == "price_up"
    diffs = price_diff({"price": 12}, {"price": 10})
    assert classify_price_change(diffs) == "price_down"


def test_classify_stock_and_content():
    assert classify_price_change(price_diff({"stock": 5}, {"stock": 0})) == "stock"
    assert classify_price_change(price_diff({"title": "a"}, {"title": "b"})) == "content"
    assert classify_price_change([]) is None


def test_classify_threshold():
    diffs = price_diff({"price": 100}, {"price": 101})
    assert classify_price_change(diffs, price_change_pct=5) == "content"  # below 5%
    assert classify_price_change(diffs, price_change_pct=0.5) == "price_up"


def test_price_diff_array_growth():
    diffs = price_diff({"xs": [1]}, {"xs": [1, 2]})
    assert len(diffs) == 1 and diffs[0].path == "xs[1]"


def test_normalize_priority_and_volatile():
    data = {"timestamp": "2026-01-01", "markdown": "  # Hi\n\n\n\n\nworld  ", "text": "nope"}
    out = normalize_content(data)
    assert out == "# Hi\n\nworld"  # volatile dropped, md wins, blanks collapsed
    assert normalize_content({"text": "plain"}) == "plain"
    assert normalize_content({"screenshot": "s3://x"}) == ""


def test_ignore_selectors_drop_lines():
    data = {"markdown": "keep\nads-banner here\nkeep2"}
    assert normalize_content(data, ignore_selectors=["ads-banner"]) == "keep\nkeep2"


def test_hash_stability_and_truncate():
    assert hash_content("x") == hash_content("x")
    assert len(hash_content("x")) == 64
    t = truncate_for_storage("a" * 300_000)
    assert t.endswith("…[truncated]") and len(t) < 300_000
