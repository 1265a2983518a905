"""Glob + /regex/ include/exclude matching (reference Base.ts:391-417,
crawlCoordinator.ts:155-168)."""

from anycrawl_ray.pathmatch import PathMatcher, matches_paths


def test_empty_patterns_pass():
    assert matches_paths("http://e.com/a", [], [])


def test_exclude_wins():
    assert not matches_paths("http://e.com/admin/x", [], ["http://e.com/admin/**"])
    assert matches_paths("http://e.com/blog/x", [], ["http://e.com/admin/**"])


def test_include_any():
    inc = ["http://e.com/blog/**", "http://e.com/docs/**"]
    assert matches_paths("http://e.com/docs/a/b", inc, [])
    assert not matches_paths("http://e.com/shop/a", inc, [])


def test_single_star_no_slash():
    assert matches_paths("http://e.com/a/x", ["http://e.com/a/*"], [])
    assert not matches_paths("http://e.com/a/x/y", ["http://e.com/a/*"], [])


def test_double_star_crosses():
    assert matches_paths("http://e.com/a/x/y", ["http://e.com/a/**"], [])
    assert matches_paths("http://e.com/a/", ["http://e.com/a/**"], [])


def test_question_and_class_and_brace():
    assert matches_paths("http://e.com/p1", ["http://e.com/p?"], [])
    assert matches_paths("http://e.com/p5", ["http://e.com/p[0-9]"], [])
    assert not matches_paths("http://e.com/px", ["http://e.com/p[0-9]"], [])
    assert matches_paths("http://e.com/docs/x", ["http://e.com/{docs,blog}/*"], [])


def test_regex_literal():
    # Base.ts:397-406 — /pattern/flags strings are regexes, searched not matched
    assert matches_paths("http://e.com/post/123", ["/post\\/\\d+/"], [])
    assert not matches_paths("http://e.com/post/abc", ["/post\\/\\d+/"], [])
    assert matches_paths("http://e.com/POST/1", ["/post\\/\\d+/i"], [])
    # invalid regex falls back to glob
    assert not matches_paths("http://e.com/x", ["/(unclosed/"], [])


def test_matcher_batch():
    m = PathMatcher(["http://e.com/a/**"], ["http://e.com/a/secret/**"])
    urls = ["http://e.com/a/1", "http://e.com/a/secret/2", "http://e.com/b"]
    assert m.match_many(urls) == [True, False, False]
