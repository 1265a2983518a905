"""Templates surface parity matrix (templateHandler.ts / optionMerger.ts /
urlTemplate.ts / domainValidator.ts / templateValidator.ts)."""

import pytest

from anycrawl_ray.functions.templates import (
    TemplateConfig,
    TemplateStore,
    TemplateValidationError,
    apply_custom_handlers,
    apply_variable_defaults,
    deep_merge_options_with_template,
    has_template_access,
    map_variables_to_request_data,
    merge_options_with_template,
    merge_request_with_template,
    parse_domain_restriction,
    process_template,
    render_text_template,
    render_url_template,
    validate_domain,
    validate_template_only_fields,
    validate_variables,
)


# -- rendering ----------------------------------------------------------------


def test_render_filters():
    v = {"q": "a b/c", "h": "My.Host!", "n": 3, "b": True}
    assert render_url_template("{{ q }}", v) == "a b/c"
    assert render_url_template("{{ q | query }}", v) == "a%20b%2Fc"
    assert render_url_template("{{ q | path }}", v) == "a%20b/c"
    assert render_url_template("{{ h | host }}", v) == "my.host"
    assert render_url_template("{{ n }}x{{ b }}", v) == "3xtrue"


def test_render_missing_keeps_token_and_escape():
    assert render_url_template("{{ nope }}", {"a": 1}) == "{{ nope }}"
    assert render_url_template(r"\{{ a }} {{ a }}", {"a": 1}) == "{{ a }} 1"


def test_render_dotted_path_and_json():
    v = {"u": {"name": "x", "tags": [1, 2]}}
    assert render_url_template("{{ u.name }}", v) == "x"
    assert render_url_template("{{ u.tags }}", v) == "[1,2]"


def test_text_template_forces_raw():
    assert render_text_template("{{ q | query }}", {"q": "a b"}) == "a b"


# -- option merge -------------------------------------------------------------


def test_shallow_merge_request_wins_unless_none():
    assert merge_options_with_template(
        {"a": 1, "b": 2}, {"b": 3, "c": 4, "d": None}
    ) == {"a": 1, "b": 3, "c": 4}


def test_deep_merge_nested():
    req = {"o": {"x": 1}, "s": 9}
    tpl = {"o": {"x": 0, "y": 2}, "s": 1, "t": 7}
    assert deep_merge_options_with_template(req, tpl) == {
        "o": {"x": 1, "y": 2}, "s": 9, "t": 7,
    }


# -- domain validation ---------------------------------------------------------


def test_parse_domain_restriction_forms():
    assert parse_domain_restriction("a.com") == {"type": "exact", "patterns": ["a.com"]}
    assert parse_domain_restriction(["a.com, b.com"]) == {
        "type": "exact", "patterns": ["a.com", "b.com"],
    }
    assert parse_domain_restriction({"type": "glob", "patterns": ["*.a.com"]}) == {
        "type": "glob", "patterns": ["*.a.com"],
    }
    assert parse_domain_restriction(None) is None
    assert parse_domain_restriction({"patterns": "nope"}) is None


def test_validate_domain_exact_and_glob():
    exact = {"type": "exact", "patterns": ["shop.test"]}
    ok, _ = validate_domain("https://shop.test/x?q=1", exact)
    assert ok
    ok, err = validate_domain("https://evil.test/", exact)
    assert not ok and "not allowed" in err

    glob = {"type": "glob", "patterns": ["*.shop.test"]}
    assert validate_domain("https://api.shop.test/v1", glob)[0]
    assert not validate_domain("https://shop.test/", glob)[0]  # * needs a label
    path_glob = {"type": "glob", "patterns": ["shop.test/v1/*"]}
    assert validate_domain("https://shop.test/v1/data", path_glob)[0]
    assert not validate_domain("https://shop.test/v2/data", path_glob)[0]


def test_validate_domain_no_restriction_allows_all():
    assert validate_domain("https://anything/", None)[0]


# -- variables -----------------------------------------------------------------


DEFS = {
    "slug": {"type": "string", "required": True, "mapping": {"target": "options.slug"}},
    "page": {"type": "number", "defaultValue": 1},
    "mode": {"type": "enum", "values": ["a", "b"]},
    "link": {"type": "url"},
    "flag": {"type": "boolean"},
}


def test_validate_variables_matrix():
    validate_variables(DEFS, {"slug": "x", "page": 2, "mode": "a",
                              "link": "https://a.io", "flag": True})
    with pytest.raises(TemplateValidationError, match="Required variable 'slug'"):
        validate_variables(DEFS, {})
    with pytest.raises(TemplateValidationError, match="Unknown variable"):
        validate_variables(DEFS, {"slug": "x", "zz": 1})
    with pytest.raises(TemplateValidationError, match="must be a finite number"):
        validate_variables(DEFS, {"slug": "x", "page": "two"})
    with pytest.raises(TemplateValidationError, match="must be one of"):
        validate_variables(DEFS, {"slug": "x", "mode": "z"})
    with pytest.raises(TemplateValidationError, match="valid URL"):
        validate_variables(DEFS, {"slug": "x", "link": "notaurl"})
    with pytest.raises(TemplateValidationError, match="must be a boolean"):
        validate_variables(DEFS, {"slug": "x", "flag": 1})
    # booleans are not numbers (JS typeof true != 'number')
    with pytest.raises(TemplateValidationError, match="finite number"):
        validate_variables(DEFS, {"slug": "x", "page": True})


def test_required_satisfied_by_mapped_target_or_default():
    validate_variables(DEFS, None, {"options": {"slug": "present"}})
    defs = {"p": {"type": "number", "required": True, "defaultValue": 5}}
    validate_variables(defs, None, {})


def test_apply_defaults_semantics():
    assert apply_variable_defaults(DEFS, {"slug": "x"}) == {"slug": "x", "page": 1}
    assert apply_variable_defaults(DEFS, None) == {"page": 1}
    assert apply_variable_defaults({"a": {"type": "string"}}, None) is None


def test_mapping_explicit_params_win():
    out = map_variables_to_request_data(
        {"slug": "v"}, DEFS, {"options": {"slug": "explicit"}}
    )
    assert out["options"]["slug"] == "explicit"
    out = map_variables_to_request_data({"slug": "v"}, DEFS, {})
    assert out["options"]["slug"] == "v"


# -- access / field validation ---------------------------------------------------


def _tpl(**kw):
    return TemplateConfig(template_id="t1", **kw)


def test_access_rules():
    assert has_template_access(_tpl(created_by="u1"), None)  # self-hosted
    assert has_template_access(_tpl(created_by="u1"), "u1")
    assert not has_template_access(_tpl(created_by="u1"), "u2")
    assert has_template_access(
        _tpl(created_by="u1", status="published", review_status="approved"), "u2"
    )


def test_template_only_fields():
    ok, bad = validate_template_only_fields(
        {"template_id": "t", "url": "u", "variables": {}}, "scrape"
    )
    assert ok and not bad
    ok, bad = validate_template_only_fields(
        {"template_id": "t", "url": "u", "engine": "x"}, "crawl"
    )
    assert not ok and bad == ["engine"]
    ok, _ = validate_template_only_fields({"url": "u", "engine": "x"}, "scrape")
    assert ok  # no template_id -> no restriction
    ok, bad = validate_template_only_fields({"template_id": "t", "url": "u"}, "search")
    assert not ok and bad == ["url"]  # search allows query, not url


# -- process/merge pipeline -------------------------------------------------------


def _store():
    s = TemplateStore()
    s.put(TemplateConfig(
        template_id="tp",
        template_type="scrape",
        req_options={"engine": "cheerio", "formats": ["markdown"], "timeout": 5000},
        variables=DEFS,
        allowed_domains={"type": "glob", "patterns": ["*.shop.test"]},
    ))
    return s


def test_process_template_flow():
    s = _store()
    r = process_template(s, "tp", "https://api.shop.test/x", {"timeout": 100}, "scrape")
    assert r["success"] and r["engine_name"] == "cheerio"
    assert r["merged_options"]["timeout"] == 100  # request wins
    assert r["merged_options"]["formats"] == ["markdown"]

    assert not process_template(s, "zz", "https://a/", {}, "scrape")["success"]
    assert "type mismatch" in process_template(s, "tp", "https://a/", {}, "crawl")["error"]
    assert "Domain validation" in process_template(
        s, "tp", "https://evil.test/", {}, "scrape"
    )["error"]
    s.put(TemplateConfig(template_id="bad", req_options={"engine": "chrome9"}))
    assert "Invalid template engine" in process_template(
        s, "bad", "https://a.b/", {}, "scrape"
    )["error"]


def test_merge_request_with_template_renders_url():
    s = _store()
    req = {
        "template_id": "tp",
        "url": "https://w1.shop.test/item/{{ slug | path }}?p={{ page }}",
        "variables": {"slug": "a/b 7"},
    }
    out = merge_request_with_template(s, req, "scrape")
    assert out["url"] == "https://w1.shop.test/item/a/b%207?p=1"  # default page=1
    assert out["engine"] == "cheerio"
    assert out["options"]["slug"] == "a/b 7"  # mapping target injected
    with pytest.raises(TemplateValidationError, match="Required variable"):
        merge_request_with_template(s, {"template_id": "tp", "url": "u"}, "scrape")


def test_merge_request_search_renders_query_raw():
    s = TemplateStore()
    s.put(TemplateConfig(template_id="ts", template_type="search",
                         req_options={"limit": 10},
                         variables={"q": {"type": "string"}}))
    out = merge_request_with_template(
        s, {"template_id": "ts", "query": "{{ q | query }}", "variables": {"q": "a b"}},
        "search",
    )
    assert out["query"] == "a b"  # text render forces raw
    assert out["limit"] == 10


def test_custom_handlers_through_step_registry():
    from anycrawl_ray.steps import StepRegistry

    reg = StepRegistry()
    reg.register("add_score", lambda d: {"score": len(d.get("markdown", ""))})
    t = TemplateConfig(template_id="t", custom_handlers=("add_score",))
    out = apply_custom_handlers({"markdown": "abcd", "title": "T"}, t, reg)
    assert out == {"markdown": "abcd", "title": "T", "score": 4}
