"""Stored-template surface (VERDICT r2 Missing #3).

Re-implements, hermetically and deterministically, the reference's template
subsystem around scrape/crawl/search requests:

- ``{{ var | filter }}`` URL/text rendering with raw/query/path/host filters,
  dotted variable paths, escaped ``\\{{`` placeholders, missing-variable
  passthrough (apps/api/src/utils/urlTemplate.ts:60-104; URL fields allow
  filters, text fields force raw :88-104)
- shallow + deep option merge, request options win when not None
  (apps/api/src/utils/optionMerger.ts:13-67)
- variable definitions: required/defaultValue/type validation
  (string/number/boolean/url/enum) and mapping.target dotted-path injection
  with explicit-params > variables > defaults precedence
  (apps/api/src/utils/templateHandler.ts:547-768)
- domain restrictions: exact/glob patterns over
  hostname/origin/origin+path candidates
  (packages/template-client/src/validator/domainValidator.ts; glob ``*``
  does not cross ``/`` — minimatch semantics, implemented as regex here)
- template access control (createdBy / published+approved,
  templateHandler.ts:30-53), type check, engine validation, and
  template-only request-field validation
  (apps/api/src/utils/templateValidator.ts:12-55)
- the full ``merge_request_with_template`` pipeline
  (templateHandler.ts:314-364) and a deterministic custom-handler hook:
  handler names resolve through the §2.10 step registry and post-process
  the scrape result dict, merged result-over-extraction like
  ``{...data, ...templateResult.data.result}`` (engines/Base.ts:1144-1152).

Everything is a pure function or a tiny in-memory store — no DB, no JS
sandbox — so templates compose with the Ray scrape surface
(functions/extract.py) inside map_batches.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from urllib.parse import quote, urlsplit


# ---------------------------------------------------------------------------
# option merge (optionMerger.ts)
# ---------------------------------------------------------------------------


def merge_options_with_template(template_options: dict, request_options: dict) -> dict:
    """Shallow merge; request values win unless None (optionMerger.ts:13-27)."""
    merged = dict(template_options)
    for k, v in request_options.items():
        if v is not None:
            merged[k] = v
    return merged


def deep_merge_options_with_template(request_options: dict, template_options: dict) -> dict:
    """Recursive dict merge; request wins on scalars/lists (:38-67)."""
    merged = dict(template_options)
    for k, rv in request_options.items():
        tv = template_options.get(k)
        if rv is None:
            continue
        if isinstance(rv, dict) and isinstance(tv, dict):
            merged[k] = deep_merge_options_with_template(rv, tv)
        else:
            merged[k] = rv
    return merged


# ---------------------------------------------------------------------------
# {{ var | filter }} rendering (urlTemplate.ts)
# ---------------------------------------------------------------------------

_PLACEHOLDER_RE = re.compile(
    r"\{\{\s*([A-Za-z0-9_.]+)(?:\s*\|\s*(raw|query|path|host))?\s*\}\}"
)
_ESC = "\x00AC_ESCAPED_LEFT\x00"


def _get_by_path(obj, path: str):
    # same dotted-path walk as variable-mapping resolution — one helper
    # serves both render-time and mapping-time lookups
    return get_nested_value(obj, path) if isinstance(obj, dict) else None


def _to_string_value(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):  # JS String(true) == "true" (before int check!)
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        # JS String(3.0) == "3"
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)
    try:
        return json.dumps(v, separators=(",", ":"))
    except (TypeError, ValueError):
        return str(v)


def _apply_filter(value: str, filt: str | None, allow_filters: bool) -> str:
    f = (filt or "raw") if allow_filters else "raw"
    if f == "query":
        return quote(value, safe="")  # encodeURIComponent
    if f == "path":
        return quote(value, safe="/")  # encodeURIComponent then restore '/'
    if f == "host":
        return re.sub(r"[^a-z0-9.-]", "", value.lower())
    return value


def _render_internal(template: str, variables: dict | None, allow_filters: bool) -> str:
    if not isinstance(template, str) or not template:
        return template
    s = template.replace("\\{{", _ESC)

    def repl(m: re.Match) -> str:
        val = _get_by_path(variables, m.group(1))
        if val is None:
            return m.group(0)  # keep original when missing
        return _apply_filter(_to_string_value(val), m.group(2), allow_filters)

    return _PLACEHOLDER_RE.sub(repl, s).replace(_ESC, "{{")


def render_url_template(template: str, variables: dict | None = None) -> str:
    """URL fields (scrape/crawl): filters active (urlTemplate.ts:88-95)."""
    return _render_internal(template, variables, True)


def render_text_template(template: str, variables: dict | None = None) -> str:
    """Plain-text fields (search.query): filters forced raw (:98-104)."""
    return _render_internal(template, variables, False)


# ---------------------------------------------------------------------------
# domain restrictions (domainValidator.ts)
# ---------------------------------------------------------------------------


def _glob_to_regex(pattern: str) -> re.Pattern:
    """minimatch subset: ``*`` matches within a path segment, ``**`` crosses
    ``/``, ``?`` one non-slash char."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("^" + "".join(out) + "$")


def _normalize_url_for_comparison(url: str) -> tuple[str, str, str, str, str]:
    """-> (normalized_target, origin, hostname, pathname, query+hash)."""
    sp = urlsplit(url)
    if not sp.scheme or not sp.netloc:
        raise ValueError(f"invalid URL: {url!r}")
    origin = f"{sp.scheme}://{sp.netloc}".lower()
    pathname = sp.path or "/"
    tail = (f"?{sp.query}" if sp.query else "") + (f"#{sp.fragment}" if sp.fragment else "")
    return f"{origin}{pathname}{tail}", origin, sp.hostname or "", pathname, tail


def parse_domain_restriction(allowed_domains) -> dict | None:
    """string -> exact[s]; list -> exact; {type, patterns} kept; patterns may
    be comma-delimited strings (domainValidator.ts:120-190)."""
    if isinstance(allowed_domains, str):
        parsed = {"type": "exact", "patterns": [allowed_domains]}
    elif isinstance(allowed_domains, list):
        parsed = {"type": "exact", "patterns": allowed_domains}
    elif isinstance(allowed_domains, dict) and "patterns" in allowed_domains:
        if not isinstance(allowed_domains["patterns"], list):
            return None
        parsed = {
            "type": allowed_domains.get("type", "exact"),
            "patterns": allowed_domains["patterns"],
        }
    else:
        return None
    patterns: list[str] = []
    for p in parsed["patterns"]:
        if isinstance(p, str):
            patterns.extend(seg.strip() for seg in p.split(",") if seg.strip())
    if not patterns:
        return None
    return {"type": parsed["type"] or "exact", "patterns": patterns}


def validate_domain(url: str, restriction: dict | None) -> tuple[bool, str | None]:
    """(is_valid, error) — exact compares normalized URL or bare hostname;
    glob matches minimatch-style over hostname/origin/path candidate forms
    (domainValidator.ts:56-100, 192-246)."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    try:
        target, origin, hostname, pathname, tail = _normalize_url_for_comparison(url)
    except ValueError as e:
        return False, f"Invalid URL format: {e}"
    hostname = hostname.lower()
    path_slash = "/" if pathname == "/" else re.sub(r"/+$", "/", pathname)
    path_noslash = "/" if pathname == "/" else re.sub(r"/+$", "", pathname)
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        if restriction["type"] == "exact":
            try:
                norm_pat = _normalize_url_for_comparison(pattern)[0]
                if norm_pat == target:
                    return True, None
            except ValueError:
                pass
            if hostname == pattern.lower():
                return True, None
        else:  # glob
            rx = _glob_to_regex(pattern.lower())
            candidates = {
                target, origin,
                f"{origin}{path_slash}", f"{origin}{path_noslash}",
                f"{origin}{path_slash}{tail}", f"{origin}{path_noslash}{tail}",
                hostname,
                f"{hostname}{path_slash}", f"{hostname}{path_noslash}",
                f"{hostname}{path_slash}{tail}", f"{hostname}{path_noslash}{tail}",
            }
            if any(rx.match(c) for c in candidates):
                return True, None
    return False, (
        f"URL '{target}' is not allowed for this template. "
        f"Allowed patterns: {', '.join(restriction['patterns'])}"
    )


# ---------------------------------------------------------------------------
# variables (templateHandler.ts:547-768)
# ---------------------------------------------------------------------------


def get_nested_value(obj: dict, path: str):
    if not path:
        return None
    cur = obj
    for seg in path.split("."):
        if not seg or not isinstance(cur, dict):
            return None
        cur = cur.get(seg)
        if cur is None:
            return None
    return cur


def set_nested_value(target: dict, path: str, value) -> None:
    segs = [s for s in path.split(".") if s]
    if not segs:
        return
    cur = target
    for seg in segs[:-1]:
        if not isinstance(cur.get(seg), dict):
            cur[seg] = {}
        cur = cur[seg]
    cur[segs[-1]] = value


def map_variables_to_request_data(
    variables: dict | None, variable_defs: dict | None, request_data: dict
) -> dict:
    """mapping.target injection; explicit params win (:548-576)."""
    if not variables or not variable_defs:
        return dict(request_data)
    updated = dict(request_data)
    for name, value in variables.items():
        cfg = variable_defs.get(name) or {}
        target = (cfg.get("mapping") or {}).get("target")
        if not target:
            continue
        if get_nested_value(updated, target) is not None:
            continue
        set_nested_value(updated, target, value)
    return updated


class TemplateValidationError(ValueError):
    pass


def validate_variables(
    variable_defs: dict | None, provided: dict | None, request_data: dict | None = None
) -> None:
    """Required/type/enum checks; a mapped target already present in the
    request satisfies a required variable (:631-737)."""
    if not variable_defs:
        return
    errors: list[str] = []
    for name, d in variable_defs.items():
        if d.get("required"):
            has_value = provided is not None and provided.get(name) is not None
            has_default = "defaultValue" in d
            has_mapped = False
            target = (d.get("mapping") or {}).get("target")
            if target and request_data:
                has_mapped = get_nested_value(request_data, target) is not None
            if not has_value and not has_default and not has_mapped:
                errors.append(f"Required variable '{name}' is missing")
    for name, value in (provided or {}).items():
        d = variable_defs.get(name)
        if d is None:
            errors.append(f"Unknown variable '{name}' not defined in template")
            continue
        if value is None:
            continue
        t = d.get("type")
        if t == "string":
            if not isinstance(value, str):
                errors.append(f"Variable '{name}' must be a string")
        elif t == "number":
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                errors.append(f"Variable '{name}' must be a finite number")
            elif isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
                errors.append(f"Variable '{name}' must be a finite number")
        elif t == "boolean":
            if not isinstance(value, bool):
                errors.append(f"Variable '{name}' must be a boolean")
        elif t == "url":
            if not isinstance(value, str):
                errors.append(f"Variable '{name}' must be a string (URL)")
            else:
                sp = urlsplit(value)
                if not sp.scheme or not sp.netloc:
                    errors.append(f"Variable '{name}' must be a valid URL")
        elif t == "enum":
            allowed = d.get("values")
            if not allowed and isinstance(d.get("options"), list):
                allowed = [o.get("value") for o in d["options"] if o.get("value") is not None]
            if not allowed:
                errors.append(f"Variable '{name}' enum has no values defined")
            elif value not in allowed:
                errors.append(
                    f"Variable '{name}' must be one of "
                    f"[{', '.join(json.dumps(v) for v in allowed)}], "
                    f"got {json.dumps(value)}"
                )
        else:
            errors.append(f"Variable '{name}' has unknown type '{t}'")
    if errors:
        raise TemplateValidationError(
            "Template variable validation failed:\n- " + "\n- ".join(errors)
        )


def apply_variable_defaults(
    variable_defs: dict | None, provided: dict | None
) -> dict | None:
    """defaultValue fill for missing/None variables (:739-768)."""
    if not variable_defs:
        return provided
    merged = dict(provided) if provided else {}
    default_applied = False
    for name, d in variable_defs.items():
        if merged.get(name) is None and "defaultValue" in d:
            merged[name] = d["defaultValue"]
            default_applied = True
    if provided:
        return merged
    return merged if default_applied else provided


# ---------------------------------------------------------------------------
# template store + processing pipeline (templateHandler.ts)
# ---------------------------------------------------------------------------

AVAILABLE_ENGINES = ("cheerio", "playwright", "puppeteer")

# fields a templated request may carry, by type (templateValidator.ts:21-27)
_ALLOWED_FIELDS = {
    "scrape": frozenset({"template_id", "url", "variables"}),
    "crawl": frozenset({"template_id", "url", "variables"}),
    "search": frozenset({"template_id", "query", "variables"}),
}


@dataclass
class TemplateConfig:
    template_id: str
    template_type: str = "scrape"  # scrape | crawl | search
    req_options: dict = field(default_factory=dict)
    variables: dict | None = None  # name -> {type, required, defaultValue, mapping}
    allowed_domains: object = None  # str | list | {type, patterns}
    custom_handlers: tuple = ()  # §2.10 step names, applied to result dicts
    created_by: str | None = None
    status: str = "draft"
    review_status: str = "pending"


class TemplateStore:
    """In-memory stand-in for the template DB (getTemplate analog)."""

    def __init__(self):
        self._templates: dict[str, TemplateConfig] = {}

    def put(self, t: TemplateConfig) -> None:
        self._templates[t.template_id] = t

    def get(self, template_id: str) -> TemplateConfig | None:
        return self._templates.get(template_id)


def has_template_access(t: TemplateConfig, current_user_id: str | None) -> bool:
    """templateHandler.ts:30-53: no user -> allowed (self-hosted); creator ->
    allowed; otherwise only published+approved."""
    if not current_user_id:
        return True
    if t.created_by == current_user_id:
        return True
    return t.status == "published" and t.review_status == "approved"


def validate_template_only_fields(
    request_data: dict, template_type: str
) -> tuple[bool, list[str]]:
    """(ok, invalid_keys) — templated requests may only carry
    template_id/url-or-query/variables (templateValidator.ts:12-55)."""
    if not request_data.get("template_id"):
        return True, []
    allowed = _ALLOWED_FIELDS[template_type]
    invalid = [k for k in request_data if k not in allowed]
    return (not invalid), invalid


def process_template(
    store: TemplateStore,
    template_id: str,
    url: str,
    request_options: dict,
    template_type: str,
    current_user_id: str | None = None,
    validate_domain_flag: bool = True,
    merge_options: bool = True,
    validate_engine: bool = True,
) -> dict:
    """templateHandler.processTemplate (:76-170) — returns
    {success, engine_name?, merged_options?, error?}."""
    t = store.get(template_id)
    if t is None:
        return {"success": False, "error": f"Template not found: {template_id}"}
    if not has_template_access(t, current_user_id):
        return {
            "success": False,
            "error": "Access denied: You don't have permission to use this template",
        }
    if t.template_type != template_type:
        return {
            "success": False,
            "error": (
                f"Template type mismatch: expected {template_type}, "
                f"got {t.template_type}"
            ),
        }
    opts = t.req_options or {}
    engine = opts.get("engine")
    if validate_engine and engine and engine not in AVAILABLE_ENGINES:
        return {"success": False, "error": f"Invalid template engine: {engine}"}
    if validate_domain_flag:
        ok, err = validate_domain(url, parse_domain_restriction(t.allowed_domains))
        if not ok:
            return {"success": False, "error": f"Domain validation failed: {err}"}
    merged = request_options
    if merge_options:
        merged = merge_options_with_template(opts, request_options)
    return {"success": True, "engine_name": engine, "merged_options": merged}


def merge_request_with_template(
    store: TemplateStore,
    request_data: dict,
    template_type: str,
    current_user_id: str | None = None,
) -> dict:
    """The controller-side merge pipeline (templateHandler.ts:314-364 +
    ScrapeController.ts:70-96): validate variables, apply defaults, map to
    request paths, merge template reqOptions under the request, then render
    the url/query template. Returns the merged request dict (template object
    kept out, like the controller's ``delete requestData.template``)."""
    template_id = request_data.get("template_id")
    if not template_id:
        return dict(request_data)
    t = store.get(template_id)
    if t is None:
        raise TemplateValidationError(f"Template not found: {template_id}")
    if not has_template_access(t, current_user_id):
        raise TemplateValidationError(
            "Access denied: You don't have permission to use this template"
        )
    if t.template_type != template_type:
        raise TemplateValidationError(
            f"Template type mismatch. Expected: {template_type}, got: {t.template_type}"
        )
    merged: dict = dict(request_data)
    validate_variables(t.variables, merged.get("variables"), merged)
    vars_with_defaults = apply_variable_defaults(t.variables, merged.get("variables"))
    if vars_with_defaults is not None:
        merged["variables"] = vars_with_defaults
        merged = map_variables_to_request_data(vars_with_defaults, t.variables, merged)
    elif "variables" in merged:
        del merged["variables"]
    merged = {**merged, **merge_options_with_template(t.req_options or {}, merged)}
    # controller render step: URL fields for scrape/crawl, text for search
    variables = merged.get("variables")
    if template_type == "search":
        if isinstance(merged.get("query"), str):
            merged["query"] = render_text_template(merged["query"], variables)
    else:
        if isinstance(merged.get("url"), str):
            merged["url"] = render_url_template(merged["url"], variables)
    return merged


def apply_custom_handlers(result: dict, t: TemplateConfig, registry=None) -> dict:
    """Deterministic stand-in for sandboxed template handlers
    (engines/Base.ts:1144-1152): each named handler resolves through the
    §2.10 step registry to ``fn(result_dict) -> dict`` and its return value
    merges OVER the extraction result (``{...data, ...result}``)."""
    if not t.custom_handlers:
        return result
    if registry is None:
        from ..steps import default_registry as registry  # noqa: PLC0415
    out = dict(result)
    for name in t.custom_handlers:
        fn = registry.get(name).make_callable()
        handler_out = fn(out)
        if isinstance(handler_out, dict):
            out = {**out, **handler_out}
    return out
