"""Credit arithmetic — deterministic model of the reference's billing math
(SURVEY.md §2.8 "credit arithmetic"; reference ``packages/libs/src/
credits.ts``).

Semantics mirrored:

- proxy surcharge (``credits.ts:100-110``): only resolved mode ``stealth``
  costs extra (default 2); base/auto/custom cost 0.
- JSON-extraction surcharge (``credits.ts:112-126``): charged only when
  ``json_options`` present AND ``"json" in formats``; doubled when
  ``extract_source == "html"``.
- summary surcharge (``credits.ts:128-141``): charged when ``"summary" in
  formats``.
- itemized charge details (``credits.ts:60-97``): items with credits <= 0
  (or non-finite) are dropped; total = sum of surviving items; envelope
  ``{version: 1, basis: "charged_delta", calculator, total, items}``.
- per-operation builders: scrape (base 1), crawl initial (1), crawl
  per-page success (1), search (pages + completed scrapes x per-scrape +
  template per-call lines), map (base 1) — ``credits.ts:143-260``.

Config defaults follow the reference env defaults (stealth 2, json 0,
summary 0); pass a ``CreditConfig`` to model deployments that price the LLM
add-ons.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class CreditConfig:
    stealth_credits: int = 2
    extract_json_credits: int = 0
    summary_credits: int = 0


def resolved_proxy_mode(proxy_value: str | None) -> str | None:
    """'base' | 'stealth' | 'auto' pass through; any other non-empty value
    is a custom proxy URL (reference getResolvedProxyMode)."""
    if not proxy_value:
        return None
    if proxy_value in ("base", "stealth", "auto"):
        return proxy_value
    return "custom"


def get_proxy_credits(proxy_value: str | None, cfg: CreditConfig = CreditConfig()) -> int:
    return cfg.stealth_credits if resolved_proxy_mode(proxy_value) == "stealth" else 0


def get_json_extraction_credits(options: dict, cfg: CreditConfig = CreditConfig()) -> int:
    has_json = bool(options.get("json_options")) and "json" in (options.get("formats") or [])
    if not has_json or cfg.extract_json_credits <= 0:
        return 0
    extract_source = options.get("extract_source") or "markdown"
    return cfg.extract_json_credits * 2 if extract_source == "html" else cfg.extract_json_credits


def get_summary_credits(options: dict, cfg: CreditConfig = CreditConfig()) -> int:
    if "summary" not in (options.get("formats") or []) or cfg.summary_credits <= 0:
        return 0
    return cfg.summary_credits


def _normalize_item(code: str, credits, meta: dict | None = None) -> dict | None:
    try:
        numeric = float(credits)
    except (TypeError, ValueError):
        return None
    if not math.isfinite(numeric) or numeric <= 0:
        return None
    item = {"code": code, "credits": int(numeric) if numeric.is_integer() else numeric}
    if meta:
        item["meta"] = dict(meta)
    return item


def _build(calculator: str, raw_items: list[dict | None]) -> dict:
    items = [i for i in raw_items if i]
    return {
        "version": 1,
        "basis": "charged_delta",
        "calculator": calculator,
        "total": sum(i["credits"] for i in items),
        "items": items,
    }


def calculate_scrape_credits(options: dict | None = None,
                             cfg: CreditConfig = CreditConfig()) -> int:
    options = options or {}
    return (1 + get_proxy_credits(options.get("proxy"), cfg)
            + get_json_extraction_credits(options, cfg)
            + get_summary_credits(options, cfg))


def _scrape_items(base_code: str, options: dict, cfg: CreditConfig,
                  template_credits: float = 0) -> list[dict | None]:
    extract_source = options.get("extract_source") or "markdown"
    return [
        _normalize_item("template_per_call", template_credits),
        _normalize_item(base_code, 1),
        _normalize_item("proxy_stealth", get_proxy_credits(options.get("proxy"), cfg)),
        _normalize_item("json_llm_extract", get_json_extraction_credits(options, cfg),
                        {"extract_source": extract_source}),
        _normalize_item("summary_generation", get_summary_credits(options, cfg)),
    ]


def build_scrape_charge_details(options: dict | None = None, *,
                                template_credits: float = 0,
                                cfg: CreditConfig = CreditConfig()) -> dict:
    return _build("scrape_v1",
                  _scrape_items("base_scrape", options or {}, cfg, template_credits))


def build_crawl_initial_charge_details(options: dict | None = None, *,
                                       template_credits: float = 0,
                                       cfg: CreditConfig = CreditConfig()) -> dict:
    scrape_options = (options or {}).get("scrape_options") or {}
    return _build("crawl_initial_v1",
                  _scrape_items("crawl_initial_page", scrape_options, cfg,
                                template_credits))


def build_crawl_page_charge_details(options: dict | None = None, *,
                                    cfg: CreditConfig = CreditConfig()) -> dict:
    return _build("crawl_page_v1",
                  _scrape_items("crawl_page_success", options or {}, cfg)[1:])


def build_search_charge_details(options: dict | None = None, *,
                                template_credits: float = 0,
                                scrape_follow_template_per_call: float = 0,
                                cfg: CreditConfig = CreditConfig()) -> dict:
    options = options or {}
    pages = float(options.get("pages") or 1)
    completed = int(options.get("completedScrapeCount") or 0)
    should_charge = bool(options.get("scrape_options")) and completed > 0
    per_scrape = calculate_scrape_credits(options["scrape_options"], cfg) if should_charge else 0
    scrape_credits = completed * per_scrape if should_charge else 0
    follow_template = (completed * scrape_follow_template_per_call
                       if should_charge and scrape_follow_template_per_call > 0 else 0)
    return _build("search_v1", [
        _normalize_item("template_per_call", template_credits),
        _normalize_item("search_pages", pages, {"pages": int(pages)}),
        _normalize_item("search_result_scrape", scrape_credits, {
            "completed_scrape_count": completed,
            "per_result_credits": per_scrape,
        }),
        _normalize_item("search_result_scrape_template", follow_template, {
            "completed_scrape_count": completed,
            "per_result_template_credits": scrape_follow_template_per_call,
        }),
    ])


def build_map_charge_details(*, template_credits: float = 0) -> dict:
    return _build("map_v1", [
        _normalize_item("template_per_call", template_credits),
        _normalize_item("base_map", 1),
    ])
