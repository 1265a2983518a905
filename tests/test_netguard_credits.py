"""§2.8 scalar functions: SSRF private-IP guard, client-IP allowlisting,
credit arithmetic (reference Webhook.ts:9-46, ipUtils.ts, credits.ts)."""

import duckdb
import pytest

from anycrawl_ray.functions import credits as cr
from anycrawl_ray.functions import netguard as ng
from anycrawl_ray.functions import webhook as wh


# -- private-IP URL guard ------------------------------------------------

@pytest.mark.parametrize("url", [
    "http://localhost/hook",
    "http://localhost:8080/hook",
    "https://127.0.0.1/x",
    "http://[::1]/x",
    "http://10.0.0.5/h",
    "http://172.16.0.1/h",
    "http://172.31.255.1/h",
    "http://192.168.1.1/h",
    "http://169.254.10.10/h",
    "http://[fe80::1]/h",
    "http://[fc00::1]/h",
    "http://[fd12::1]/h",
    "http://127.0.0.2/h",
    "http://0.0.0.0:8080/h",
    "not a url at all",
    "http://",
])
def test_private_targets_blocked(url):
    assert ng.is_private_ip_url(url) is True


@pytest.mark.parametrize("url", [
    "https://hooks.example.com/x",
    "http://8.8.8.8/h",
    "http://172.15.0.1/h",     # outside 172.16/12
    "http://172.32.0.1/h",     # outside 172.16/12
    "http://193.168.1.1/h",
    "http://[2001:db8::1]/h",
])
def test_public_targets_allowed(url):
    assert ng.is_private_ip_url(url) is False


def test_deliver_events_blocks_private_subscription():
    subs = [
        wh.WebhookSubscription("s-priv", "http://192.168.0.9/hook", ("crawl.completed",)),
        wh.WebhookSubscription("s-pub", "http://sink.example.test/hook", ("crawl.completed",)),
    ]
    t = wh.deliver_events([("crawl.completed", "crawl", "j1")], subs,
                          lambda s, e, i, a: True)
    by_sub = {r["subscription_id"]: r for r in t.to_pylist()}
    assert by_sub["s-priv"]["status"] == "blocked_private_ip"
    assert by_sub["s-priv"]["attempts"] == 0
    assert by_sub["s-pub"]["status"] == "delivered"


# -- client IP + allowlist ----------------------------------------------

def test_client_ip_priority():
    assert ng.get_client_ip({"CF-Connecting-IP": "1.1.1.1",
                             "X-Forwarded-For": "2.2.2.2"}) == "1.1.1.1"
    assert ng.get_client_ip({"X-Forwarded-For": " 2.2.2.2 , 3.3.3.3"}) == "2.2.2.2"
    assert ng.get_client_ip({"X-Real-IP": "4.4.4.4"}) == "4.4.4.4"
    assert ng.get_client_ip({}, "5.5.5.5") == "5.5.5.5"
    assert ng.get_client_ip({}) is None


def test_ip_allowlist():
    assert ng.is_ip_allowed("9.9.9.9", None) is True      # no list -> allow
    assert ng.is_ip_allowed("9.9.9.9", []) is True
    assert ng.is_ip_allowed(None, ["1.2.3.4"]) is False   # unknown -> deny
    assert ng.is_ip_allowed("1.2.3.4", ["1.2.3.4"]) is True
    assert ng.is_ip_allowed("192.168.1.77", ["192.168.1.0/24"]) is True
    assert ng.is_ip_allowed("192.168.2.77", ["192.168.1.0/24"]) is False
    assert ng.is_ip_allowed("10.1.2.3", ["bogus/99", "10.0.0.0/8"]) is True
    assert ng.is_ip_allowed("10.1.2.3", ["bogus/99"]) is False


# -- credits -------------------------------------------------------------

CFG = cr.CreditConfig(stealth_credits=2, extract_json_credits=3, summary_credits=2)


def test_proxy_credits_only_stealth():
    assert cr.get_proxy_credits("stealth", CFG) == 2
    assert cr.get_proxy_credits("base", CFG) == 0
    assert cr.get_proxy_credits("auto", CFG) == 0
    assert cr.get_proxy_credits("http://proxy:1", CFG) == 0
    assert cr.get_proxy_credits(None, CFG) == 0


def test_json_credits_need_both_option_and_format():
    assert cr.get_json_extraction_credits(
        {"json_options": {"s": 1}, "formats": ["json"]}, CFG) == 3
    assert cr.get_json_extraction_credits(
        {"json_options": {"s": 1}, "formats": ["json"],
         "extract_source": "html"}, CFG) == 6  # html doubles
    assert cr.get_json_extraction_credits(
        {"json_options": {"s": 1}, "formats": ["markdown"]}, CFG) == 0
    assert cr.get_json_extraction_credits({"formats": ["json"]}, CFG) == 0
    # default config prices json at 0
    assert cr.get_json_extraction_credits(
        {"json_options": {"s": 1}, "formats": ["json"]}) == 0


def test_scrape_charge_details_drop_zero_lines():
    d = cr.build_scrape_charge_details(
        {"proxy": "stealth", "formats": ["json", "summary"],
         "json_options": {"s": 1}}, cfg=CFG)
    assert d["version"] == 1 and d["basis"] == "charged_delta"
    assert d["calculator"] == "scrape_v1"
    codes = [i["code"] for i in d["items"]]
    assert codes == ["base_scrape", "proxy_stealth", "json_llm_extract",
                     "summary_generation"]
    assert d["total"] == 1 + 2 + 3 + 2
    # bare scrape: only the base line survives
    bare = cr.build_scrape_charge_details({}, cfg=CFG)
    assert [i["code"] for i in bare["items"]] == ["base_scrape"]
    assert bare["total"] == 1


def test_search_charge_details():
    d = cr.build_search_charge_details(
        {"pages": 3, "scrape_options": {"proxy": "stealth"},
         "completedScrapeCount": 4},
        template_credits=5, scrape_follow_template_per_call=2, cfg=CFG)
    by = {i["code"]: i["credits"] for i in d["items"]}
    assert by["template_per_call"] == 5
    assert by["search_pages"] == 3
    assert by["search_result_scrape"] == 4 * (1 + 2)
    assert by["search_result_scrape_template"] == 4 * 2
    assert d["total"] == 5 + 3 + 12 + 8
    # no completed scrapes -> no scrape lines
    d2 = cr.build_search_charge_details({"pages": 2})
    assert [i["code"] for i in d2["items"]] == ["search_pages"]


def test_crawl_and_map_builders():
    ci = cr.build_crawl_initial_charge_details(
        {"scrape_options": {"proxy": "stealth"}}, cfg=CFG)
    assert [i["code"] for i in ci["items"]] == ["crawl_initial_page", "proxy_stealth"]
    cp = cr.build_crawl_page_charge_details({"proxy": "stealth"}, cfg=CFG)
    assert [i["code"] for i in cp["items"]] == ["crawl_page_success", "proxy_stealth"]
    m = cr.build_map_charge_details(template_credits=4)
    assert [i["code"] for i in m["items"]] == ["template_per_call", "base_map"]
    assert m["total"] == 5


def test_credits_query_matches_oracle(ray_session):
    from anycrawl_ray import queries as q

    SF = "/root/testdata/sf0.001"
    mine = q.q_credits_charges(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.build_oracle_sql()["credits_charges"]).fetch_arrow_table()
    assert mine.column("doc_id").to_pylist() == ora.column("doc_id").to_pylist()
    assert mine.column("credits").to_pylist() == ora.column("credits").to_pylist()
    assert mine.column("n_items").to_pylist() == ora.column("n_items").to_pylist()


def test_pii_scrub_matches_oracle(ray_session):
    from anycrawl_ray import queries as q

    SF = "/root/testdata/sf0.001"
    mine = q.q_pii_scrub(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.build_oracle_sql()["pii_scrub"]).fetch_arrow_table()
    for col in ("doc_id", "n_email", "n_ip", "n_phone", "masked"):
        assert mine.column(col).to_pylist() == ora.column(col).to_pylist(), col


def test_pii_scrub_masks_synthetic_pii(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from anycrawl_ray import queries as q

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(
             ["contact bob.smith+x@corp.example.com or 10.0.0.1 tel +1 555-010-9999",
              "clean document"], pa.string())}
    )
    pqw.write_table(t, str(tmp_path / "documents.parquet"))
    out = q.q_pii_scrub(str(tmp_path))
    row = out.to_pylist()[0]
    assert row["n_email"] == 1 and row["n_ip"] == 1 and row["n_phone"] == 1
    assert "<EMAIL>" in row["masked"] and "<IP>" in row["masked"]
    assert "<PHONE>" in row["masked"]
    assert "bob.smith" not in row["masked"] and "10.0.0.1" not in row["masked"]
    assert out.to_pylist()[1]["masked"] == "clean document"
