"""Search -> scrape fan-out pipeline (J3, reference SearchController flow).

Reference: each SERP result spawns a scrape job under the parent search job
and results merge back onto the SERP rows by URL
(reference apps/api/src/controllers/v1/SearchController.ts:196-330;
page-order reassembly SearchService.ts:280-306).

Ray shape: SERP fixture pages -> parse (map_batches-able pure fn) -> page-
order reassembly -> fan-out fetch of result URLs through the SAME fetch/parse
stage the crawler uses -> left join SERP rows <- fetched docs on url
(broadcast — the SERP side is small by construction: <=200 results/query).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.serp import parse_serp, reassemble_pages
from ..stages.fetch import FetchParseActor, JobContext


def serp_fixture_pages(urls: list[str], per_page: int = 10) -> list[tuple[int, str]]:
    """Deterministic SERP HTML pages over the given result URLs."""
    pages = []
    for p in range(0, len(urls), per_page):
        blocks = "".join(
            f'<div jscontroller="SC7lYd"><a href="{u}"><h3>Result {p + i}</h3></a>'
            f'<div data-sncf="1">desc for {u}</div></div>'
            for i, u in enumerate(urls[p : p + per_page])
        )
        pages.append((p // per_page, f"<html><body>{blocks}</body></html>"))
    return pages


def search_scrape(
    corpus: pa.Table | ray.ObjectRef,
    result_urls: list[str],
    limit: int = 100,
    concurrency: int = 2,
) -> pa.Table:
    """SERP parse -> reassemble -> scrape fan-out -> merge by url."""
    pages = [(i, parse_serp(html)) for i, html in serp_fixture_pages(result_urls)]
    serp_rows = reassemble_pages(pages, limit)

    corpus_ref = corpus if isinstance(corpus, ray.ObjectRef) else ray.put(corpus)
    urls = [r["url"] for r in serp_rows]
    wave = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "discovery_seq": pa.array(range(len(urls)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(wave)
    fetched = ds.map_batches(
        FetchParseActor,
        fn_constructor_args=([corpus_ref], JobContext(filter_links=False)),
        concurrency=concurrency,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=0.5,
    )
    meta = pa.concat_tables(
        [b for b in fetched.iter_batches(batch_size=None, batch_format="pyarrow")]
    ).sort_by("discovery_seq")

    by_url = {
        meta.column("url")[i].as_py(): (
            meta.column("ok")[i].as_py(),
            meta.column("status_code")[i].as_py(),
            meta.column("bytes")[i].as_py(),
        )
        for i in range(meta.num_rows)
    }
    ok_col, status_col, bytes_col = [], [], []
    for r in serp_rows:
        ok, status, nbytes = by_url.get(r["url"], (False, 0, 0))
        ok_col.append(ok)
        status_col.append(status)
        bytes_col.append(nbytes)
    return pa.table(
        {
            "url": pa.array([r["url"] for r in serp_rows], pa.string()),
            "title": pa.array([r["title"] for r in serp_rows], pa.string()),
            "description": pa.array([r["description"] for r in serp_rows], pa.string()),
            "scraped_ok": pa.array(ok_col, pa.bool_()),
            "status_code": pa.array(status_col, pa.int32()),
            "bytes": pa.array(bytes_col, pa.int64()),
        }
    )
