"""M12 scrape_paths: content gated, link expansion unaffected (engines/
Base.ts:517-554) — pipeline vs reference model."""

import pyarrow.parquet as pq

from anycrawl_ray.corpus import CorpusIndex
from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
from anycrawl_ray.refmodel import CrawlOptions, SyntheticFetcher, run_reference_crawl

SEED = "http://h00.example.test/p/0000"
GATE = ("http://h00.example.test/p/00[0-2]*",)


def test_scrape_paths_gates_content_not_links(ray_session, small_corpus, tmp_path):
    opts = CrawlOptions(limit=25, scrape_paths=GATE)
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(CorpusIndex(small_corpus)))
    out = run_crawl(
        SEED, opts, small_corpus, CrawlRunConfig(spans_out_dir=str(tmp_path / "sp"))
    )
    # crawl order/counters unchanged by the gate (links still expand)
    assert out.order == golden.order
    ungated = run_reference_crawl(
        SEED, CrawlOptions(limit=25), SyntheticFetcher(CorpusIndex(small_corpus))
    )
    assert golden.order == ungated.order

    # persisted content == the model's emitted set, a strict subset
    t = pq.read_table(str(tmp_path / "sp"))
    ok_mask = t.column("ok").to_pylist()
    persisted = {
        u for u, okv in zip(t.column("url").to_pylist(), ok_mask) if okv
    }
    assert persisted == set(golden.emitted)
    ok_urls = {u for u, _, ok in golden.order if ok}
    assert persisted < ok_urls  # gate actually dropped some pages
    assert all(u.startswith("http://h00.example.test/p/00") for u in persisted)
