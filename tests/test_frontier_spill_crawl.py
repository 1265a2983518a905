"""Crawl with a tiny frontier spill threshold == in-memory crawl (the spill
path must be semantically invisible)."""

from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
from anycrawl_ray.refmodel import CrawlOptions

SEED = "http://h00.example.test/p/0000"


def test_spilled_frontier_crawl_matches(ray_session, small_corpus, tmp_path):
    opts = CrawlOptions(limit=40, strategy="all")
    normal = run_crawl(SEED, opts, small_corpus, CrawlRunConfig())
    spilled = run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(
            checkpoint_dir=str(tmp_path / "ck"),
            frontier_spill_threshold=8,  # force spill segments constantly
        ),
    )
    # checkpoint_dir turns streamed order on by default: compare the TABLE
    assert spilled.order_table().to_pydict() == normal.order_table().to_pydict()
    assert spilled.completed == normal.completed
    assert spilled.visited_count == normal.visited_count
