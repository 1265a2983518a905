"""Politeness-actor crawl mode ≡ driver per-host-cap ≡ reference model,
plus hot-host skew lineage."""

import pytest

from anycrawl_ray.corpus import CorpusIndex
from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
from anycrawl_ray.refmodel import CrawlOptions, SyntheticFetcher, run_reference_crawl

SEED = "http://h00.example.test/p/0000"


def test_politeness_actor_mode_matches_driver_and_reference(ray_session, small_corpus):
    opts = CrawlOptions(limit=30, strategy="all", per_host_cap=2)
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(CorpusIndex(small_corpus)))
    driver = run_crawl(SEED, opts, small_corpus, CrawlRunConfig(politeness="driver"))
    actors = run_crawl(SEED, opts, small_corpus, CrawlRunConfig(politeness="actors"))
    assert driver.order == golden.order
    assert actors.order == golden.order
    assert actors.completed == golden.completed
    assert actors.failed == golden.failed
    assert actors.rounds == golden.rounds


def test_host_skew_lineage_and_cap_effect(ray_session, small_corpus):
    """Without a cap the zipf hot host dominates waves; with a cap its share
    is bounded — visible in the emitted per-round lineage."""
    uncapped = run_crawl(
        SEED, CrawlOptions(limit=40, strategy="all", wave_size=10),
        small_corpus, CrawlRunConfig(),
    )
    capped = run_crawl(
        SEED, CrawlOptions(limit=40, strategy="all", wave_size=10, per_host_cap=3),
        small_corpus, CrawlRunConfig(),
    )
    assert len(uncapped.host_stats) == uncapped.rounds
    # host_stats rows: (round, host, top_count, share)
    assert max(c for _, _, c, _ in uncapped.host_stats) > 3  # hot host floods
    assert max(c for _, _, c, _ in capped.host_stats) <= 3   # cap bounds it
