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


def test_relaxed_actor_politeness_full_page_set(ray_session, small_corpus):
    """Relaxed mode + token-bucket politeness actors: with a generous rate
    the crawl still visits the exact reference page SET (pacing, not
    coverage, is what politeness changes)."""
    from anycrawl_ray.corpus import CorpusIndex
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed
    from anycrawl_ray.refmodel import SyntheticFetcher, run_reference_crawl

    opts = CrawlOptions(limit=10_000, strategy="all", per_host_cap=1000)
    golden = run_reference_crawl(
        SEED, CrawlOptions(limit=10_000, strategy="all"),
        SyntheticFetcher(CorpusIndex(small_corpus)))
    out = run_crawl_relaxed(
        SEED, opts, small_corpus,
        CrawlRunConfig(job_id="rlx-pol", politeness="actors",
                       n_fetch_workers=2, n_seen_shards=2))
    assert {o[0] for o in out.order} == {o[0] for o in golden.order}
    assert out.completed + out.failed == golden.completed + golden.failed


def test_relaxed_actor_politeness_rate_limits_wall_clock(ray_session, small_corpus):
    """A single-host crawl at rate R with burst B must take at least
    (pages - B) / R wall seconds — the token buckets really pace dispatch."""
    import time

    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    rate = 20
    limit = 50
    opts = CrawlOptions(limit=limit, strategy="same-hostname", per_host_cap=rate)
    t0 = time.monotonic()
    out = run_crawl_relaxed(
        SEED, opts, small_corpus,
        CrawlRunConfig(job_id="rlx-rate", politeness="actors",
                       n_fetch_workers=2, n_seen_shards=2))
    elapsed = time.monotonic() - t0
    pages = out.completed + out.failed
    assert pages > rate  # enough pages that the bucket must refill
    floor = (pages - rate) / rate
    assert elapsed >= 0.8 * floor, (elapsed, pages, floor)


def test_relaxed_actor_politeness_no_forced_admission(ray_session, small_corpus):
    """Adversarial pacing check (code-review finding): fetches much faster
    than the refill period must NOT bypass the bucket via the conformance
    progress guarantee — relaxed dispatch waits for refill instead."""
    import time

    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    rate = 5
    limit = 25
    opts = CrawlOptions(limit=limit, strategy="same-hostname", per_host_cap=rate)
    t0 = time.monotonic()
    out = run_crawl_relaxed(
        SEED, opts, small_corpus,
        CrawlRunConfig(job_id="rlx-noforce", politeness="actors",
                       n_fetch_workers=2, n_seen_shards=2))
    elapsed = time.monotonic() - t0
    pages = out.completed + out.failed
    assert pages > rate
    floor = (pages - rate) / rate
    assert elapsed >= 0.9 * floor, (elapsed, pages, floor)
