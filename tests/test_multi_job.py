"""K concurrent crawl jobs sharing ONE persistent fetch-worker pool.

The reference serves many jobs from one shared BullMQ worker pool, each job
carrying its own options (reference packages/scrape/src/index.ts worker
concurrency; EngineConfigurator.ts per-job engine config). The rebuild's
equivalent: ``build_fetch_pool`` once, then each ``run_crawl*`` call
registers its JobContext under its ``job_id`` on every worker
(``_PoolExecutor.register_job``) and tags every dispatched chunk, so
concurrent jobs with different strategies/span dirs stay isolated while
sharing actors. Seen-sets, frontiers and politeness state are per-job by
construction (created inside each run)."""

import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as pq
import ray

from anycrawl_ray.corpus import CorpusIndex
from anycrawl_ray.pipelines.crawl import (
    CrawlOptions,
    CrawlRunConfig,
    build_fetch_pool,
    make_job_context,
    run_crawl,
    run_crawl_relaxed,
)
from anycrawl_ray.refmodel import SyntheticFetcher, run_reference_crawl

SEED = "http://h00.example.test/p/0000"


def _pool(corpus, n_workers=3):
    opts = CrawlOptions(limit=1, strategy="all")
    ctx = make_job_context(SEED, opts, CrawlRunConfig(job_id="pool-default"))
    return build_fetch_pool(ray.put(corpus), n_workers, ctx)


def test_concurrent_jobs_share_pool_isolated_results(ray_session, small_corpus, tmp_path):
    """4 relaxed jobs at once on one pool: each visits the same page SET a
    solo run does, spans land in each job's own dir, seen-sets isolated."""
    opts = CrawlOptions(limit=40, strategy="all")
    solo = run_crawl_relaxed(SEED, opts, small_corpus,
                             CrawlRunConfig(job_id="solo"))
    want_pages = {(u, d) for u, d, ok in solo.order}

    pool = _pool(small_corpus)
    try:
        def one(i):
            cfg = CrawlRunConfig(
                job_id=f"job{i}",
                spans_out_dir=str(tmp_path / f"job{i}" / "spans"),
            )
            return run_crawl_relaxed(SEED, opts, small_corpus, cfg,
                                     executor=pool)

        with ThreadPoolExecutor(4) as tp:
            outs = list(tp.map(one, range(4)))
    finally:
        pool.shutdown()

    for i, out in enumerate(outs):
        assert {(u, d) for u, d, ok in out.order} == want_pages, i
        assert out.completed == solo.completed
        assert out.failed == solo.failed
        # spans went to THIS job's dir (per-job ctx took effect worker-side);
        # span rows cover every fetched page INCLUDING failures (ok=False)
        t = pq.read_table(str(tmp_path / f"job{i}" / "spans"))
        assert set(t.column("url").to_pylist()) == {u for u, d, ok in out.order}
        # per-job counters carry the right job_id
        assert set(out.counters.column("job_id").to_pylist()) == {f"job{i}"}


def test_jobs_with_different_options_on_one_pool(ray_session, small_corpus, tmp_path):
    """Heterogeneous options: a same-domain job and an all-hosts job run
    concurrently on the SAME pool and each matches its own solo run —
    proving chunk-level ctx selection, not last-registration-wins."""
    opts_a = CrawlOptions(limit=30, strategy="same-domain")
    opts_b = CrawlOptions(limit=30, strategy="all")
    solo_a = run_crawl_relaxed(SEED, opts_a, small_corpus,
                               CrawlRunConfig(job_id="sa"))
    solo_b = run_crawl_relaxed(SEED, opts_b, small_corpus,
                               CrawlRunConfig(job_id="sb"))
    page_set = lambda o: {(u, d) for u, d, ok in o.order}  # noqa: E731
    assert page_set(solo_a) != page_set(solo_b)  # options genuinely differ

    pool = _pool(small_corpus)
    try:
        def run(tag, opts):
            return run_crawl_relaxed(
                SEED, opts, small_corpus,
                CrawlRunConfig(job_id=tag,
                               spans_out_dir=str(tmp_path / tag)),
                executor=pool)

        with ThreadPoolExecutor(2) as tp:
            fa = tp.submit(run, "het-a", opts_a)
            fb = tp.submit(run, "het-b", opts_b)
            out_a, out_b = fa.result(), fb.result()
    finally:
        pool.shutdown()

    assert page_set(out_a) == page_set(solo_a)
    assert page_set(out_b) == page_set(solo_b)


def test_conformance_mode_on_shared_pool_matches_reference(ray_session, small_corpus):
    """Wave-order conformance survives the shared pool + job registration."""
    opts = CrawlOptions(limit=40, strategy="all", wave_size=8)
    golden = run_reference_crawl(SEED, opts,
                                 SyntheticFetcher(CorpusIndex(small_corpus)))
    pool = _pool(small_corpus)
    try:
        out = run_crawl(SEED, opts, small_corpus,
                        CrawlRunConfig(job_id="conf-shared"), executor=pool)
    finally:
        pool.shutdown()
    assert out.order == golden.order
    assert out.completed == golden.completed


def test_sequential_jobs_reuse_pool_no_cross_contamination(ray_session, small_corpus, tmp_path):
    """Back-to-back jobs with different span dirs on one pool: the second
    job's spans never leak into the first's dir (regression guard for the
    pre-registration behavior where the pool's construction ctx won)."""
    opts = CrawlOptions(limit=20, strategy="all")
    pool = _pool(small_corpus)
    try:
        for tag in ("first", "second"):
            run_crawl_relaxed(
                SEED, opts, small_corpus,
                CrawlRunConfig(job_id=tag,
                               spans_out_dir=str(tmp_path / tag)),
                executor=pool)
    finally:
        pool.shutdown()
    t1 = pq.read_table(str(tmp_path / "first"))
    t2 = pq.read_table(str(tmp_path / "second"))
    assert t1.num_rows == t2.num_rows > 0
    assert os.listdir(tmp_path / "first") and os.listdir(tmp_path / "second")
