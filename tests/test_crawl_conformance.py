"""Crawl conformance: Ray pipeline ≡ transcribed reference BFS, byte-for-byte.

FIXTURES.md §C: seeds × strategy × limit × max_depth × path filters ×
politeness. Golden = refmodel.run_reference_crawl (the single-threaded
transcription of reference packages/scrape/src/utils/crawlCoordinator.ts).
Compared: crawl order (url, depth, ok sequence), final URL-seen set,
completed/failed counters, and per-row span-sequence equality.
"""

import pyarrow.parquet as pq
import pytest

from anycrawl_ray.corpus import CorpusIndex
from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
from anycrawl_ray.refmodel import CrawlOptions, SyntheticFetcher, run_reference_crawl

SEED = "http://h00.example.test/p/0000"


def assert_conformance(small_corpus, seed, opts, cfg=None, **run_kw):
    idx = CorpusIndex(small_corpus)
    golden = run_reference_crawl(seed, opts, SyntheticFetcher(idx))
    out = run_crawl(seed, opts, small_corpus, cfg or CrawlRunConfig(), **run_kw)
    assert out.order == golden.order, (
        f"crawl order mismatch:\n ray={out.order}\n ref={golden.order}"
    )
    assert out.completed == golden.completed
    assert out.failed == golden.failed
    assert out.visited_count == len(golden.visited)
    assert out.rounds == golden.rounds
    return golden, out


@pytest.mark.parametrize("limit", [1, 7, 30])
def test_limits(ray_session, small_corpus, limit):
    assert_conformance(small_corpus, SEED, CrawlOptions(limit=limit))


@pytest.mark.parametrize("wave_size", [1, 3, 11])
def test_wave_sizes(ray_session, small_corpus, wave_size):
    """Wave size is a parameter, not a constant: order parity must hold for
    any wave (the reference hardcodes 5; the engine must agree with the
    model at every setting)."""
    assert_conformance(
        small_corpus, SEED, CrawlOptions(limit=30, wave_size=wave_size)
    )


@pytest.mark.parametrize("strategy", ["same-domain", "same-origin", "all"])
def test_strategies(ray_session, small_corpus, strategy):
    assert_conformance(small_corpus, SEED, CrawlOptions(limit=25, strategy=strategy))


@pytest.mark.parametrize("max_depth", [1, 2, 10])
def test_depths(ray_session, small_corpus, max_depth):
    assert_conformance(small_corpus, SEED, CrawlOptions(limit=40, max_depth=max_depth))


def test_include_exclude(ray_session, small_corpus):
    opts = CrawlOptions(
        limit=25,
        include_paths=("http://h00.example.test/p/00*",),
        exclude_paths=("http://h00.example.test/p/000[5-9]*",),
    )
    assert_conformance(small_corpus, SEED, opts)


def test_regex_include(ray_session, small_corpus):
    opts = CrawlOptions(limit=20, include_paths=(r"/p\/00[0-3]\d(#|$)/",))
    assert_conformance(small_corpus, SEED, opts)


def test_other_seed_cross_host(ray_session, small_corpus):
    assert_conformance(
        small_corpus, "http://h02.example.test/p/0001", CrawlOptions(limit=30, strategy="all")
    )


def test_politeness_per_host_cap(ray_session, small_corpus):
    opts = CrawlOptions(limit=30, strategy="all", per_host_cap=2)
    assert_conformance(small_corpus, SEED, opts)


def test_robots_filter(ray_session, small_corpus):
    robots = {"h00.example.test": ["/p/000"], "h01.example.test": ["/p/"]}
    opts = CrawlOptions(limit=30, strategy="all", robots=robots)
    golden, out = assert_conformance(small_corpus, SEED, opts)
    # seed bypasses robots; later /p/000* links on h00 are never fetched
    fetched = [u for u, _, _ in out.order]
    assert fetched[0] == SEED
    assert all(
        not u.startswith("http://h00.example.test/p/000") for u in fetched[1:]
    )
    assert all(not u.startswith("http://h01.example.test/") for u in fetched)


def test_visited_mirror_overflow_falls_back_to_shards(ray_session, small_corpus):
    """When the driver-side contains() mirror overflows, membership probes
    fall back to the seen-set shard actors — conformance must hold either
    way (the 10^10-scale path)."""
    opts = CrawlOptions(limit=30, strategy="all")
    assert_conformance(
        small_corpus, SEED, opts, CrawlRunConfig(visited_mirror_cap=5)
    )


def test_dataset_executor_matches_pool(ray_session, small_corpus):
    opts = CrawlOptions(limit=30, strategy="all", wave_size=16)
    cfg = CrawlRunConfig(executor="dataset", n_fetch_workers=2, dataset_batch_size=4)
    assert_conformance(small_corpus, SEED, opts, cfg)


def test_span_sequence_equality(ray_session, small_corpus, tmp_path):
    """Per-row invariant vs reference: span-sequence equality
    (kind, text, media_ref, order) — BASELINE.json input_hint."""
    opts = CrawlOptions(limit=15)
    cfg = CrawlRunConfig(spans_out_dir=str(tmp_path / "spans"))
    idx = CorpusIndex(small_corpus)
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(idx))
    out = run_crawl(SEED, opts, small_corpus, cfg)
    assert out.order == golden.order

    t = pq.read_table(str(tmp_path / "spans"))
    by_url = {t.column("url")[i].as_py(): t.column("spans")[i].as_py() for i in range(t.num_rows)}
    ok_urls = [u for u, _, ok in golden.order if ok]
    assert set(by_url) >= set(ok_urls)
    for u, row_idx in zip(ok_urls, golden.fetched_rows):
        ref_spans = small_corpus.column("spans")[row_idx].as_py()
        got = by_url[u]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ref_spans]


def test_counters_lineage(ray_session, small_corpus):
    opts = CrawlOptions(limit=30)
    _, out = assert_conformance(small_corpus, SEED, opts)
    c = out.counters.to_pylist()
    assert len(c) == out.rounds
    assert sum(r["done"] for r in c) == out.completed + out.failed
    assert sum(r["succeeded"] for r in c) == out.completed
    assert sum(r["failed"] for r in c) == out.failed


def test_checkpoint_resume(ray_session, small_corpus, tmp_path):
    """Kill after round 2, resume from checkpoint, result identical to a
    straight-through run (north_rule resumability)."""
    opts = CrawlOptions(limit=30)
    full = run_crawl(SEED, opts, small_corpus, CrawlRunConfig())

    ck = str(tmp_path / "ck")
    partial = run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(checkpoint_dir=ck, stop_after_rounds=2),
    )
    assert partial.rounds == 2  # crashed mid-crawl
    resumed = run_crawl(
        SEED, opts, small_corpus, CrawlRunConfig(checkpoint_dir=ck), resume=True
    )
    # stream_order defaults ON with checkpoint_dir: compare the order TABLE
    # (segments + tail), and confirm the driver did not re-materialize
    assert resumed.order_table().to_pydict() == full.order_table().to_pydict()
    assert resumed.completed == full.completed
    assert resumed.failed == full.failed
    assert resumed.visited_count == full.visited_count


def test_checkpoint_resume_spans_no_duplicates(ray_session, small_corpus, tmp_path):
    """Resume after a mid-interval crash must not leave stale span parts:
    part names are per-actor-unique, so re-executed rounds would otherwise
    accumulate duplicate rows next to the crashed attempt's files."""
    opts = CrawlOptions(limit=30)
    spans_full = str(tmp_path / "spans_full")
    full = run_crawl(SEED, opts, small_corpus, CrawlRunConfig(spans_out_dir=spans_full))

    ck = str(tmp_path / "ck")
    spans = str(tmp_path / "spans")
    # checkpoint_every=1 with crash at round 3: rounds 1-3 checkpointed, BUT
    # simulate a crash AFTER round-4 spans were partially written by a run
    # whose checkpoint only covers round 3
    run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(checkpoint_dir=ck, checkpoint_every=10, stop_after_rounds=3,
                       spans_out_dir=spans),
    )
    # fake the crashed attempt's stale parts for a round past the checkpoint
    import json as _json
    import os as _os

    with open(_os.path.join(ck, "meta.json")) as f:
        ck_round = _json.load(f)["round"]
    stale_dir = _os.path.join(spans, f"round={ck_round + 1:05d}")
    _os.makedirs(stale_dir, exist_ok=True)
    with open(_os.path.join(stale_dir, "part-deadbeefdead-000001.parquet"), "wb") as f:
        f.write(b"stale")

    resumed = run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(checkpoint_dir=ck, spans_out_dir=spans), resume=True,
    )
    assert resumed.order_table().to_pydict() == full.order_table().to_pydict()
    t = pq.read_table(spans)
    t_full = pq.read_table(spans_full)
    assert t.num_rows == t_full.num_rows  # no duplicate / stale rows
    assert sorted(t.column("url").to_pylist()) == sorted(t_full.column("url").to_pylist())


def test_stream_order_resume_order_on_disk(ray_session, small_corpus, tmp_path):
    """stream_order mode: the driver never holds the full order; segments on
    disk + in-memory tail reconstruct the exact order table, across resume."""
    opts = CrawlOptions(limit=30)
    full = run_crawl(SEED, opts, small_corpus, CrawlRunConfig())
    full_t = full.order_table()

    ck = str(tmp_path / "ck_stream")
    partial = run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(checkpoint_dir=ck, checkpoint_every=1, stop_after_rounds=2,
                       stream_order=True),
    )
    # driver buffer flushed at every checkpoint: holds at most one round
    assert partial.order == []  # final checkpoint flushed the tail
    resumed = run_crawl(
        SEED, opts, small_corpus,
        CrawlRunConfig(checkpoint_dir=ck, checkpoint_every=1, stream_order=True),
        resume=True,
    )
    got = resumed.order_table()
    assert got.to_pydict() == full_t.to_pydict()
    # the resumed driver never materialized the pre-crash rows in memory
    assert resumed.order_base > 0


def test_relaxed_mode_same_page_set(ray_session, small_corpus):
    """ordering="relaxed" (pipelined, no wave barrier): the fetched page SET,
    visited set size, completed/failed counters and limit semantics match the
    reference exactly; only the ORDER diverges (documented)."""
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    idx = CorpusIndex(small_corpus)
    # exhaustive crawl (limit >= reachable component): the SET must be equal
    opts = CrawlOptions(limit=100000, strategy="all")
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(idx))
    out = run_crawl_relaxed(SEED, opts, small_corpus,
                            CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2))
    assert out.completed + out.failed == len(golden.order)
    assert {(u, ok) for u, _, ok in out.order} == {(u, ok) for u, _, ok in golden.order}
    assert out.completed == golden.completed and out.failed == golden.failed
    assert out.visited_count == len(golden.visited)

    # limited crawl: exact limit, no duplicate fetches, pages within the
    # reachable set (WHICH pages differs from wave order — documented)
    lim = CrawlOptions(limit=30, strategy="all")
    out2 = run_crawl_relaxed(SEED, lim, small_corpus,
                             CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2))
    urls2 = [u for u, _, _ in out2.order]
    assert out2.completed + out2.failed == 30
    assert len(urls2) == len(set(urls2))
    assert set(urls2) <= {u for u, _, _ in golden.order}

    # politeness="actors" is supported in relaxed mode since round 3
    # (real-clock token buckets) — coverage in test_politeness_mode.py


def test_relaxed_checkpoint_resume_same_page_set(ray_session, small_corpus, tmp_path):
    """Relaxed-mode crash/resume (VERDICT r2 Missing #6): crash after 2
    completed chunks with chunks still in flight; resume must fetch exactly
    the straight-through page SET — in-flight pages are re-queued via the
    checkpoint's pending_rows, spans carry no duplicates."""
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    opts = CrawlOptions(limit=60, strategy="all")
    spans_full = str(tmp_path / "spans_full")
    full = run_crawl_relaxed(
        SEED, opts, small_corpus,
        CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2,
                       spans_out_dir=spans_full),
    )

    ck = str(tmp_path / "ck_rel")
    spans = str(tmp_path / "spans_rel")
    base = CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2,
                          checkpoint_dir=ck, checkpoint_every=1,
                          spans_out_dir=spans, dataset_batch_size=8)
    import dataclasses as _dc

    partial = run_crawl_relaxed(
        SEED, opts, small_corpus, _dc.replace(base, stop_after_rounds=2)
    )
    assert partial.rounds == 2  # crashed with work in flight
    resumed = run_crawl_relaxed(SEED, opts, small_corpus, base, resume=True)

    assert resumed.completed == full.completed
    assert resumed.failed == full.failed
    assert resumed.visited_count == full.visited_count
    got = resumed.order_table()
    want = full.order_table()
    assert sorted(got.column("url").to_pylist()) == sorted(want.column("url").to_pylist())
    t = pq.read_table(spans)
    t_full = pq.read_table(spans_full)
    assert t.num_rows == t_full.num_rows  # no duplicate / lost span rows
    assert sorted(t.column("url").to_pylist()) == sorted(t_full.column("url").to_pylist())


def test_relaxed_enqueued_counters(ray_session, small_corpus):
    """Relaxed counters record real enqueue deltas (VERDICT r2 wrong #1):
    every fetched page except the seed was enqueued exactly once, and pushes
    the limit cut off may exceed fetches — so sum(enqueued)+1 >= done."""
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    out = run_crawl_relaxed(
        SEED, CrawlOptions(limit=40, strategy="all"),
        small_corpus, CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2),
    )
    c = out.counters.to_pylist()
    enq = sum(r["enqueued"] for r in c)
    assert enq > 0
    assert enq + 1 >= out.completed + out.failed
    assert sum(r["done"] for r in c) == out.completed + out.failed


def test_format_dag_json_summary_spans(ray_session, small_corpus, tmp_path):
    """LLM format DAG (DataExtractor.ts:437-586): formats=("json","summary")
    appends json then summary span kinds AFTER each OK page's base spans,
    values equal to the chunk->extract/summary->merge pipeline run
    independently on the page markdown; crawl order unchanged."""
    import json as _json

    from anycrawl_ray.functions.agents import LLMAgentStub

    opts = CrawlOptions(limit=12)
    spans_dir = str(tmp_path / "spans_fmt")
    idx = CorpusIndex(small_corpus)
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(idx))
    out = run_crawl(SEED, opts, small_corpus,
                    CrawlRunConfig(spans_out_dir=spans_dir,
                                   formats=("json", "summary")))
    assert out.order == golden.order

    t = pq.read_table(spans_dir)
    llm = LLMAgentStub(mode="deterministic")
    by_url = {
        t.column("url")[i].as_py(): (
            t.column("spans")[i].as_py(), t.column("markdown")[i].as_py()
        )
        for i in range(t.num_rows)
    }
    checked = 0
    for u, row_idx in zip([u for u, _, ok in golden.order if ok], golden.fetched_rows):
        spans, md = by_url[u]
        base = small_corpus.column("spans")[row_idx].as_py()
        # base spans preserved in order, then json, then summary
        assert [s["kind"] for s in spans] == [s["kind"] for s in base] + ["json", "summary"]
        assert spans[-2]["text"] == _json.dumps(
            llm.extract(md, ["title", "topic"]), sort_keys=True
        )
        assert spans[-1]["text"] == llm.summary(md)
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        checked += 1
    assert checked > 0


def test_relaxed_mode_spans_complete(ray_session, small_corpus, tmp_path):
    """Relaxed mode writes exactly one span row per OK page (no dups, none
    missing), same content as conformance mode for the same page."""
    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed

    opts = CrawlOptions(limit=100000, strategy="all")
    d = str(tmp_path / "spans_rel")
    out = run_crawl_relaxed(SEED, opts, small_corpus,
                            CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2,
                                           spans_out_dir=d))
    t = pq.read_table(d)
    # spans rows cover EVERY fetched page (ok + failed-with-empty-spans),
    # exactly once each
    assert sorted(t.column("url").to_pylist()) == sorted(u for u, _, _ in out.order)
    ok_t = t.filter(t.column("ok"))
    ok_urls = [u for u, _, ok in out.order if ok]
    assert sorted(ok_t.column("url").to_pylist()) == sorted(ok_urls)
    # spot-check one page's spans vs the corpus
    idx = CorpusIndex(small_corpus)
    golden = run_reference_crawl(SEED, opts, SyntheticFetcher(idx))
    by_url = {t.column("url")[i].as_py(): t.column("spans")[i].as_py()
              for i in range(t.num_rows)}
    u, row_idx = next(
        (u, r) for (u, _, ok), r in zip(golden.order, golden.fetched_rows) if ok
    )
    ref = small_corpus.column("spans")[row_idx].as_py()
    assert [(s["kind"], s["text"]) for s in by_url[u]] == [
        (s["kind"], s["text"]) for s in ref
    ]


def test_conformance_large_waves_multichunk(ray_session, small_corpus):
    """Byte-for-byte order parity at a scale where speculative dispatch
    actually splits waves into multiple worker chunks (wave 256 > MIN_CHUNK,
    4 workers, growing mirror) — the small-wave tests never exercise the
    multi-chunk mask slicing."""
    opts = CrawlOptions(limit=180, strategy="all", wave_size=256)
    assert_conformance(
        small_corpus, SEED, opts,
        CrawlRunConfig(n_fetch_workers=4, n_seen_shards=4, executor="pool"),
    )


def test_relaxed_mode_per_chunk_politeness(ray_session, small_corpus, tmp_path):
    """Relaxed mode honors per_host_cap per dispatched CHUNK (best-effort
    rate shaping): no span round dir — one per chunk — exceeds the cap for
    any host."""
    import collections
    import os

    from anycrawl_ray.pipelines.crawl import run_crawl_relaxed
    from anycrawl_ray.urlnorm import hostname_of

    d = str(tmp_path / "spans_pol")
    out = run_crawl_relaxed(
        SEED, CrawlOptions(limit=60, strategy="all", per_host_cap=2),
        small_corpus,
        CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2, spans_out_dir=d,
                       dataset_batch_size=16),
    )
    assert out.completed + out.failed == 60
    for rd_ in os.listdir(d):
        t = pq.read_table(os.path.join(d, rd_))
        counts = collections.Counter(hostname_of(u) for u in t.column("url").to_pylist())
        assert max(counts.values(), default=0) <= 2, (rd_, counts)

    # politeness="actors" (real-clock token buckets) is supported in relaxed
    # mode since round 3 — coverage in test_politeness_mode.py


def test_conformance_randomized_option_matrix(ray_session, small_corpus):
    """Seeded random sample of option COMBINATIONS (strategy x depth x limit
    x wave x filters x politeness together) — interactions the single-axis
    tests never exercise."""
    import random

    rng = random.Random(20260817)
    strategies = ["all", "same-domain", "same-origin"]
    seeds = [SEED, "http://h02.example.test/p/0001"]
    includes = [(), ("http://h0*.example.test/p/*",), (r"/p\/00\d\d/",)]
    excludes = [(), ("http://h00.example.test/p/000[5-9]*",)]
    for _ in range(10):
        opts = CrawlOptions(
            limit=rng.choice([5, 17, 40]),
            strategy=rng.choice(strategies),
            max_depth=rng.choice([1, 3, 50]),
            wave_size=rng.choice([2, 5, 13, 64]),
            per_host_cap=rng.choice([0, 0, 2]),
            include_paths=rng.choice(includes),
            exclude_paths=rng.choice(excludes),
        )
        cfg = CrawlRunConfig(
            n_fetch_workers=rng.choice([1, 2, 3]),
            n_seen_shards=rng.choice([1, 2, 4]),
            visited_mirror_cap=rng.choice([10_000_000, 7]),
        )
        assert_conformance(small_corpus, rng.choice(seeds), opts, cfg)
