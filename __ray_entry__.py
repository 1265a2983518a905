"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count
+ schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

No ray.init()/ray.shutdown() here or in anything these call — the driver owns
the session (anycrawl_ray library code never initialises Ray).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: deterministic corpus ->
    Ray crawl (frontier + seen-set actors + fetch/parse map_batches) ->
    interleaved span docs as a ray.data.Dataset."""
    import ray.data as rd

    from anycrawl_ray.corpus import CorpusConfig, generate_corpus
    from anycrawl_ray.pipelines.crawl import CrawlRunConfig, run_crawl
    from anycrawl_ray.refmodel import CrawlOptions

    import tempfile

    # per-run temp dir: parallel driver runs must not collide
    out_dir = tempfile.mkdtemp(prefix="anycrawl_entry_spans_")
    corpus = generate_corpus("/root/testdata/sf0.001", CorpusConfig(n_pages=200))
    run_crawl(
        "http://h00.example.test/p/0000",
        CrawlOptions(limit=50, strategy="all"),
        corpus,
        CrawlRunConfig(n_fetch_workers=2, n_seen_shards=2, spans_out_dir=out_dir),
    )
    return rd.read_parquet(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 +
    training-data operators. See anycrawl_ray/queries.py."""
    from anycrawl_ray.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for the SQL-expressible subset; non-SQL ops
    (crawl BFS, minhash/simhash/winnowing, media stubs, SERP fixtures) are
    intentionally absent → rows-only driver check, semantics pytest-verified
    against reference/brute-force models."""
    from anycrawl_ray.queries import build_oracle_sql

    return build_oracle_sql()
