#!/usr/bin/env python
"""Crawl job entrypoint for ``ray job submit`` (BASELINE.md launch mode).

On a cluster:
    ray job submit --working-dir /root/repo -- \
        python jobs/crawl_job.py --seed http://h00.example.test/p/0000 \
        --limit 5000 --strategy all --out /tmp/crawl_out

Standalone (this sandbox: single node, RAY_ADDRESS=local preset):
    python jobs/crawl_job.py --limit 200 --out /tmp/crawl_out

The job: deterministic corpus -> run_crawl (frontier + seen-set shards +
fetch/parse actor pool) -> partitioned span parquet + checkpoints + a summary
JSON line on stdout. Owns its Ray session (guarded init / shutdown).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", default="http://h00.example.test/p/0000")
    p.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--limit", type=int, default=1000)
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--strategy", default="all",
                   choices=["all", "same-domain", "same-hostname", "same-origin"])
    p.add_argument("--wave-size", type=int, default=1024)
    p.add_argument("--per-host-cap", type=int, default=0)
    p.add_argument("--politeness", default="driver", choices=["driver", "actors"])
    p.add_argument("--mode", default="conformance", choices=["conformance", "relaxed"],
                   help="relaxed = pipelined, no wave barrier (order diverges)")
    p.add_argument("--corpus-pages", type=int, default=5000)
    p.add_argument("--workers", type=int, default=0, help="0 = num_cpus-2")
    p.add_argument("--seen-shards", type=int, default=4)
    p.add_argument("--out", default="/tmp/anycrawl_job_out")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--disk-seen", action="store_true",
                   help="bound seen-shard heap: memtable + sorted mmap'd "
                        "segments under --out/seen (state/diskstore.py)")
    p.add_argument("--seen-memtable-cap", type=int, default=1 << 20)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        import pyarrow.parquet as pq

        from anycrawl_ray.corpus import CorpusConfig, corpus_path
        from anycrawl_ray.pipelines.crawl import (
            CrawlRunConfig,
            run_crawl,
            run_crawl_relaxed,
        )
        from anycrawl_ray.refmodel import CrawlOptions

        cfg = CorpusConfig(n_hosts=16, n_pages=args.corpus_pages)
        corpus = pq.read_table(corpus_path(args.sf_dir, cfg))
        n_workers = args.workers or max(2, args.num_cpus - 2)
        runner = run_crawl_relaxed if args.mode == "relaxed" else run_crawl
        run_kwargs = {} if args.mode == "relaxed" else {"resume": args.resume}
        out = runner(
            args.seed,
            CrawlOptions(
                limit=args.limit,
                max_depth=args.max_depth,
                strategy=args.strategy,
                wave_size=args.wave_size,
                per_host_cap=args.per_host_cap,
            ),
            corpus,
            CrawlRunConfig(
                job_id="job",
                n_fetch_workers=n_workers,
                n_seen_shards=args.seen_shards,
                executor="pool",
                spans_out_dir=os.path.join(args.out, "spans"),
                checkpoint_dir=os.path.join(args.out, "checkpoint"),
                politeness=args.politeness,
                seen_store_dir=(os.path.join(args.out, "seen")
                                if args.disk_seen else None),
                seen_memtable_cap=args.seen_memtable_cap,
            ),
            **run_kwargs,
        )
        # S11: emit the job's webhook transition events to a local sink table
        # (deterministic delivery model — no network in this sandbox)
        from anycrawl_ray import storage
        from anycrawl_ray.functions import webhook as wh

        sub = wh.WebhookSubscription(
            "job-subscriber", "http://sink.example.test/hook",
            ("crawl.created", "crawl.started", "crawl.completed", "crawl.failed"),
        )
        events = wh.job_events("crawl", "job", ok=out.failed == 0 or out.completed > 0)
        deliveries = wh.deliver_events(events, [sub], lambda s, e, i, a: True)
        storage.write_table(
            deliveries, storage.table_uri(args.out, "webhook_events")
        )

        print(
            json.dumps(
                {
                    "completed": out.completed,
                    "failed": out.failed,
                    "rounds": out.rounds,
                    "visited": out.visited_count,
                    "frontier_ops": out.frontier_ops,
                    "bytes": out.total_bytes,
                    "spans_dir": os.path.join(args.out, "spans"),
                    "webhook_events": len(events),
                    "top_host_count_max": max((s[2] for s in out.host_stats), default=0),
                }
            )
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
