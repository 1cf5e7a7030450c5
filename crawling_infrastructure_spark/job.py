"""spark-submit entrypoint — the north_rule's deployment surface:

    zip -r ci_spark.zip crawling_infrastructure_spark
    spark-submit --py-files ci_spark.zip \\
        --master spark://...:7077 \\
        -- crawling_infrastructure_spark/job.py \\
        --seeds s3://bucket/seeds.txt --corpus s3://bucket/pages \\
        --catalog-root /mnt/shared/catalog --task-id crawl1 \\
        --max-items-per-second 200 --max-epochs 100

On a cluster the session comes from spark-submit's conf (master/executors
set outside — get_spark leaves an existing gateway's master untouched); in
local testing the factory defaults apply. Seeds/corpus may live on any
Hadoop-visible filesystem; the CATALOG ROOT must be a driver-visible POSIX
path (local disk, NFS, fuse mount): the manifest commit uses atomic
os.replace, which object stores don't provide — swap catalog.py for real
Iceberg to put the catalog itself on s3. All TaskConfig fields are exposed
as flags with the reference's names and defaults.

Exit code 0 = task finished (frontier drained) or max_epochs reached;
the job is re-runnable: with an existing catalog it resumes from the last
committed snapshot (heal + continue), matching the kill-exact resume
contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run a crawl task")
    p.add_argument("--seeds", help="seed list path (text/gz); omit to resume")
    p.add_argument("--corpus", required=True, help="pages parquet the fetcher resolves against")
    p.add_argument("--catalog-root", required=True)
    p.add_argument("--task-id", default="task0")
    p.add_argument("--max-items-per-second", type=float, default=1.0)
    p.add_argument("--epoch-seconds", type=float, default=10.0)
    p.add_argument("--max-items-per-host-per-epoch", type=int, default=30)
    p.add_argument("--retry-failed-items", type=int, default=3)
    p.add_argument("--priority", type=int, default=1)
    p.add_argument("--longliving", action="store_true")
    p.add_argument("--no-robots", action="store_true")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--no-bloom-prefilter", action="store_true")
    p.add_argument("--adaptive-budget", action="store_true")
    p.add_argument(
        "--frontier-buckets", type=int, default=None,
        help="default: auto-sized from the seed count (catalog.suggest_buckets)",
    )
    p.add_argument("--seen-buckets", type=int, default=32)
    p.add_argument("--robots-rules", help="parquet/csv of (host, directive, path_prefix)")
    p.add_argument("--region-map", help="parquet of (host, region)")
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--cpus", type=int, default=None, help="local-mode cores (tests only)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.operators.robots import RobotsCache
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.session import get_spark
    from crawling_infrastructure_spark.sources.seeds import read_seed_file

    spark = get_spark(app_name=f"crawl-{args.task_id}", cpus=args.cpus)
    cfg = TaskConfig(
        task_id=args.task_id,
        max_items_per_second=args.max_items_per_second,
        epoch_seconds=args.epoch_seconds,
        max_items_per_host_per_epoch=args.max_items_per_host_per_epoch,
        retry_failed_items=args.retry_failed_items,
        priority=args.priority,
        longliving=args.longliving,
        respect_robots=not args.no_robots,
        dedup=not args.no_dedup,
        bloom_prefilter=not args.no_bloom_prefilter,
        adaptive_budget=args.adaptive_budget,
        frontier_buckets=args.frontier_buckets,
        seen_buckets=args.seen_buckets,
    )
    robots = None
    if args.robots_rules:
        robots = RobotsCache.from_df(spark.read.parquet(args.robots_rules))
    region_map = spark.read.parquet(args.region_map) if args.region_map else None

    corpus = spark.read.parquet(args.corpus)
    job = CrawlJob(
        spark, args.catalog_root, corpus, cfg, robots=robots, region_map=region_map
    )
    seeds = read_seed_file(spark, args.seeds) if args.seeds else None
    history = job.run(seeds=seeds, max_epochs=args.max_epochs)
    for s in history:
        print(json.dumps({
            "epoch": s.epoch, "claimed": s.claimed, "completed": s.completed,
            "failed": s.failed, "blocked": s.blocked, "new_urls": s.new_urls,
            "bytes": s.bytes_fetched, "finished": s.finished,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
