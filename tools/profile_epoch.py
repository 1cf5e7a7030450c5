"""Per-step wall profile of one claim-all epoch at a given core count —
identifies which steps scale with cores and which are serial (driver
scheduling, manifest commits, disk-bound writes).

Usage: SPARK_GRAFT_CPUS=8 python tools/profile_epoch.py [n_pages]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    corpus_path = os.environ.get("SPARK_GRAFT_CORPUS", f"/tmp/bench_corpus_{n_pages}_60")

    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.operators.claim import claim_batch
    from crawling_infrastructure_spark.operators.fetch import HermeticFetcher, fetch_batch
    from crawling_infrastructure_spark.operators.frontier import (
        FRONTIER_COLS,
        frontier_rows,
        merge_results,
        reenqueue_failed,
    )
    from crawling_infrastructure_spark.operators.metrics import epoch_metrics
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.schema import FRONTIER_SCHEMA, Status
    from crawling_infrastructure_spark.session import get_spark
    from crawling_infrastructure_spark.synth import fetch_outcome, gen_pages

    spark = get_spark(app_name="profile", cpus=cpus)
    if os.path.exists(f"{corpus_path}/_SUCCESS"):
        corpus = spark.read.parquet(corpus_path)
    else:
        corpus = gen_pages(spark, n_pages, max(n_pages // 500, 10), weight=60).cache()
        corpus.count()

    root = tempfile.mkdtemp(prefix="prof_")
    cfg = TaskConfig(
        task_id="prof", max_items_per_second=200.0, epoch_seconds=n_pages / 200.0,
        max_items_per_host_per_epoch=n_pages, retry_failed_items=1,
        bloom_prefilter=False,
    )
    job = CrawlJob(spark, root, corpus, cfg, outcome_fn=fetch_outcome, claim_snapshot=False)
    seeds = corpus.select("url").withColumnRenamed("url", "item")

    t: dict[str, float] = {}

    def tick(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    tick("init_task", lambda: job.init_task(seeds))
    frontier = job.frontier_t.read(spark)
    claimed, n_claimed = tick(
        "claim_plan+hist", lambda: claim_batch(frontier, cfg, with_count=True)
    )
    claimed = claimed.cache()
    dirty = tick("dirty_claim_buckets", lambda: job.frontier_t.bucket_ids_of(claimed))
    from pyspark.storagelevel import StorageLevel

    fetcher = HermeticFetcher(epoch=1, outcome_fn=fetch_outcome)
    results = fetch_batch(claimed, corpus, fetcher).persist(StorageLevel.DISK_ONLY)
    light = results.select(
        "url", "url_hash", "host", "status", "retries_delta", "error",
        "warc_ts", "outlinks", "bytes_fetched", "elapsed_ms",
    ).cache()
    metrics = epoch_metrics(light, 1).cache()
    tick("fetch+metrics_agg", lambda: metrics.agg(F.sum("completed")).collect())
    tick("metrics_append", lambda: job.metrics_t.append(metrics, tag="e1"))
    completed = results.filter(F.col("status") == Status.COMPLETED).select(
        "url", "warc_ts", "text", "lang"
    )
    corpus_hit = corpus.select("url", "html").join(
        completed.select("url"), "url", "left_semi"
    )
    pages_rows = completed.join(corpus_hit, "url", "left").select(
        "url", "warc_ts", "html", "text", "lang"
    )
    tick("pages_append", lambda: job.pages_t.append(pages_rows, tag="e1"))
    outlinks = light.select(F.explode("outlinks").alias("item"))
    candidates = frontier_rows(outlinks, 1, epoch=1)
    new_rows = candidates.join(frontier.select("url_hash"), "url_hash", "left_anti").cache()
    tick("grow_dedup_count", lambda: new_rows.count())
    dirty_all = tick(
        "dirty_all_buckets",
        lambda: sorted(set(dirty) | set(job.frontier_t.bucket_ids_of(new_rows))),
    )
    fdirty = job.frontier_t.read_buckets(spark, dirty_all, FRONTIER_SCHEMA)
    merged = reenqueue_failed(merge_results(fdirty, light), 1)
    tick(
        "frontier_merge_write",
        lambda: job.frontier_t.merge_buckets(
            merged.unionByName(new_rows.select(*FRONTIER_COLS)), dirty_all, tag="e1"
        ),
    )
    total = round(sum(t.values()), 2)
    print({"cpus": cpus, "n_pages": n_pages, "claimed": n_claimed, "total": total, **t})
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
