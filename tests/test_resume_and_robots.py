"""Checkpoint/resume (replaces the reference's queue-healing U4/U7/U8) and
robots.txt filtering (north_rule addition)."""

import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.operators.claim import claim_batch, mark_running
from crawling_infrastructure_spark.operators.frontier import frontier_rows
from crawling_infrastructure_spark.operators.robots import RobotsCache, filter_allowed
from crawling_infrastructure_spark.plans.epoch import CrawlJob
from crawling_infrastructure_spark.schema import Status
from crawling_infrastructure_spark.sources.seeds import seeds_from_list
from crawling_infrastructure_spark.synth import fetch_outcome, seed_urls
from tests.conftest import N_HOSTS


def test_kill_and_resume_heals_and_continues(spark, corpus, tmp_path):
    cfg = TaskConfig(task_id="resume", max_items_per_second=2, epoch_seconds=10)
    job = CrawlJob(spark, str(tmp_path), corpus, cfg, outcome_fn=fetch_outcome)
    job.init_task(seeds_from_list(spark, seed_urls(N_HOSTS)))
    job.run_epoch(1)
    # simulate a kill mid-epoch-2: claim committed, fetch never finished
    f = job.frontier_t.read(spark)
    claimed = claim_batch(f, cfg)
    job.frontier_t.write_full(mark_running(f, claimed), tag="epoch-2-claim")
    assert job.frontier_t.read(spark).filter(F.col("status") == Status.RUNNING).count() > 0

    # fresh process: resume heals running -> initial, continues at epoch 3
    job2 = CrawlJob(spark, str(tmp_path), corpus, cfg, outcome_fn=fetch_outcome)
    hist = job2.run(max_epochs=1)
    assert hist[0].epoch == 3
    assert job2.frontier_t.read(spark).filter(F.col("status") == Status.RUNNING).count() == 0
    assert hist[0].claimed == cfg.epoch_budget


def test_snapshot_rollback(spark, corpus, tmp_path):
    cfg = TaskConfig(task_id="rb", max_items_per_second=2, epoch_seconds=10)
    job = CrawlJob(spark, str(tmp_path), corpus, cfg, outcome_fn=fetch_outcome)
    job.init_task(seeds_from_list(spark, seed_urls(N_HOSTS)))
    v0 = job.frontier_t.current_version()
    job.run_epoch(1)
    assert job.frontier_t.current_version() > v0
    job.frontier_t.rollback(v0)
    f = job.frontier_t.read(spark)
    assert f.filter(F.col("status") != Status.INITIAL).count() == 0


def test_expire_snapshots_keeps_current(spark, corpus, tmp_path):
    cfg = TaskConfig(task_id="gc", max_items_per_second=1, epoch_seconds=10)
    job = CrawlJob(spark, str(tmp_path), corpus, cfg, outcome_fn=fetch_outcome)
    job.init_task(seeds_from_list(spark, seed_urls(N_HOSTS)))
    for e in range(1, 4):
        job.run_epoch(e)
    job.frontier_t.expire_snapshots(keep_last=2)
    assert len(job.frontier_t.snapshots()) <= 3
    assert job.frontier_t.read(spark).count() > 0  # current still readable


def test_robots_longest_match():
    cache = RobotsCache(
        {
            "h.example": [
                ("disallow", "/private"),
                ("allow", "/private/ok"),
                ("disallow", "/tmp"),
            ],
            "deny.example": [("disallow", "/")],
        }
    )
    assert cache.allowed("h.example", "/public")
    assert not cache.allowed("h.example", "/private/x")
    assert cache.allowed("h.example", "/private/ok/deep")  # longest match wins
    assert not cache.allowed("deny.example", "/anything")
    assert cache.allowed("unknown.example", "/x")  # default allow


def test_robots_filter_on_frontier(spark):
    items = [
        ("https://deny.example/a",),
        ("https://h.example/private/x",),
        ("https://h.example/public",),
    ]
    rows = frontier_rows(spark.createDataFrame(items, "item string"), 1, 0)
    cache = RobotsCache(
        {"deny.example": [("disallow", "/")], "h.example": [("disallow", "/private")]}
    )
    kept = filter_allowed(rows, spark, cache).select("url").collect()
    assert {r["url"] for r in kept} == {"https://h.example/public"}
