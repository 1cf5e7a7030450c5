"""Queue state-machine invariants — SURVEY.md §5 oracles 1-3:
claim/complete/fail/retry/heal transitions and the termination predicate,
ported from queue.model.ts / crawl_queue.ts / handler.ts semantics.
Uses the FIXTURES.md §3 frontier_init cases."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.operators.claim import claim_batch, mark_running
from crawling_infrastructure_spark.operators.frontier import (
    frontier_rows,
    merge_results,
    queue_statistics,
    recent_completed,
    reenqueue_all_failed,
    reenqueue_failed,
    reset_running,
    task_finished,
)
from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.schema import FRONTIER_SCHEMA, Status


def _frontier(spark, rows):
    """rows: (url, status, retries) -> full frontier rows."""
    data = [
        (
            u,
            hash(u),
            "h.example",
            1,
            s,
            r,
            1,
            hash(u),
            None,
            "",
            "",
            0,
        )
        for (u, s, r) in rows
    ]
    return spark.createDataFrame(data, FRONTIER_SCHEMA)


FIXTURE = [
    ("https://h.example/fresh", Status.INITIAL, 0),
    ("https://h.example/inflight", Status.RUNNING, 1),
    ("https://h.example/done", Status.COMPLETED, 1),
    ("https://h.example/retryable", Status.FAILED, 1),
    ("https://h.example/exhausted", Status.FAILED, 3),
    ("https://h.example/blocked-history", Status.INITIAL, 2),
]


def test_queue_statistics(spark):
    f = _frontier(spark, FIXTURE)
    stats = {r["status"]: r["cnt"] for r in queue_statistics(f).collect()}
    assert stats == {Status.INITIAL: 2, Status.RUNNING: 1, Status.COMPLETED: 1, Status.FAILED: 2}


def test_reenqueue_failed_respects_retry_cap(spark):
    f = reenqueue_failed(_frontier(spark, FIXTURE), max_retries=3)
    out = {r["url"]: r["status"] for r in f.collect()}
    assert out["https://h.example/retryable"] == Status.INITIAL  # 1 < 3
    assert out["https://h.example/exhausted"] == Status.FAILED  # 3 >= 3 terminal


def test_reenqueue_all_failed_resets(spark):
    f = reenqueue_all_failed(_frontier(spark, FIXTURE))
    rows = {r["url"]: r for r in f.collect()}
    assert rows["https://h.example/exhausted"]["status"] == Status.INITIAL
    assert rows["https://h.example/exhausted"]["retries"] == 0
    assert rows["https://h.example/done"]["status"] == Status.COMPLETED  # untouched


def test_reset_running_heals(spark):
    f = reset_running(_frontier(spark, FIXTURE))
    out = {r["url"]: r["status"] for r in f.collect()}
    assert out["https://h.example/inflight"] == Status.INITIAL
    assert out["https://h.example/done"] == Status.COMPLETED


def test_task_finished_predicate(spark):
    # A2: completed + (failed & retries>=max) >= num_items
    not_done = _frontier(spark, FIXTURE)
    assert not task_finished(not_done, max_retries=3)
    done = _frontier(
        spark,
        [
            ("https://h.example/a", Status.COMPLETED, 1),
            ("https://h.example/b", Status.FAILED, 3),
        ],
    )
    assert task_finished(done, max_retries=3)
    # failed below cap does NOT count toward termination
    assert not task_finished(
        _frontier(spark, [("https://h.example/c", Status.FAILED, 1)]), max_retries=3
    )


def test_merge_results_updates_only_matched(spark):
    f = _frontier(spark, FIXTURE)
    ts = datetime(2026, 1, 2, tzinfo=timezone.utc)
    results = spark.createDataFrame(
        [("https://h.example/fresh", hash("https://h.example/fresh"), Status.COMPLETED, 1, "", ts)],
        "url string, url_hash long, status int, retries_delta int, error string, warc_ts timestamp",
    )
    merged = {r["url"]: r for r in merge_results(f, results).collect()}
    assert merged["https://h.example/fresh"]["status"] == Status.COMPLETED
    assert merged["https://h.example/fresh"]["retries"] == 1
    assert merged["https://h.example/fresh"]["crawled"] is not None
    # blocked delta=0 semantics: untouched rows keep retries
    assert merged["https://h.example/blocked-history"]["retries"] == 2
    assert merged["https://h.example/done"]["status"] == Status.COMPLETED


def test_recent_completed_topk(spark):
    rows = [(f"https://h.example/{i}", Status.COMPLETED, 1) for i in range(10)]
    f = _frontier(spark, rows).withColumn(
        "crawled",
        F.to_timestamp(F.concat(F.lit("2026-01-0"), (F.pmod(F.col("seq"), F.lit(9)) + 1).cast("string"))),
    )
    top = recent_completed(f, 3).collect()
    assert len(top) == 3
    crawls = [r["crawled"] for r in top]
    assert crawls == sorted(crawls, reverse=True)


def test_claim_budget_and_per_host_cap(spark):
    # 3 hosts x 10 urls; budget 12, per-host cap 3 -> claim 9 (3 per host)
    items = [
        (f"https://host{h}.example/p/{i}",) for h in range(3) for i in range(10)
    ]
    f = frontier_rows(spark.createDataFrame(items, "item string"), priority=1, epoch=0)
    cfg = TaskConfig(
        task_id="t", max_items_per_second=1.2, epoch_seconds=10, max_items_per_host_per_epoch=3
    )
    assert cfg.epoch_budget == 12
    claimed = claim_batch(f, cfg).collect()
    assert len(claimed) == 9
    per_host = {}
    for r in claimed:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert all(v == 3 for v in per_host.values())


def test_claim_round_robins_hosts(spark):
    # budget 4 with cap 10: ranks round-robin — one per host before seconds
    items = [(f"https://host{h}.example/p/{i}",) for h in range(4) for i in range(5)]
    f = frontier_rows(spark.createDataFrame(items, "item string"), priority=1, epoch=0)
    cfg = TaskConfig(task_id="t", max_items_per_second=0.4, epoch_seconds=10)
    claimed = claim_batch(f, cfg).collect()
    assert len(claimed) == 4
    assert len({r["host"] for r in claimed}) == 4  # one from each host


def test_mark_running(spark):
    f = _frontier(spark, FIXTURE)
    cfg = TaskConfig(task_id="t", max_items_per_second=0.1, epoch_seconds=10)
    claimed = claim_batch(f, cfg)
    after = mark_running(f, claimed)
    assert after.filter(F.col("status") == Status.RUNNING).count() == 1 + 1  # existing + new claim
    assert set(after.columns) == {c.name for c in FRONTIER_SCHEMA.fields}
