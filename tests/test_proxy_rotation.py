"""W2 proxy rotation feedback across epochs — the reference's per-request
rotation loop (crawler/src/handler.ts:171-176: blocked response -> fresh
proxy; crawler/src/proxy.ts:53-122: updateProxy marks + getFreshProxy
re-pick), re-expressed as a per-epoch batch fold (operators/proxy.
proxy_feedback) persisted to a catalog table. Analogue of the reference's
crawler/test/proxy_tests.ts + more_proxy_tests.ts block-rotation cases."""

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.operators.proxy import assign_proxies, proxy_feedback
from crawling_infrastructure_spark.plans.epoch import CrawlJob
from crawling_infrastructure_spark.schema import Status
from crawling_infrastructure_spark.sources.seeds import seeds_from_list
from crawling_infrastructure_spark.synth import fetch_outcome, gen_pages, seed_urls


def _pool(spark, n=8):
    rows = [
        Row(
            proxy=f"10.9.0.{i}:8080",
            proxy_fail_counter=0,
            last_used=i,
            obtain_counter=0,
            status="functional",
            block_counter=0,
            last_blocked=0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_epoch_feedback_persists_and_rotates(spark, tmp_path):
    corpus = gen_pages(spark, 400, 8).cache()
    corpus.count()
    root = str(tmp_path / "cat_rot")
    cfg = TaskConfig(task_id="rot", max_items_per_second=50, epoch_seconds=2.0)
    job = CrawlJob(
        spark, root, corpus, cfg, outcome_fn=fetch_outcome, proxies=_pool(spark)
    )
    job.init_task(seeds_from_list(spark, seed_urls(100)))
    s1 = job.run_epoch(1)
    assert job.proxy_t.exists()
    pool1 = job.proxy_t.read(spark)
    r1 = {r.proxy: r for r in pool1.collect()}
    # aggregated marks == per-row outcomes: sum of block increments is the
    # epoch's blocked count, fail increments its failed count
    assert sum(r.block_counter for r in r1.values()) == s1.blocked
    assert sum(r.proxy_fail_counter for r in r1.values()) == s1.failed
    assert s1.blocked > 0 and s1.failed > 0  # fetch_outcome injects both
    # marked proxies sink: their last_used is max(initial)+1 = 8
    marked = [p for p, r in r1.items() if r.block_counter or r.proxy_fail_counter]
    assert marked and all(r1[p].last_used == 8 for p in marked)
    # epoch 2 folds into the epoch-1 state (monotone counters), and its
    # timestamp advances past epoch 1's marks
    s2 = job.run_epoch(2)
    r2 = {r.proxy: r for r in job.proxy_t.read(spark).collect()}
    assert sum(r.block_counter for r in r2.values()) == s1.blocked + s2.blocked
    assert sum(r.proxy_fail_counter for r in r2.values()) == s1.failed + s2.failed
    assert max(r.last_used for r in r2.values()) == 9

    # rotation: a URL assigned to a marked proxy in epoch 1 maps to a
    # DIFFERENT proxy under the updated ranking (the reference's fresh-proxy
    # re-pick). Verified with the engine's own assignment expression.
    batch = spark.range(64).select(F.col("id").alias("url_hash"))
    a1 = {r.url_hash: r.proxy for r in assign_proxies(batch, _pool(spark)).collect()}
    a2 = {r.url_hash: r.proxy for r in assign_proxies(batch, pool1).collect()}
    hit_marked = [k for k, p in a1.items() if p in marked]
    assert hit_marked, "no row mapped to a marked proxy — widen the batch"
    assert any(a2[k] != a1[k] for k in hit_marked)

    # kill-resume: a fresh CrawlJob over the same root bootstraps from the
    # PERSISTED pool (not the caller's pristine one) — counters stay
    # monotone across the restart
    job2 = CrawlJob(
        spark, root, corpus, cfg, outcome_fn=fetch_outcome, proxies=_pool(spark)
    )
    job2.resume()
    s3 = job2.run_epoch(3)
    r3 = {r.proxy: r for r in job2.proxy_t.read(spark).collect()}
    assert sum(r.block_counter for r in r3.values()) == (
        s1.blocked + s2.blocked + s3.blocked
    )
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)


def test_proxy_feedback_no_failures_is_identity(spark):
    pool = _pool(spark)
    ok = spark.range(50).select(
        F.col("id").alias("url_hash"),
        F.lit(int(Status.COMPLETED)).alias("status"),
        F.lit(1).alias("retries_delta"),
    )
    out = proxy_feedback(ok, pool, now_ts=777)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, pool.collect()))


def test_proxy_feedback_ignores_nonfunctional_pool_rows(spark):
    # a damaged proxy is never assigned (assign_proxies default filter), so
    # feedback must never attribute outcomes to it
    pool = _pool(spark)
    damaged = pool.withColumn(
        "status",
        F.when(F.col("proxy") == "10.9.0.3:8080", "damaged").otherwise(
            F.col("status")
        ),
    )
    bad = spark.range(200).select(
        F.col("id").alias("url_hash"),
        F.lit(int(Status.FAILED)).alias("status"),
        F.lit(0).alias("retries_delta"),
    )
    out = {r.proxy: r for r in proxy_feedback(bad, damaged, now_ts=777).collect()}
    assert out["10.9.0.3:8080"].block_counter == 0
    assert out["10.9.0.3:8080"].last_used == 3  # untouched
    assert sum(r.block_counter for r in out.values()) == 200
