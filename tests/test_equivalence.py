"""The north_rule equivalence gate: the Spark engine and the pure-Python
reference oracle must produce the SAME crawl order, final statuses/retries,
URL-seen set, and byte-identical extracted text under the same seed list and
politeness budget."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.operators.claim import claim_batch
from crawling_infrastructure_spark.plans.epoch import CrawlJob
from crawling_infrastructure_spark.sources.seeds import seeds_from_list
from crawling_infrastructure_spark.synth import fetch_outcome, seed_urls
from tests.conftest import N_HOSTS
from tests.reference_oracle import OracleCrawl

MAX_EPOCHS = 4


@pytest.fixture(scope="module")
def cfg():
    return TaskConfig(
        task_id="equiv",
        max_items_per_second=3.0,
        epoch_seconds=10,
        max_items_per_host_per_epoch=8,
        retry_failed_items=3,
    )


@pytest.fixture(scope="module")
def spark_run(spark, corpus, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("equiv_cat"))
    shutil.rmtree(root, ignore_errors=True)
    job = CrawlJob(spark, root, corpus, cfg, outcome_fn=fetch_outcome)
    job.init_task(seeds_from_list(spark, seed_urls(N_HOSTS)))
    claim_log = []
    history = []
    for epoch in range(1, MAX_EPOCHS + 1):
        frontier = job.frontier_t.read(spark)
        claimed = claim_batch(frontier, cfg).collect()
        claimed.sort(key=lambda r: (r["host_rank"], -r["priority"], r["epoch_added"], r["seq"]))
        claim_log.extend((epoch, r["url"]) for r in claimed)
        s = job.run_epoch(epoch)
        history.append(s)
        if s.finished:
            break
    return job, claim_log, history


@pytest.fixture(scope="module")
def oracle_run(corpus_dict, cfg):
    o = OracleCrawl(corpus=corpus_dict, cfg=cfg, outcome_fn=fetch_outcome)
    hist = o.run(seed_urls(N_HOSTS), max_epochs=MAX_EPOCHS)
    return o, hist


def test_claim_order_matches(spark_run, oracle_run):
    _, claim_log, _ = spark_run
    oracle, _ = oracle_run
    assert claim_log == oracle.claim_log


def test_epoch_stats_match(spark_run, oracle_run):
    _, _, history = spark_run
    _, ohist = oracle_run
    assert len(history) == len(ohist)
    for s, o in zip(history, ohist):
        assert s.claimed == o["claimed"]
        if s.claimed:
            assert (s.completed, s.failed, s.blocked, s.new_urls) == (
                o["completed"], o["failed"], o["blocked"], o["new_urls"]
            )


def test_seen_set_matches(spark, spark_run, oracle_run):
    job, _, _ = spark_run
    oracle, _ = oracle_run
    spark_seen = {r["url"] for r in job.frontier_t.read(spark).select("url").collect()}
    assert spark_seen == oracle.seen_set


def test_final_status_and_retries_match(spark, spark_run, oracle_run):
    job, _, _ = spark_run
    oracle, _ = oracle_run
    rows = job.frontier_t.read(spark).select("url", "status", "retries").collect()
    got = {r["url"]: (r["status"], r["retries"]) for r in rows}
    want = {u: (r.status, r.retries) for u, r in oracle.frontier.items()}
    assert got == want


def test_extracted_text_byte_identical(spark, spark_run, oracle_run):
    job, _, _ = spark_run
    oracle, _ = oracle_run
    pages = {
        r["url"]: r["text"]
        for r in job.pages_t.read(spark).select("url", "text").collect()
    }
    # pages table may contain multiple snapshots of the same url if a url is
    # re-crawled; dedup not expected at this scale — compare as dicts
    assert pages == oracle.pages


def test_metrics_lineage_consistent(spark, spark_run):
    job, _, history = spark_run
    m = job.metrics_t.read(spark)
    per_epoch = {
        r["epoch"]: (r["c"], r["comp"])
        for r in m.groupBy("epoch")
        .agg(F.sum("claimed").alias("c"), F.sum("completed").alias("comp"))
        .collect()
    }
    for s in history:
        if s.claimed:
            assert per_epoch[s.epoch] == (s.claimed, s.completed)
