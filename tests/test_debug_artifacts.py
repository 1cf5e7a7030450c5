"""store_browser_debug (config.ts:233-234) — failed-item debug artifacts:
the reference attaches worker.getDebugInfo() {screen_b64, document} to every
failed item's result (handler.ts:178-180) and collects the failed ids into
worker meta's items_browser_debug (crawl_queue.ts:173-180). Integration
analogue of crawler/test/integration_tests.ts:477-509 ('defect worker will
save debug info when config is set')."""

import base64
import shutil

from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.operators.metrics import items_browser_debug
from crawling_infrastructure_spark.plans.epoch import CrawlJob
from crawling_infrastructure_spark.schema import Status
from crawling_infrastructure_spark.sources.seeds import seeds_from_list
from crawling_infrastructure_spark.synth import fetch_outcome, gen_pages, seed_urls


def test_debug_artifacts_stored_for_failed_items(spark, tmp_path):
    corpus = gen_pages(spark, 300, 6).cache()
    corpus.count()
    root = str(tmp_path / "cat_dbg")
    cfg = TaskConfig(
        task_id="dbg", max_items_per_second=40, epoch_seconds=2.0,
        store_browser_debug=True,
    )
    job = CrawlJob(spark, root, corpus, cfg, outcome_fn=fetch_outcome)
    job.init_task(seeds_from_list(spark, seed_urls(80)))
    s1 = job.run_epoch(1)
    assert s1.failed + s1.blocked > 0, "outcome injection produced no failures"
    dbg = job.debug_t.read(spark)
    rows = dbg.collect()
    # one debug row per failed item, never for completed ones
    assert len(rows) == s1.failed + s1.blocked
    for r in rows:
        assert r.epoch == 1 and r.error
        # the sandbox screenshot stand-in is deterministic and labeled
        assert base64.b64decode(r.screen_b64).decode() == f"screenshot-stub:{r.url}"
        # blocked/timeout/500 rows resolved a real page -> DOM captured;
        # ENOTFOUND rows have none
        if "ENOTFOUND" not in r.error:
            assert r.document and r.document.lstrip().startswith("<")
        else:
            assert r.document is None
    # items_browser_debug: per (epoch, host) sorted failed-id arrays whose
    # union is exactly the failed set
    meta = items_browser_debug(dbg).collect()
    ids = sorted(i for m in meta for i in m.items_browser_debug)
    assert ids == sorted(r.url_hash for r in rows)
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)


def test_debug_off_by_default_and_column_null(spark, tmp_path):
    corpus = gen_pages(spark, 100, 4).cache()
    corpus.count()
    cfg = TaskConfig(task_id="nodbg", max_items_per_second=20, epoch_seconds=1.0)
    job = CrawlJob(
        spark, str(tmp_path / "cat_nodbg"), corpus, cfg, outcome_fn=fetch_outcome
    )
    assert job.debug_t is None  # reference default: store_browser_debug false
    job.init_task(seeds_from_list(spark, seed_urls(20)))
    job.run_epoch(1)
    corpus.unpersist()


def test_fetch_group_debug_struct_direct(spark):
    # unit: the fetch UDF's debug struct, without a crawl loop
    from crawling_infrastructure_spark.operators.fetch import (
        HermeticFetcher,
        fetch_batch,
    )
    from crawling_infrastructure_spark.synth import OUTCOME_BLOCKED, OUTCOME_OK

    corpus = gen_pages(spark, 20, 2)
    claimed = corpus.select(
        "url", F.xxhash64("url").alias("url_hash"),
        F.lit("h").alias("host"), F.lit(0).alias("retries"),
    )
    fetcher = HermeticFetcher(
        epoch=1,
        outcome_fn=lambda url, epoch: OUTCOME_BLOCKED if url.endswith("0") else OUTCOME_OK,
        store_debug=True,
    )
    rows = fetch_batch(claimed, corpus, fetcher).collect()
    blocked = [r for r in rows if r.status == Status.FAILED]
    ok = [r for r in rows if r.status == Status.COMPLETED]
    assert blocked and ok
    assert all(r.browser_debug is None for r in ok)
    assert all(
        r.browser_debug.document and r.browser_debug.screen_b64 for r in blocked
    )
