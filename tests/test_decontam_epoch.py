"""Per-epoch benchmark-decontamination audit (CrawlJob eval_docs): the
union of the per-epoch contam_{task} appends must equal the batch
operators/corpus.contamination over all pages crawled so far, doc for doc
and window-count for window-count. Flag-only semantics: nothing is dropped
from the crawl; the audit trail feeds the downstream funnel."""

import shutil

from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.functions.html import clean_html
from crawling_infrastructure_spark.operators.corpus import contamination
from crawling_infrastructure_spark.plans.epoch import CrawlJob
from crawling_infrastructure_spark.sources.seeds import seeds_from_list
from crawling_infrastructure_spark.synth import gen_pages, seed_urls


def test_epoch_decontam_audit_equals_batch(spark, tmp_path):
    corpus = gen_pages(spark, 250, 3).cache()
    corpus.count()
    # eval set = the extracted text of a handful of corpus pages — those
    # exact pages (and any template siblings sharing an 8-token run) must
    # be flagged once crawled
    eval_rows = corpus.limit(6).select("url", "html").collect()
    eval_docs = spark.createDataFrame(
        [
            (i, clean_html(bytes(r.html).decode("utf-8", errors="replace")))
            for i, r in enumerate(eval_rows)
        ],
        "doc_id long, text string",
    )

    root = str(tmp_path / "cat_dc")
    cfg = TaskConfig(task_id="dc", max_items_per_second=40, epoch_seconds=2.0)
    job = CrawlJob(spark, root, corpus, cfg, eval_docs=eval_docs)
    job.init_task(seeds_from_list(spark, seed_urls(60)))
    s1 = job.run_epoch(1)
    s2 = job.run_epoch(2)
    assert job.contam_t.exists()

    pages = job.pages_t.read(spark).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    expect = {
        r.doc_id: r.n_eval_windows
        for r in contamination(
            pages, eval_docs, window=cfg.decontam_window
        ).collect()
    }
    assert expect, "no contaminated doc crawled — test would be vacuous"
    logged = job.contam_t.read(spark).collect()
    assert {r.doc_id: r.n_eval_windows for r in logged} == expect
    # each flagged doc logged exactly once, in the epoch it was admitted
    assert len(logged) == len(expect)
    assert s1.contam_docs + s2.contam_docs == len(expect)
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)
