"""Incremental LSH near-dup (operators/neardup.NearDupStore) — the epoch
form must equal the batch operator: the union of per-batch folds over any
split of a corpus is exactly minhash_lsh_pairs over the whole corpus, pair
for pair and jaccard for jaccard. Plus the epoch-loop flag
(cfg.neardup_pages) end-to-end through CrawlJob."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.catalog import Catalog
from crawling_infrastructure_spark.operators.dedup import minhash_lsh_pairs
from crawling_infrastructure_spark.operators.neardup import NearDupStore


def _docs(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")


def _pairs(df):
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_incremental_union_equals_batch(spark, tmp_path, threshold):
    docs = _docs(spark).cache()
    docs.count()
    batch_pairs = _pairs(minhash_lsh_pairs(docs, num_perm=32, threshold=threshold))
    assert batch_pairs, "corpus has no near-dup pairs — test would be vacuous"

    cat = Catalog(str(tmp_path / f"nd{int(threshold * 10)}"))
    store = NearDupStore(
        cat.bucketed_table("neardup_t", 8, key="band_hash"),
        num_perm=32,
        threshold=threshold,
    )
    # three uneven batches; history for batch k = batches 0..k-1
    splits = [
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 == 1),
        docs.filter(F.col("doc_id") % 3 == 2),
    ]
    got: dict = {}
    seen = None
    for b in splits:
        out = _pairs(store.fold(b, history_texts=seen))
        assert not (set(out) & set(got)), "a pair reported twice across folds"
        got.update(out)
        store.release()
        seen = b if seen is None else seen.unionByName(b)
    assert got == batch_pairs
    docs.unpersist()


def test_epoch_loop_flag(spark, tmp_path):
    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.sources.seeds import seeds_from_list
    from crawling_infrastructure_spark.synth import gen_pages, seed_urls

    # tiny host pool -> many template-similar pages -> near-dups exist
    corpus = gen_pages(spark, 300, 3).cache()
    corpus.count()
    root = str(tmp_path / "cat_nd")
    cfg = TaskConfig(
        task_id="nd",
        max_items_per_second=40,
        epoch_seconds=2.0,
        neardup_pages=True,
        neardup_threshold=0.5,
    )
    job = CrawlJob(spark, root, corpus, cfg)
    job.init_task(seeds_from_list(spark, seed_urls(80)))
    s1 = job.run_epoch(1)
    s2 = job.run_epoch(2)
    assert job.neardup.table.exists()
    # the band store holds every completed page exactly once
    n_docs = (
        job.neardup.table.read(spark).select("doc_id").distinct().count()
    )
    assert n_docs == s1.completed + s2.completed
    # the pairs log matches the batch operator over ALL pages crawled so far
    pages = job.pages_t.read(spark).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    expect = _pairs(minhash_lsh_pairs(pages, num_perm=32, threshold=0.5))
    logged = _pairs(job.neardup_pairs_t.read(spark))
    assert logged == expect
    assert s1.neardup_pairs + s2.neardup_pairs == len(expect)
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)

def test_streaming_neardup_admission_equals_batch(spark, tmp_path):
    """The Structured Streaming surface (stream.run_neardup_admission):
    parquet drops -> micro-batch folds -> pairs log. Union over genuine
    multiple micro-batches (maxFilesPerTrigger=1) == batch operator."""
    import os

    from crawling_infrastructure_spark.streaming.stream import (
        run_neardup_admission,
    )

    docs = _docs(spark).cache()
    docs.count()
    batch_pairs = _pairs(minhash_lsh_pairs(docs, num_perm=32, threshold=0.5))
    assert batch_pairs

    docs_dir = str(tmp_path / "drops")
    os.makedirs(docs_dir)
    # three drop files = three micro-batches
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)

    cat = Catalog(str(tmp_path / "cat_snd"))
    store = NearDupStore(
        cat.bucketed_table("neardup_t", 8, key="band_hash"),
        num_perm=32,
        threshold=0.5,
    )
    pairs_dir = str(tmp_path / "pairs")
    run_neardup_admission(
        spark,
        docs_dir,
        store,
        texts_dir=str(tmp_path / "texts"),
        pairs_dir=pairs_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    got = _pairs(spark.read.parquet(pairs_dir))
    assert got == batch_pairs
    # every doc admitted into the band store exactly once
    n = store.table.read(spark).select("doc_id").distinct().count()
    assert n == docs.count()
    docs.unpersist()
