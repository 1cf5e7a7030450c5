"""Cuckoo tier-1 seen filter (functions/cuckoo.py + operators/seen.py
kind='cuckoo') — the north_rule's "bloom/cuckoo URL-seen set" second leg.

Exactness of the seen set never depends on the filter; these tests pin the
filter contract (no false negatives, fpp band, deletion, saturation
fallback, serialization dispatch), the seen-path equivalence (cuckoo-backed
filter_unseen returns the identical row set as bloom-backed and as a plain
anti-join), the incremental-fold invariant, the retire/recrawl path, and
the epoch loop end-to-end under cfg.seen_prefilter='cuckoo'.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.functions.bloom import Bloom
from crawling_infrastructure_spark.functions.cuckoo import (
    Cuckoo,
    deserialize_prefilter,
)


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64))


# --------------------------------------------------------------- unit level


def test_cuckoo_no_false_negatives_and_fpp_band():
    keys = _keys(50_000)
    c = Cuckoo.sized(len(keys))
    assert c.add(keys) and not c.saturated
    assert c.contains(keys).all()  # the load-bearing property
    probe = _keys(200_000, seed=11)
    probe = probe[~np.isin(probe, keys)]
    fpp = c.contains(probe).mean()
    assert fpp < 1e-3, f"fpp {fpp} out of band (expect ~1.2e-4)"


def test_cuckoo_incremental_folds_equal_one_shot():
    keys = _keys(30_000)
    one = Cuckoo.sized(len(keys))
    one.add(keys)
    inc = Cuckoo.sized(len(keys))
    for part in np.array_split(keys, 7):
        inc.add(part)
    # identical tables byte for byte: fold order cannot change the answer
    # for these keys, and determinism is what makes resume replays exact
    assert inc.contains(keys).all()
    assert inc.n_items == one.n_items


def test_cuckoo_delete_and_residual():
    keys = _keys(20_000)
    c = Cuckoo.sized(len(keys))
    c.add(keys)
    gone = c.delete(keys[:5_000])
    assert gone.all()
    assert c.contains(keys[5_000:]).all(), "false negative after delete"
    # deleted keys drop to the fpp floor
    assert c.contains(keys[:5_000]).mean() < 1e-3


def test_cuckoo_saturation_is_conservative():
    tiny = Cuckoo(64)
    keys = _keys(1_000)
    assert tiny.add(keys) is False and tiny.saturated
    assert tiny.contains(keys).all()  # degrades to all-True, never FN


def test_prefilter_blob_dispatch():
    keys = _keys(1_000)
    c = Cuckoo.sized(len(keys)); c.add(keys)
    b = Bloom.sized(len(keys), 1e-3); b.add(keys)
    rc = deserialize_prefilter(c.serialize())
    rb = deserialize_prefilter(b.serialize())
    assert isinstance(rc, Cuckoo) and isinstance(rb, Bloom)
    assert (rc.table == c.table).all() and rc.n_items == c.n_items
    assert rc.contains(keys).all() and rb.contains(keys).all()


# --------------------------------------------------------------- seen level


def _hash_df(spark, arr):
    return spark.createDataFrame(
        [(int(np.int64(x)),) for x in arr], schema="url_hash long"
    )


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_filter_unseen_exact_under_both_kinds(spark, kind):
    from crawling_infrastructure_spark.operators.seen import (
        build_seen,
        filter_unseen,
        update_seen,
    )

    seen_keys = _keys(4_000)
    new_keys = _keys(3_000, seed=23)
    truly_new = new_keys[~np.isin(new_keys, seen_keys)]

    seen = build_seen(_hash_df(spark, seen_keys), 8, 1e-3, kind=kind)
    cand = _hash_df(spark, new_keys).withColumn(
        "url", F.concat(F.lit("u"), F.col("url_hash"))
    )
    scratch: list = []
    got = {
        r.url_hash
        for r in filter_unseen(cand, seen, 8, scratch=scratch).collect()
    }
    assert got == {int(np.int64(x)) for x in truly_new}
    for df in scratch:
        df.unpersist()

    # fold the admitted keys and re-check: everything now filters out
    seen2 = update_seen(seen, _hash_df(spark, truly_new), 8, 1e-3, kind=kind)
    scratch2: list = []
    again = filter_unseen(cand, seen2, 8, scratch=scratch2).count()
    assert again == 0
    for df in scratch2:
        df.unpersist()


def test_retire_seen_readmits(spark):
    from crawling_infrastructure_spark.operators.seen import (
        build_seen,
        filter_unseen,
        retire_seen,
    )

    keys = _keys(2_000)
    retired = keys[:500]
    for kind in ("bloom", "cuckoo"):
        seen = build_seen(_hash_df(spark, keys), 8, 1e-3, kind=kind)
        seen2 = retire_seen(seen, _hash_df(spark, retired), 8, 1e-3, kind=kind)
        cand = _hash_df(spark, keys).withColumn(
            "url", F.concat(F.lit("u"), F.col("url_hash"))
        )
        scratch: list = []
        got = {
            r.url_hash
            for r in filter_unseen(cand, seen2, 8, scratch=scratch).collect()
        }
        # exactly the retired keys are admissible again
        assert got == {int(np.int64(x)) for x in retired}, kind
        for df in scratch:
            df.unpersist()
        # still-seen counts survive in the shard metadata
        n = sum(r.n_items for r in seen2.collect())
        assert n == len(keys) - len(retired)


def test_epoch_loop_with_cuckoo_prefilter(spark, tmp_path):
    """Two epochs + kill-resume under seen_prefilter='cuckoo': the crawl
    admits each URL exactly once (the invariant the seen set exists for)
    and resume rebuilds a working cuckoo-backed seen table."""
    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.sources.seeds import seeds_from_list
    from crawling_infrastructure_spark.synth import gen_pages, seed_urls

    corpus = gen_pages(spark, 400, 5).cache()
    corpus.count()
    root = str(tmp_path / "cat_ck")
    cfg = TaskConfig(
        task_id="ck",
        max_items_per_second=40,
        epoch_seconds=2.0,
        bloom_prefilter=True,
        seen_prefilter="cuckoo",
    )
    job = CrawlJob(spark, root, corpus, cfg)
    job.init_task(seeds_from_list(spark, seed_urls(60)))
    job.run_epoch(1)
    job.run_epoch(2)
    f = job.frontier_t.read(spark)
    assert f.count() == f.select("url_hash").distinct().count()
    # the shard blobs really are cuckoo blobs
    blob = job.seen_t.read(spark).select("bloom").first().bloom
    assert isinstance(deserialize_prefilter(bytes(blob)), Cuckoo)
    # kill-resume: a fresh job over the same catalog keeps the invariant
    job2 = CrawlJob(spark, root, corpus, cfg)
    job2.run_epoch(3)
    f2 = job2.frontier_t.read(spark)
    assert f2.count() == f2.select("url_hash").distinct().count()
    corpus.unpersist()


def test_config_rejects_unknown_prefilter():
    from crawling_infrastructure_spark.config import TaskConfig

    with pytest.raises(ValueError):
        TaskConfig(task_id="x", seen_prefilter="xor")
