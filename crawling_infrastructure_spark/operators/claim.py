"""The dequeue — W1 getItemsToCrawlSafe re-expressed as a window-ranked
batch claim (reference: crawler/src/crawl_queue.ts:89-117, a loop of N atomic
findOneAndUpdate calls in Mongo natural order).

Spark plan, chosen for 10^10-row frontiers:

1. ``status = initial`` filter — pushed to the Parquet scan (min/max +
   dictionary pruning; with Iceberg, partition-level pruning).
2. per-host ranking: ``row_number() OVER (PARTITION BY host ORDER BY
   priority DESC, epoch_added, seq)`` — one shuffle by host. This is also
   where politeness lives: rank <= per-host cap. Hot hosts (Zipf head) are
   bounded by the cap itself, so the window state per host never exceeds it
   after the rank filter; AQE handles residual partition skew.
3. global token-bucket budget: ``orderBy(rank, -priority, epoch_added, seq)
   .limit(B)`` — compiles to TakeOrderedAndProject, a *distributed partial
   top-k* (each partition keeps B candidates, single merge of tiny heaps).
   No global sort, no single-partition window. Ordering by per-host rank
   first round-robins hosts, matching how the reference spreads one task
   across many workers instead of draining one host.

The claimed batch transitions initial -> running via merge (Iceberg: MERGE
INTO; here: broadcast-join overwrite) — snapshot isolation replaces Mongo's
per-row atomicity (SURVEY.md O3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.schema import Status

def claim_order():
    return [F.desc("priority"), F.asc("epoch_added"), F.asc("seq")]


def rank_candidates(frontier: DataFrame) -> DataFrame:
    w = Window.partitionBy("host").orderBy(*claim_order())
    return frontier.filter(F.col("status") == Status.INITIAL).withColumn(
        "host_rank", F.row_number().over(w)
    )


def claim_batch(frontier: DataFrame, cfg: TaskConfig) -> DataFrame:
    """Select this epoch's crawl batch under the politeness budget.

    budget B = max_items_per_second x epoch_seconds (token bucket — the
    Spark-native replacement for the reference's jittered sleeps F7 and
    worker-count feedback loop F13); per-host cap = max_items_per_host_per_epoch.
    """
    ranked = rank_candidates(frontier).filter(
        F.col("host_rank") <= cfg.max_items_per_host_per_epoch
    )
    # fast path: if every capped candidate fits in the budget, the top-k is
    # the identity — skip TakeOrdered entirely (matters when the budget is
    # huge, e.g. a firehose backfill epoch: heaps of size B per partition
    # are pure waste). One cheap count against the cached ranking buys it.
    ranked = ranked.cache()
    if ranked.count() <= cfg.epoch_budget:
        return ranked
    return ranked.orderBy(
        F.asc("host_rank"), F.desc("priority"), F.asc("epoch_added"), F.asc("seq")
    ).limit(cfg.epoch_budget)


def mark_running(frontier: DataFrame, claimed: DataFrame) -> DataFrame:
    """initial -> running for the claimed set (crawl_queue.ts:94-101's
    findOneAndUpdate, batched). Claimed side is budget-bounded -> broadcast."""
    c = claimed.select(F.col("url_hash").alias("c_hash"))
    j = frontier.join(F.broadcast(c), frontier.url_hash == F.col("c_hash"), "left")
    return j.withColumn(
        "status",
        F.when(F.col("c_hash").isNotNull(), F.lit(Status.RUNNING))
        .otherwise(F.col("status"))
        .cast("int"),
    ).drop("c_hash")
