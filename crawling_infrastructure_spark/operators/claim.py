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
3. global token-bucket budget via *stratified top-k*: the global claim order
   is (host_rank ASC, priority DESC, epoch_added, seq) — round-robin across
   hosts. Instead of a global sort-limit (single-partition GlobalLimit at
   large budgets) or a cached-count fast path (the round-1 cache leak), we
   compute the per-host candidate histogram with ONE tiny hash aggregate
   (``groupBy(host).count()`` — partial map-side combine, only (host, n)
   pairs shuffle), derive on the driver how many whole host-rank strata fit
   in the budget, and take ``rank <= r*`` plus a small TakeOrdered over the
   single boundary stratum. Exactly equal to the naive
   ``orderBy(rank,...).limit(B)`` row set, but no stage ever handles more
   than one stratum and the heap size is the boundary remainder, not B.

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


_TOPK_BY = ["host", "priority", "epoch_added", "seq"]
_TOPK_ASC = [True, False, True, True]  # claim_order within host; total (seq=url_hash)


def _local_topk(initial: DataFrame, k: int) -> DataFrame:
    """Per-partition per-host top-k pre-reduction — the piece that makes the
    claim's window shuffle O(batch) instead of O(claimable frontier).

    The global per-host top-k is contained in the union of each input
    partition's per-host top-k (any row in the global top-k is in its own
    partition's top-k for that host), so ranking downstream only has to
    shuffle O(partitions x hosts_per_partition x k) surviving rows — at a
    10^10-row frontier the full-frontier window shuffle this replaces was
    the dominant per-epoch cost (VERDICT r3 plan audit). Runs as an
    Arrow-batched mapInPandas (narrow transformation, no shuffle), folding
    batch-local top-k into a running per-host accumulator so peak memory is
    O(hosts_in_partition x k), not O(partition)."""

    schema = initial.schema

    def reduce(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            top = (
                pdf.sort_values(_TOPK_BY, ascending=_TOPK_ASC, kind="mergesort")
                .groupby("host", sort=False)
                .head(k)
            )
            if acc is not None:
                top = (
                    pd.concat([acc, top])
                    .sort_values(_TOPK_BY, ascending=_TOPK_ASC, kind="mergesort")
                    .groupby("host", sort=False)
                    .head(k)
                )
            acc = top
        if acc is not None and len(acc):
            yield acc

    return initial.mapInPandas(reduce, schema)


def _stratum_histogram(frontier: DataFrame, cap: int) -> list[tuple[int, int]]:
    """[(capped_host_count, n_hosts)] — the whole politeness stratification
    compressed to <= cap rows. Never materializes the window."""
    rows = (
        frontier.filter(F.col("status") == Status.INITIAL)
        .groupBy("host")
        .agg(F.count("*").alias("c"))
        .select(F.least(F.col("c"), F.lit(cap)).alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("hosts"))
        .collect()
    )
    return [(int(r["c"]), int(r["hosts"])) for r in rows]


def claim_batch(
    frontier: DataFrame,
    cfg: TaskConfig,
    with_count: bool = False,
    budget: int | None = None,
    local_topk: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Select this epoch's crawl batch under the politeness budget.

    budget B = max_items_per_second x epoch_seconds (token bucket — the
    Spark-native replacement for the reference's jittered sleeps F7), unless
    an explicit ``budget`` is passed (the F12/F13 adaptive feedback loop,
    plans/adaptive.py); per-host cap = max_items_per_host_per_epoch.

    ``with_count=True`` additionally returns the exact claimed-row count,
    already known from the histogram — callers (the epoch loop) skip a
    ``count()`` job on the result.

    ``local_topk=True`` (the bucketed / 10^10 path, epoch loop at nb > 1):
    once the histogram fixes the boundary stratum r*, only each host's top
    (r*+1) rows can possibly be claimed, so a per-partition per-host top-k
    pre-reduction (``_local_topk``) runs BEFORE the ranking window and the
    shuffle handles O(budget)-ish survivors instead of every initial row.
    The pre-reduction sees only a SLIM 5-column projection (the claim-order
    columns + url_hash) — the Arrow round-trip would otherwise re-introduce
    an O(initial-rows x row-width) term — and the full frontier rows are
    re-attached to the budget-filtered winners afterwards with one
    O(claimed) equi-join. Requires url_hash-unique frontiers (the dedup=True
    invariant; the epoch loop only enables this path under it). The result
    is row-for-row identical to the plain path: per-host top-k survives
    local reduction exactly, and host_rank computed on survivors equals the
    global rank for every surviving row (a host's rank-r row has exactly
    its r-1 claim-order predecessors surviving with it).
    """
    cap = cfg.max_items_per_host_per_epoch
    budget = cfg.epoch_budget if budget is None else max(budget, 0)
    hist = _stratum_histogram(frontier, cap)
    # hosts_at_least[r] = number of hosts with >= r capped candidates
    # == size of host-rank stratum r
    total = sum(c * h for c, h in hist)

    cols = frontier.columns
    initial = frontier.filter(F.col("status") == Status.INITIAL)

    def ranked_for(k: int) -> DataFrame:
        if not local_topk:
            return rank_candidates(frontier).filter(F.col("host_rank") <= cap)
        # already initial-filtered upstream; the slim projection has no
        # status column, so rank directly instead of via rank_candidates
        slim = initial.select("host", "priority", "epoch_added", "seq", "url_hash")
        w = Window.partitionBy("host").orderBy(*claim_order())
        return (
            _local_topk(slim, k)
            .withColumn("host_rank", F.row_number().over(w))
            .filter(F.col("host_rank") <= cap)
        )

    def attach(claimed_slim: DataFrame) -> DataFrame:
        """Slim winners -> full frontier rows + host_rank (O(claimed) join;
        the winners side is budget-bounded, AQE broadcasts it)."""
        if not local_topk:
            return claimed_slim
        keys = claimed_slim.select("url_hash", "host_rank")
        return initial.join(keys, "url_hash").select(*cols, "host_rank")

    if total <= budget:
        out_all = attach(ranked_for(cap))
        return (out_all, total) if with_count else out_all

    # stratum[r] = row count at host_rank == r == #hosts with >= r capped
    # candidates: one O(cap) suffix sum over the histogram, not an
    # O(sum(c)) expansion (cap is user-set and can be 10^5+)
    stratum = [0] * (cap + 2)
    for c, h in hist:
        stratum[c] += h
    for r in range(cap, 0, -1):
        stratum[r] += stratum[r + 1]
    cum, r_star = 0, 0
    while r_star < cap and cum + stratum[r_star + 1] <= budget:
        r_star += 1
        cum += stratum[r_star]
    remainder = budget - cum

    ranked = ranked_for(r_star + 1)
    full = ranked.filter(F.col("host_rank") <= r_star)
    if remainder == 0:
        return (attach(full), cum) if with_count else attach(full)
    boundary = (
        ranked.filter(F.col("host_rank") == r_star + 1)
        .orderBy(*claim_order())
        .limit(remainder)
    )
    out = attach(full.unionByName(boundary))
    return (out, budget) if with_count else out


def mark_running(frontier: DataFrame, claimed: DataFrame) -> DataFrame:
    """initial -> running for the claimed set (crawl_queue.ts:94-101's
    findOneAndUpdate, batched). Claimed side is budget-bounded -> broadcast.
    The claimed keys are deduplicated first: with cfg.dedup=False the
    frontier legitimately carries duplicate url_hash rows and a raw join
    would multiply them."""
    c = claimed.select(F.col("url_hash").alias("c_hash")).distinct()
    j = frontier.join(F.broadcast(c), frontier.url_hash == F.col("c_hash"), "left")
    return j.withColumn(
        "status",
        F.when(F.col("c_hash").isNotNull(), F.lit(Status.RUNNING))
        .otherwise(F.col("status"))
        .cast("int"),
    ).drop("c_hash")
