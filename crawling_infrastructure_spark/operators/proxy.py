"""Proxy-pool operators — W2 proxy pick re-expressed as DataFrame plans.

Reference semantics (crawler/src/proxy.ts):
- ``getProxy`` (proxy.ts:124-150): ``findOneAndUpdate(filter, {last_used:
  now, $inc: {obtain_counter: 1}}, sort: {proxy_fail_counter: 1,
  last_used: 1, obtain_counter: 1})`` — least-failed, then least-recently
  used, then least-obtained proxy wins; the winner's ``last_used`` and
  ``obtain_counter`` are bumped atomically.
- ``updateProxy`` (proxy.ts:53-83): reason→update mapping
  ``blocked``      → status='blocked', last_blocked=now, block_counter+=1
  ``damaged``      → status='damaged', last_used=now
  ``check_failed`` → last_used=now, proxy_fail_counter+=1
- ``getFreshProxy`` (proxy.ts:86-122): up to 5 pick/check attempts; a
  failing check marks ``check_failed`` (not damaged) and retries.
- Status enum (lib/types/proxy.ts:32-36): functional/damaged/expired.

Determinism: Mongo breaks sort ties in ``_id`` order; here the ``proxy``
string (the "host:port" identity, lib/types/proxy.ts:56) is the total
tie-break so every pick is reproducible.

Scale notes: the proxy pool is O(10^2..10^4) rows — driver/broadcast
scale by construction, so the single-partition windows below are cheap
and deliberate. The per-row assignment path (``assign_proxies``) is the
one that must scale with the BATCH: it broadcast-joins the ranked pool
onto the claimed rows by hash, shuffle-free on the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _pick_order() -> tuple:
    """getProxy's compound sort (proxy.ts:141) + deterministic tie-break.

    Built lazily — F.asc needs an active SparkContext, which module import
    must not require.
    """
    return (
        F.asc("proxy_fail_counter"),
        F.asc("last_used"),
        F.asc("obtain_counter"),
        F.asc("proxy"),
    )


def pick_proxy(proxies: DataFrame, predicate: Column | None = None) -> DataFrame:
    """W2: the top-1 proxy under getProxy's compound sort (proxy.ts:124-150).

    ``predicate`` is the caller's IProxyFilter (e.g. whitelisted/rotating
    flags, lib/types/proxy.ts:39-51). Plans as TakeOrderedAndProject —
    a per-partition top-1 plus a singleton reduce, never a full sort.
    """
    if predicate is not None:
        proxies = proxies.filter(predicate)
    return proxies.orderBy(*_pick_order()).limit(1)


def obtain_proxy(
    proxies: DataFrame, now_ts: int, predicate: Column | None = None
) -> tuple[DataFrame, DataFrame]:
    """The full findOneAndUpdate: (picked row AFTER update, updated pool).

    Mirrors proxy.ts:128-134 with ``new: true``: the returned pick already
    carries last_used=now / obtain_counter+1. Functional rewrite of the
    pool instead of an in-place atomic update; the single-partition window
    is fine at pool scale (see module docstring).
    """
    eligible = predicate if predicate is not None else F.lit(True)
    # Rank with eligibility as the leading sort key so rank 1 is always the
    # best ELIGIBLE row (masking ranks computed over the whole pool would
    # leave no rank-1 row whenever the global best is filtered out).
    w = Window.orderBy(F.desc("_elig"), *_pick_order())
    ranked = proxies.withColumn("_elig", eligible).withColumn(
        "_rn", F.row_number().over(w)
    )
    is_pick = (F.col("_rn") == 1) & F.col("_elig")
    updated = ranked.select(
        *[
            c
            for c in proxies.columns
            if c not in ("last_used", "obtain_counter")
        ],
        F.when(is_pick, F.lit(now_ts)).otherwise(F.col("last_used")).alias("last_used"),
        F.when(is_pick, F.col("obtain_counter") + 1)
        .otherwise(F.col("obtain_counter"))
        .alias("obtain_counter"),
        "_rn",
        "_elig",
    )
    picked = (
        updated.filter((F.col("_rn") == 1) & F.col("_elig"))
        .drop("_rn", "_elig")
        .select(*proxies.columns)
    )
    return picked, updated.drop("_rn", "_elig").select(*proxies.columns)


def mark_proxy(
    proxies: DataFrame, proxy_id: Column, reason: str, now_ts: int
) -> DataFrame:
    """updateProxy's reason→update mapping (proxy.ts:53-83) as a pool rewrite.

    ``proxy_id`` is a boolean Column selecting the row(s) to update (the
    reference updates by _id; pass e.g. ``F.col("proxy") == "1.2.3.4:80"``).
    """
    if reason not in ("blocked", "damaged", "check_failed"):
        raise ValueError(f"unknown updateProxy reason: {reason!r}")
    cols = []
    for c in proxies.columns:
        col = F.col(c)
        if reason == "blocked":
            if c == "status":
                col = F.when(proxy_id, F.lit("blocked")).otherwise(col)
            elif c == "last_blocked":
                col = F.when(proxy_id, F.lit(now_ts)).otherwise(col)
            elif c == "block_counter":
                col = F.when(proxy_id, col + 1).otherwise(col)
        elif reason == "damaged":
            if c == "status":
                col = F.when(proxy_id, F.lit("damaged")).otherwise(col)
            elif c == "last_used":
                col = F.when(proxy_id, F.lit(now_ts)).otherwise(col)
        else:  # check_failed
            if c == "last_used":
                col = F.when(proxy_id, F.lit(now_ts)).otherwise(col)
            elif c == "proxy_fail_counter":
                col = F.when(proxy_id, col + 1).otherwise(col)
        cols.append(col.alias(c))
    return proxies.select(*cols)


def assign_proxies(
    batch: DataFrame, proxies: DataFrame, key: str = "url_hash"
) -> DataFrame:
    """Scale path: deterministic per-row proxy assignment for a claim batch.

    The reference picks one proxy per worker process; the Spark analogue
    is one proxy per fetch row, chosen deterministically so replays agree:
    rank the eligible pool under the W2 compound sort, then broadcast-join
    ``rank == pmod(hash(key), n_pool) + 1`` onto the batch. The big side
    never shuffles; the pool is broadcast (O(10^2..10^4) rows).

    Adds a ``proxy`` column to ``batch``.
    """
    w = Window.orderBy(*_pick_order())
    ranked = proxies.select(
        F.col("proxy").alias("_assigned_proxy"),
        F.row_number().over(w).alias("_proxy_rank"),
    )
    n = ranked.count()
    if n == 0:
        # getFreshProxy returns null on an empty pool -> caller aborts
        # (proxy.ts:120-122); here: batch with a null proxy column.
        return batch.withColumn("proxy", F.lit(None).cast("string"))
    slot = (F.pmod(F.xxhash64(F.col(key)), F.lit(n)) + 1).cast("int")
    return (
        batch.withColumn("_proxy_rank", slot)
        .join(F.broadcast(ranked), "_proxy_rank", "left")
        .drop("_proxy_rank")
        .withColumnRenamed("_assigned_proxy", "proxy")
    )
