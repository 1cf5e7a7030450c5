"""Proxy-pool operators — W2 proxy pick re-expressed as DataFrame plans.

Reference semantics (crawler/src/proxy.ts):
- ``getProxy`` (proxy.ts:124-150): ``findOneAndUpdate(filter, {last_used:
  now, $inc: {obtain_counter: 1}}, sort: {proxy_fail_counter: 1,
  last_used: 1, obtain_counter: 1})`` — least-failed, then least-recently
  used, then least-obtained proxy wins; the winner's ``last_used`` and
  ``obtain_counter`` are bumped atomically.
- ``updateProxy`` (proxy.ts:53-83): reason→update mapping
  ``blocked``      → last_used=now, last_blocked=now, block_counter+=1
                     (status is NOT touched — a blocked proxy sinks in the
                     pick order via last_used, it is not removed from play)
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
            # proxy.ts:57-62 — last_used IS bumped and status is NOT:
            # the blocked proxy sinks to the back of the LRU pick order
            # instead of leaving the pool (blocks are often temporary).
            if c == "last_used":
                col = F.when(proxy_id, F.lit(now_ts)).otherwise(col)
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
    batch: DataFrame,
    proxies: DataFrame,
    key: str = "url_hash",
    predicate: Column | None = None,
    hash_col: Column | None = None,
) -> DataFrame:
    """Scale path: deterministic per-row proxy assignment for a claim batch.

    The reference picks one proxy per worker process; the Spark analogue
    is one proxy per fetch row, chosen deterministically so replays agree:
    rank the eligible pool under the W2 compound sort, then broadcast-join
    ``rank == pmod(hash(key), n_pool) + 1`` onto the batch. The big side
    never shuffles; the pool is broadcast (O(10^2..10^4) rows).

    ``predicate`` is the caller's IProxyFilter; by default the reference's
    baseline filter is applied — get_proxy only ever hands out functional
    proxies (worker.ts:368-372 builds ``{status: functional, ...user}``),
    so damaged/expired rows never reach a fetch row.

    ``hash_col`` overrides the slot hash (default ``xxhash64(key)``) with a
    caller-supplied deterministic non-negative integer column — used by the
    oracle-checked rotation query, where the oracle engine lacks xxhash64.

    Adds a ``proxy`` column to ``batch``.
    """
    if predicate is None and "status" in proxies.columns:
        predicate = F.col("status") == "functional"
    if predicate is not None:
        proxies = proxies.filter(predicate)
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
    h = hash_col if hash_col is not None else F.xxhash64(F.col(key))
    slot = (F.pmod(h, F.lit(n)) + 1).cast("int")
    return (
        batch.withColumn("_proxy_rank", slot)
        .join(F.broadcast(ranked), "_proxy_rank", "left")
        .drop("_proxy_rank")
        .withColumnRenamed("_assigned_proxy", "proxy")
    )


def proxy_feedback(
    outcomes: DataFrame,
    proxies: DataFrame,
    now_ts: int,
    key: str = "url_hash",
    hash_col: Column | None = None,
) -> DataFrame:
    """Fold an epoch's fetch outcomes back into the pool — the rotation
    feedback loop the reference runs per request (handler.ts:171-176: a
    blocked response triggers getFreshProxy; proxy.ts:86-122: a failing
    pick is marked check_failed and re-picked).

    ``outcomes``: the light fetch-result frame — rows with (``key``,
    ``status``, ``retries_delta``). Each row's serving proxy is RE-DERIVED
    with the same deterministic ``assign_proxies`` expression over the same
    pool state the epoch fetched under, so attribution costs one tiny
    aggregate (<= pool-size rows shuffled) instead of carrying the proxy
    string through the Python fetch stage.

    Aggregated mark semantics == N sequential updateProxy calls sharing one
    timestamp (counter increments commute; last_used/last_blocked writes of
    the same ``now_ts`` are idempotent):
      blocked rows (retries_delta == 0)  block_counter += n_blocked,
                                         last_blocked = now, last_used = now
                                         (proxy.ts:57-62)
      failed rows  (retries_delta  > 0)  proxy_fail_counter += n_failed,
                                         last_used = now — the check_failed
                                         mark getFreshProxy issues for a
                                         pick that fails its health check
                                         (proxy.ts:96-118)

    The updated pool re-ranks next epoch's ``assign_proxies``: a marked
    proxy's bumped counters sink it in the W2 pick order, so a URL re-tried
    next epoch lands on a DIFFERENT proxy — the reference's rotation,
    re-expressed batch-wise.

    Returns the updated pool (same schema as ``proxies``).
    """
    from crawling_infrastructure_spark.schema import Status

    assigned = assign_proxies(
        outcomes.select(key, "status", "retries_delta"),
        proxies,
        key=key,
        hash_col=hash_col,
    )
    failed = F.col("status") == int(Status.FAILED)
    marks = (
        assigned.filter(failed)
        .groupBy("proxy")
        .agg(
            F.count(F.when(F.col("retries_delta") == 0, 1)).alias("_nb"),
            F.count(F.when(F.col("retries_delta") > 0, 1)).alias("_nf"),
        )
        .filter((F.col("_nb") > 0) | (F.col("_nf") > 0))
    )
    pool = proxies.join(F.broadcast(marks), "proxy", "left")
    nb = F.coalesce(F.col("_nb"), F.lit(0))
    nf = F.coalesce(F.col("_nf"), F.lit(0))
    touched = (nb > 0) | (nf > 0)
    cols = []
    for c in proxies.columns:
        col = F.col(c)
        if c == "last_used":
            col = F.when(touched, F.lit(now_ts)).otherwise(col)
        elif c == "last_blocked":
            col = F.when(nb > 0, F.lit(now_ts)).otherwise(col)
        elif c == "block_counter":
            col = col + nb
        elif c == "proxy_fail_counter":
            col = col + nf
        cols.append(col.alias(c))
    return pool.select(*cols)
