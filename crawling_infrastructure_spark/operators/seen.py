"""URL-seen set — the dedup the reference *lacks* (SURVEY.md S4/J3: its
``allow_duplicates`` flag is dead code and duplicates enter the queue
freely), required by the north_rule at 10^10-frontier scale.

Two-tier exact dedup:

  tier 1 (bloom pre-filter, no join): outlinks are checked against sharded
     Bloom filters (functions/bloom.py) keyed by ``url_hash % n_buckets``.
     Bloom-negative => DEFINITELY new (no false negatives) — these skip the
     join entirely. For a crawl where most outlinks are new, this removes
     ~(1-fpp) of the anti-join probe volume.
  tier 2 (exact anti-join): bloom-positives (truly-seen + ~0.1% false
     positives) anti-join the frontier on url_hash. With an Iceberg frontier
     bucketed by hash this is a bucket-pruned join; in the Parquet fallback
     it is a broadcast anti-join (the maybe-seen side is epoch-bounded and
     small).

Net semantics: EXACT (false positives only cost a join lookup), unlike a
bloom-only design that silently drops ~fpp of new URLs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawling_infrastructure_spark.functions.bloom import Bloom
from crawling_infrastructure_spark.schema import SEEN_SCHEMA


def bucket_expr(url_hash_col, n_buckets: int):
    return F.pmod(url_hash_col, F.lit(n_buckets)).cast("int")


def build_seen(
    hashes: DataFrame, n_buckets: int, fpp: float, expected_per_bucket: int = 1 << 16
) -> DataFrame:
    """hashes['url_hash'] -> seen table (one bloom blob per bucket).
    Buckets build independently in parallel (applyInPandas per bucket)."""

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        b = Bloom.sized(max(expected_per_bucket, len(pdf)), fpp)
        b.add(pdf["url_hash"].to_numpy().astype("uint64"))
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "n_items": [len(pdf)],
                "bloom": [b.serialize()],
            }
        )

    return (
        hashes.withColumn("bucket_id", bucket_expr(F.col("url_hash"), n_buckets))
        .groupBy("bucket_id")
        .applyInPandas(make, SEEN_SCHEMA)
    )


def update_seen(seen: DataFrame, new_hashes: DataFrame, n_buckets: int, fpp: float) -> DataFrame:
    """Fold new url_hashes into the sharded blooms (cogroup per bucket —
    only buckets receiving new URLs are rewritten)."""
    nh = new_hashes.withColumn("bucket_id", bucket_expr(F.col("url_hash"), n_buckets))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            b = Bloom.deserialize(left["bloom"].iloc[0])
            n = int(left["n_items"].iloc[0])
            bid = int(left["bucket_id"].iloc[0])
        else:
            b = Bloom.sized(1 << 16, fpp)
            n = 0
            bid = int(right["bucket_id"].iloc[0])
        if len(right):
            b.add(right["url_hash"].to_numpy().astype("uint64"))
            n += len(right)
        return pd.DataFrame({"bucket_id": [bid], "n_items": [n], "bloom": [b.serialize()]})

    return (
        seen.groupBy("bucket_id")
        .cogroup(nh.groupBy("bucket_id"))
        .applyInPandas(merge, SEEN_SCHEMA)
    )


def maybe_seen_flags(candidates: DataFrame, seen: DataFrame, n_buckets: int) -> DataFrame:
    """candidates['url','url_hash',...] + bloom check -> adds boolean
    ``maybe_seen``. Implemented as a bucket-cogrouped pandas op so each task
    deserializes exactly one shard blob."""
    cand = candidates.withColumn("bucket_id", bucket_expr(F.col("url_hash"), n_buckets))
    out_schema = T.StructType(
        list(cand.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def check(blob_pdf: pd.DataFrame, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if len(blob_pdf):
            b = Bloom.deserialize(blob_pdf["bloom"].iloc[0])
            flags = b.contains(cand_pdf["url_hash"].to_numpy().astype("uint64"))
        else:
            flags = [False] * len(cand_pdf)
        out = cand_pdf.copy()
        out["maybe_seen"] = flags
        return out

    return (
        seen.groupBy("bucket_id")
        .cogroup(cand.groupBy("bucket_id"))
        .applyInPandas(check, out_schema)
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    frontier: DataFrame,
    n_buckets: int,
    scratch: list | None = None,
) -> DataFrame:
    """EXACT new-URL filter: bloom pre-filter then anti-join for the
    maybe-seen remainder (J3 — the anti-join the reference never had).

    The flagged intermediate feeds two branches (bloom-negative passthrough
    + bloom-positive anti-join), so it is cached to run the pandas cogroup
    once. Pass ``scratch`` (a list) to receive the cached DataFrame and
    ``unpersist()`` it after materializing the result — otherwise one cached
    plan leaks per call (round-1 VERDICT 'what's wrong' #3)."""
    flagged = maybe_seen_flags(candidates, seen, n_buckets).cache()
    if scratch is not None:
        scratch.append(flagged)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen", "bucket_id")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen", "bucket_id")
    # epoch-bounded 'maybe' side — anti-join against the frontier keys.
    confirmed_new = maybe.join(
        frontier.select("url_hash"), on="url_hash", how="left_anti"
    )
    return definitely_new.unionByName(confirmed_new)
