"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k neighbors, all-JVM (zip_with dot
  product inside whole-stage codegen). The O(n*m) baseline — correct at any
  scale where one side broadcasts.
- ``cosine_topk_blocked``: IVF-style scale path — both sides are assigned to
  coarse buckets (here a provided block column; at 10^9 vectors, the nearest
  centroid of a k-means codebook) and only intra-bucket pairs score, turning
  the cross join into an equi-join. Recall < 1.0 by construction (same
  trade as any IVF index); the bruteforce op is the ground truth.

Ranking determinism: cosine is rounded to 4 decimals BEFORE ranking with a
vec_id tiebreak, so float summation-order noise can't flip ranks between
engines (Spark vs the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(ea, eb):
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(ea, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(eb, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def cosine_topk_bruteforce(
    queries: DataFrame, corpus: DataFrame, k: int = 5, broadcast_queries: bool = True
) -> DataFrame:
    """Exact top-k by cosine. queries/corpus: (vec_id, embedding).
    Returns (query_id, neighbor_id, cosine, rank). The query side broadcasts
    (typical: thousands of probes vs billions of corpus vectors); per-query
    top-k happens in a window AFTER the map-side join, and the shuffle
    carries only (query, neighbor, score) triples — never embeddings."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ec"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("eq"), F.col("ec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_blocked(
    queries: DataFrame, corpus: DataFrame, k: int = 5, block_col: str = "label"
) -> DataFrame:
    """IVF-bucketed variant: only same-block pairs score (equi-join on the
    block id — shuffle partitions by block, Zipf-safe via AQE skew split)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"), F.col(block_col).alias("blk")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ec"), F.col(block_col).alias("blk")
    )
    scored = (
        q.join(c, "blk")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("eq"), F.col("ec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
