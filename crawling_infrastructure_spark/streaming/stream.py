"""Structured Streaming surfaces — SURVEY.md §2.9.

The reference's streaming-shaped behaviors and their Spark mappings:

- daemon heartbeat loop (daemon.ts:61-79, 10 s)      -> micro-batch trigger
- longliving tasks fed by external POST /enqueue     -> file-source seed
  stream feeding the frontier via foreachBatch (dedup inside each batch
  commit, so exactly-once admission per canonical url)
- progress windows (completed per 10m/60m/...)       -> watermarked windowed
  aggregation over the metrics/event stream
- URL-seen across an unbounded stream                -> applyInPandasWithState
  custom stateful operator (per-bucket seen-set state)

Everything here triggers with ``availableNow`` in tests — hermetic, no
timers — but the same code runs with a processing-time trigger unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crawling_infrastructure_spark.operators.frontier import FRONTIER_COLS, frontier_rows
from crawling_infrastructure_spark.plans.epoch import CrawlJob

SEED_STREAM_SCHEMA = T.StructType([T.StructField("value", T.StringType(), True)])


def seed_stream(spark: SparkSession, seeds_dir: str) -> DataFrame:
    """Unbounded seed source: every new file dropped into ``seeds_dir`` is a
    POST /enqueue (queue.service.ts:29-59 / enqueue.ts:91-116 analogue)."""
    return (
        spark.readStream.schema(SEED_STREAM_SCHEMA)
        .text(seeds_dir)
        .select(F.trim(F.col("value")).alias("item"))
        .filter(F.col("item") != "")
    )


def run_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    job: CrawlJob,
    checkpoint_dir: str,
    priority: int = 1,
) -> None:
    """Stream seeds into the frontier with exactly-once, deduped admission.

    foreachBatch gives us the batch DataFrame + a monotonically increasing
    batch_id; inside the closure we run the SAME dedup plan the epoch loop
    uses (anti-join against the current frontier snapshot), so streaming and
    batch admission share one code path.
    """

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        rows = frontier_rows(batch_df, priority, epoch=0)
        if job.frontier_t.exists():
            current = job.frontier_t.read(spark)
            rows = rows.join(current.select("url_hash"), "url_hash", "left_anti")
            merged = current.unionByName(rows.select(*FRONTIER_COLS))
        else:
            merged = rows.select(*FRONTIER_COLS)
        job.frontier_t.write_full(merged, tag=f"stream-batch-{batch_id}")

    q = (
        seed_stream(spark, seeds_dir)
        .writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_progress(events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window completed-counts — the streaming version
    of getTaskProgress (queue.model.ts:172-199). Late rows beyond the
    watermark are dropped, matching the reference's 'progress snapshot at
    heartbeat time' semantics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming URL-seen dedup
# ---------------------------------------------------------------------------

_DEDUP_OUT = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.LongType()), True)])


def _dedup_fn(key, pdf_iter, state: GroupState):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        for url, h in zip(pdf["url"], pdf["url_hash"]):
            if int(h) not in seen:
                seen.add(int(h))
                out.append((int(key[0]), url, int(h)))
    state.update((list(seen),))
    import numpy as np  # noqa: F401  (kept for parity with other UDF imports)

    if out:
        yield pd.DataFrame(out, columns=["bucket_id", "url", "url_hash"])


def streaming_dedup(urls: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Exactly-once URL admission over an unbounded stream: bucket by hash,
    keep per-bucket seen-set state in the state store
    (applyInPandasWithState). The streaming twin of operators/seen.py —
    at 10^10 scale the state row per bucket holds a serialized bloom instead
    of the raw hash list; the operator shape is identical."""
    bucketed = urls.withColumn(
        "bucket_id", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
