"""crawling_infrastructure_spark — a PySpark-native re-implementation of the
query/data-processing capabilities of NikolaiT/Crawling-Infrastructure.

The reference (/root/reference) is a TypeScript distributed crawl system:
a MongoDB URL frontier, a scheduler daemon, and serverless fetch workers.
This package re-expresses the same observable semantics — frontier state
machine, politeness-budgeted ranked dequeue, fetch/extract, URL-seen dedup,
metrics/lineage, checkpoint/resume — as idiomatic Spark DataFrame plans:

- frontier  -> a versioned Parquet table (Iceberg-style snapshots) bucketed
               by host_hash; claims are window-ranked batches, not per-row
               atomic updates (reference: crawler/src/crawl_queue.ts:89-117)
- fetch     -> groupBy(host).applyInPandas vectorized fetch/extract UDF
               (reference: crawler/src/handler.ts:51-206)
- URL-seen  -> canonicalize + xxhash64 anti-join plus a sharded Bloom filter
               (the reference has NO dedup — see SURVEY.md J3/S4)
- scheduler -> per-host token-bucket budget derived from max_items_per_second
               (reference: master/src/models/crawltask.model.ts:449-478)

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
