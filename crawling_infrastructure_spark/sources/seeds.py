"""Seed ingestion — SURVEY.md S1-S4.

The reference accepts seeds as an array, a local newline file (streamed in
5 MB chunks — lib/misc/helpers.ts:49-94), or a URL (curl + gunzip —
master/src/services/crawltask.service.ts:1039-1067), and skips falsy lines
(queue.model.ts:37-48). Spark subsumes all of that: ``spark.read.text``
handles splitting, line framing, and compression codecs (.gz) natively and
in parallel, so S2/S3's 73 lines collapse into one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_seed_file(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited seed file(s) -> DataFrame['item']; blank lines
    dropped exactly like the reference's falsy-item skip."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("item"))
        .filter(F.col("item") != "")
    )


def seeds_from_list(spark: SparkSession, items: list[str]) -> DataFrame:
    items = [i for i in items if i and i.strip()]  # queue.model.ts:37-48
    return spark.createDataFrame([(i.strip(),) for i in items], "item string")
