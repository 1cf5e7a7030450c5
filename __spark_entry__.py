"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship analytics pipeline on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus the
training-data pipeline operators, each paired with a DuckDB oracle (see
crawling_infrastructure_spark/plans/queries.py for the registry and the
engine-parity rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_infrastructure_spark.plans.queries import ORACLE_SQL, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical post-crawl analytics — domain
    group-count + quality/lang enrichment over the documents corpus
    (domain_count.js semantics, A10/W7), joined with per-domain quality.
    """
    from crawling_infrastructure_spark.operators.textstats import lang_id, quality_score

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    counts = (
        docs.groupBy(F.col("source").alias("domain"))
        .agg(F.count("*").alias("cnt"))
    )
    quality = (
        quality_score(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(F.col("source").alias("domain"))
        .agg(F.round(F.avg("quality"), 4).alias("avg_quality"))
    )
    langs = (
        lang_id(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(F.col("source").alias("domain"))
        .agg(F.count(F.when(F.col("guessed_lang") == "en", 1)).alias("n_en"))
    )
    return (
        counts.join(quality, "domain")
        .join(langs, "domain")
        .orderBy(F.desc("cnt"), F.asc("domain"))
        .limit(35)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
