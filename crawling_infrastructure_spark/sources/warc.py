"""WARC ingestion — the format Common-Crawl-style corpora actually arrive
in (ISO 28500; the north-rule input table (url, warc_ts, html, text, lang)
is exactly what a WARC response record carries once parsed).

Spark shape: ``spark.read.format("binaryFile")`` hands each WARC shard to
ONE task as raw bytes, and an Arrow-batched ``mapInPandas`` stage parses
records. That is the right distribution for this format: Common Crawl
ships ~10^5 gzip shards of ~1 GB per crawl, and multi-member gzip is not
block-splittable — the unit of parallelism IS the shard (10^5 tasks keeps
a 1000-executor cluster saturated; nothing is gained by sub-file splits
that a gzip stream can't honor anyway). Parsing is stdlib-only (gzip +
byte scanning), streams record-by-record, and never materializes more
than one record's payload at a time beyond the Arrow batch.

Reference tie-in: the reference stores fetched HTML per item in S3
(s3.service.ts storeInCloud) and has no archival-format reader; this is
the standard-format front door a Spark user needs to run the same
pipeline over public crawl data.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, html binary, "
    "http_status int, source_file string"
)

_GZIP_MAGIC = b"\x1f\x8b"


def parse_warc_bytes(blob: bytes, source: str = "") -> Iterator[dict]:
    """Yield one dict per WARC record from raw (possibly multi-member-gzip)
    shard bytes. Header parsing is byte-exact to the spec: records are
    'WARC/x.y' + CRLF headers + CRLF CRLF + Content-Length payload +
    CRLF CRLF. Response records surface the HTTP body and status;
    request/metadata/warcinfo records surface with html=None so callers
    can filter by record_type."""
    if blob[:2] == _GZIP_MAGIC:
        # GzipFile reads ALL concatenated members (CC shards are one
        # member per record — seekable by design; we stream linearly)
        blob = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not blob[pos : pos + 5] == b"WARC/":
            break
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", "0"))
        payload = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        rtype = headers.get("warc-type", "")
        body, status = None, None
        if rtype == "response" and payload[:5] == b"HTTP/":
            sep = payload.find(b"\r\n\r\n")
            status_line = payload[: payload.find(b"\r\n")].split(b" ")
            status = int(status_line[1]) if len(status_line) > 1 else None
            body = payload[sep + 4 :] if sep >= 0 else b""
        elif rtype == "resource":
            body = payload
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "record_type": rtype,
            "html": body,
            "http_status": status,
            "source_file": source,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards -> DataFrame(url, warc_ts, record_type, html,
    http_status, source_file). One task per shard (binaryFile), Arrow-
    batched parse, column-prunable output (a query over url/warc_ts only
    still pays the parse — WARC is not columnar; convert once to Parquet
    via ``warc_to_pages`` for anything run more than once)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rows.extend(parse_warc_bytes(bytes(r["content"]), r["path"]))
            out = pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "record_type", "html",
                    "http_status", "source_file",
                ],
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], utc=True, errors="coerce"
            ).dt.tz_localize(None)
            out["http_status"] = out["http_status"].astype("Int64")
            yield out

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Response records -> the engine's page shape (url, warc_ts, html,
    text, lang): decode, run the byte-exact clean_html extraction, and a
    marker-word lang guess — all existing JVM paths, no new Python."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from crawling_infrastructure_spark.operators.textstats import LANG_MARKERS

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        from crawling_infrastructure_spark.functions.html import extract_text

        return extract_text(html)

    pages = (
        warc_df.filter(F.col("record_type") == "response")
        .filter(F.col("http_status") == 200)
        .select("url", "warc_ts", "html", _extract(F.col("html")).alias("text"))
    )
    t = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = [
        F.struct(
            sum(
                (
                    F.length(t) - F.length(F.replace(t, F.lit(f" {m} "), F.lit("")))
                ) / F.lit(len(m) + 2)
                for m in markers
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    return pages.withColumn("lang", F.array_max(F.array(*scores))["lang"])
