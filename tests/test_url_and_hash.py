"""Parity between the pure-Python and Spark-column implementations of
canonicalization / host extraction / hashing — the oracle and the engine
must agree on every byte."""

from pyspark.sql import functions as F

from crawling_infrastructure_spark.functions.url import (
    canonicalize_url,
    canonicalize_url_col,
    host_col,
    host_of,
    registrable_domain,
    registrable_domain_col,
)
from crawling_infrastructure_spark.functions.xxhash import spark_xxhash64_str

CASES = [
    "https://Example.COM/path?a=1#frag",
    "http://host001.example:80/p/1",
    "https://host002.example:443",
    "HTTP://UPPER.example/",
    "  https://ws.example/x  ",
    "https://h.example/p?",
    "https://h.example/p?q=1&r=2",
    "ftp://nope.example/x",
    "not a url",
    "",
    "/relative/path",
    "https://a.b.c.d.example/x",
    "https://h.example:8080/custom-port",
]


def test_canonicalize_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "url string")
    got = df.select(canonicalize_url_col(F.col("url")).alias("c")).collect()
    for case, row in zip(CASES, got):
        assert canonicalize_url(case) == row.c, case


def test_host_and_domain_parity(spark):
    urls = [canonicalize_url(c) for c in CASES if canonicalize_url(c)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        host_col(F.col("url")).alias("h"),
        registrable_domain_col(host_col(F.col("url"))).alias("rd"),
    ).collect()
    for r in rows:
        assert r.h == host_of(r.url)
        assert r.rd == registrable_domain(r.h)


def test_xxhash64_parity(spark):
    urls = [canonicalize_url(c) for c in CASES if canonicalize_url(c)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", F.xxhash64("url").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_str(r.url) == r.h


def test_canonicalize_idempotent():
    for c in CASES:
        one = canonicalize_url(c)
        if one is not None:
            assert canonicalize_url(one) == one


def test_format_bytes_matches_reference_js():
    # oracle values computed by hand from helpers.ts:96-106 semantics
    from crawling_infrastructure_spark.functions.format import format_bytes

    assert format_bytes(0) == "0 Bytes"
    assert format_bytes(1) == "1 Bytes"
    assert format_bytes(1023) == "1023 Bytes"
    assert format_bytes(1024) == "1 KB"           # parseFloat drops .00
    assert format_bytes(1536) == "1.5 KB"
    assert format_bytes(1024 ** 2 * 2.345) == "2.35 MB"
    assert format_bytes(1024 ** 3) == "1 GB"
    assert format_bytes(1536, decimals=0) == "2 KB"  # toFixed(0) rounds


def test_time_format_matches_reference_js(spark):
    from pyspark.sql import functions as F

    from crawling_infrastructure_spark.functions.format import time_format, time_format_col

    cases = [0, 999, 1000, 61_000, 3_661_000, 90_061_000, 123_456_789]
    for ms in cases:
        d = time_format(ms)
        assert 0 <= d["seconds"] < 60 and 0 <= d["minute"] < 60 and 0 <= d["hour"] < 24
        total = ((d["day"] * 24 + d["hour"]) * 60 + d["minute"]) * 60 + d["seconds"]
        assert total == ms // 1000
    # column form agrees with the pure function
    df = spark.createDataFrame([(ms,) for ms in cases], ["ms"])
    rows = df.select("ms", time_format_col(F.col("ms")).alias("t")).collect()
    for r in rows:
        assert r["t"].asDict() == time_format(r["ms"])
