"""WARC source: byte-exact record parsing (plain + multi-member gzip),
Spark binaryFile -> mapInPandas ingestion, and the pages adapter."""

from __future__ import annotations

import gzip

from crawling_infrastructure_spark.sources.warc import parse_warc_bytes, read_warc, warc_to_pages

HTML_1 = b"<html><body>Hello <b>world</b> the page</body></html>"
HTML_2 = b"<html><script>var x=1;</script><body>der und die text</body></html>"


def _record(rtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _shard() -> bytes:
    return (
        _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test\r\n")
        + _record("request", "http://a.example/", "2024-01-01T00:00:01Z", b"GET / HTTP/1.1\r\n")
        + _record("response", "http://a.example/", "2024-01-01T00:00:01Z", _http(HTML_1))
        + _record("response", "http://b.example/x", "2024-02-02T12:30:00Z", _http(HTML_2))
        + _record("response", "http://c.example/gone", "2024-02-02T12:31:00Z", _http(b"nope", 404))
    )


def test_parse_warc_bytes_plain_and_gzip():
    recs = list(parse_warc_bytes(_shard()))
    assert [r["record_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    assert recs[2]["url"] == "http://a.example/"
    assert recs[2]["html"] == HTML_1
    assert recs[2]["http_status"] == 200
    assert recs[4]["http_status"] == 404
    assert recs[1]["html"] is None  # request records carry no body
    # multi-member gzip (the Common Crawl layout: one member per record)
    gz = b"".join(gzip.compress(_record("response", f"http://m{i}/", "2024-01-01T00:00:00Z", _http(HTML_1))) for i in range(3))
    assert [r["url"] for r in parse_warc_bytes(gz)] == ["http://m0/", "http://m1/", "http://m2/"]


def test_read_warc_and_pages_adapter(spark, tmp_path):
    (tmp_path / "shard0.warc").write_bytes(_shard())
    (tmp_path / "shard1.warc.gz").write_bytes(gzip.compress(_shard()))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 10  # 5 records x 2 shards
    resp = [r for r in rows if r.record_type == "response"]
    assert len(resp) == 6
    by_url = {}
    for r in resp:
        by_url.setdefault(r.url, r)
    assert bytes(by_url["http://a.example/"].html) == HTML_1
    assert by_url["http://b.example/x"].warc_ts.isoformat() == "2024-02-02T12:30:00"

    pages = warc_to_pages(df).collect()
    # 404 filtered; 2 pages x 2 shards
    assert len(pages) == 4
    p = {r.url: r for r in pages}
    from crawling_infrastructure_spark.functions.html import clean_html

    assert p["http://a.example/"].text == clean_html(HTML_1.decode())
    assert p["http://b.example/x"].lang == "de"  # der/und/die markers
    assert set(pages[0].asDict()) == {"url", "warc_ts", "html", "text", "lang"}
