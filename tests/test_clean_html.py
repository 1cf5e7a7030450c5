"""Byte-parity tests for the clean_html port vs the reference's JS regexes
(/root/reference/crawler/src/http_worker.ts:131-164) — SURVEY.md §5 oracle 5."""

from crawling_infrastructure_spark.functions.html import clean_html, extract_links


def test_script_strip_basic():
    assert clean_html("<p>a</p><script>var x=1;</script><b>b</b>") == "<p>a</p><b>b</b>"


def test_script_with_lt_inside():
    # the JS regex handles '<' inside script bodies via the tempered pattern
    assert clean_html('<script src="x.js">if(a<b){}</script>keep') == "keep"


def test_script_multiline():
    assert clean_html("<script>\nvar a=1;\nvar b=2;\n</script>x") == "x"


def test_script_case_insensitive():
    assert clean_html("<SCRIPT>a</SCRIPT>x") == "x"


def test_two_scripts():
    assert clean_html("<script>a</script>mid<script>b</script>") == "mid"


def test_style_single_line_stripped():
    assert clean_html("<style>.a{color:red}</style>kept") == "kept"


def test_style_multiline_NOT_stripped():
    # JS '.' without /s does not cross newlines — the reference regex quirk
    # (http_worker.ts:156: /<style>.*?<\/style>/gi) must be preserved
    s = "<style>.a{\ncolor:red}</style>x"
    assert clean_html(s) == s


def test_style_carriage_return_NOT_stripped():
    # JS '.' also excludes \r — Python '.' does not; the port must match JS
    s = "<style>a\rb</style>x"
    assert clean_html(s) == s


def test_style_with_attribute_NOT_stripped():
    # the reference pattern is literally '<style>' — styles with attributes
    # survive (another quirk to preserve)
    s = '<style type="text/css">.a{}</style>x'
    assert clean_html(s) == s


def test_noscript_accepted_but_ignored():
    # 'noscript' is in allowed_tags but has no strip branch in the reference
    s = "<noscript>enable js</noscript>x"
    assert clean_html(s, tags=("script", "style", "noscript")) == s


def test_disallowed_tag_ignored():
    s = "<div>a</div>"
    assert clean_html(s, tags=("div",)) == s


def test_order_script_then_style():
    s = "<script><style>inner</style></script><style>s</style>rest"
    # script strip removes through the first </script>; then style strip
    assert clean_html(s) == "rest"


def test_none_passthrough():
    assert clean_html(None) is None


def test_extract_links():
    html = '<a href="http://x.com/a">t</a><a class="z" href=\'/rel\'>r</a><a href=" ">e</a>'
    assert extract_links(html) == ["http://x.com/a", "/rel"]


def test_extract_links_col_jvm_parity(spark):
    """extract_links (Python re) and extract_links_col (JVM
    regexp_extract_all) must agree on quote style and tag case — they share
    one pattern string, and the JVM side carries (?i) to mirror
    re.IGNORECASE. The JVM side keeps whitespace-only hrefs (the Python side
    strips them post-match), so parity is checked pre-strip."""
    from pyspark.sql import functions as F

    from crawling_infrastructure_spark.functions.html import (
        RE_HREF,
        extract_links_col,
    )

    cases = [
        '<a href="http://x.com/a">double</a>',
        "<a href='http://x.com/b'>single</a>",
        '<A HREF="http://x.com/c">upper</A>',
        '<a class="z" href=\'/rel\'>attrs-first</a>',
        '<a href=" ">ws-only</a>',
        '<a href="http://x.com/1">1</a><a href=\'/2\'>2</a><A Href="/3">3</A>',
        "no links here",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "html string")
    got = {
        r.html: r.links
        for r in df.select("html", extract_links_col(F.col("html")).alias("links")).collect()
    }
    for c in cases:
        assert got[c] == RE_HREF.findall(c), c
