"""HTML cleaning / extraction.

``clean_html`` is a byte-exact port of the reference's regex-based cleaner
(/root/reference/crawler/src/http_worker.ts:131-164):

- script strip: ``/<script\\b[^<]*(?:(?!<\\/script>)<[^<]*)*<\\/script>/gi``
- style strip:  ``/<style>.*?<\\/style>/gi``  (NO dotall — JS ``.`` does not
  cross newlines, so multi-line <style> blocks survive; we reproduce that
  quirk, including JS's exact "not ." set [^\\n\\r\\u2028\\u2029])
- 'noscript' is in the allowed tag list in the reference but has NO strip
  branch (http_worker.ts:133,144-161) — accepted and ignored, same here.

This is the per-row invariant from BASELINE.json input_hint: byte-identical
extracted text per url. The hot path applies it inside an Arrow-batched
pandas UDF (Python ``re`` matches JS semantics for these patterns where Java
``regexp_replace`` can diverge — SURVEY.md F1).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# JS `.` (no /s) excludes \n \r     — Python `.` only \n, so spell
# the class out for byte parity on \r-bearing input.
_JS_DOT = "[^\n\r\u2028\u2029]"

RE_SCRIPT = re.compile(
    r"<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>", re.IGNORECASE
)
RE_STYLE = re.compile(rf"<style>{_JS_DOT}*?</style>", re.IGNORECASE)

ALLOWED_TAGS = ("style", "script", "noscript")  # http_worker.ts:133


def clean_html(html: str, tags: Iterable[str] = ("script", "style")) -> str:
    """Port of HttpWorker.clean_html — same option handling, same regexes,
    same order (script first, then style)."""
    if html is None:
        return html
    tags_to_strip = [t for t in tags if t in ALLOWED_TAGS]
    if "script" in tags_to_strip:
        html = RE_SCRIPT.sub("", html)
    if "style" in tags_to_strip:
        html = RE_STYLE.sub("", html)
    return html


# F2 — the browser worker's non-regex clean_html path
# (crawler/src/browser_worker.ts:690-746): remove whole <script>/<style>/
# <noscript> subtrees (page.evaluate getElementsByTagName(...).remove(),
# :717-724) and all comment nodes (the NodeIterator SHOW_COMMENT removal,
# :726-741 — the branch the reference marks "@todo: does not seem to work";
# we implement the intended semantics). Same allowed-tag whitelist
# (:692-699). script/style are raw-text elements and noscript cannot nest
# inside itself, so subtree removal is exactly "from <tag...> to the first
# matching </tag>" for these three tags — no general DOM needed. Unlike
# puppeteer's page.content(), untouched bytes are preserved verbatim (no
# DOM re-serialization) — the stronger invariant for an engine.
_DOM_STRIP_RE = {
    tag: re.compile(rf"<{tag}\b.*?</{tag}\s*>", re.IGNORECASE | re.DOTALL)
    for tag in ALLOWED_TAGS
}
RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)


def clean_html_dom(
    html: str, tags: Iterable[str] = ("script", "style", "noscript")
) -> str:
    """F2 BrowserWorker.clean_html, DOM path (browser_worker.ts:690-746):
    strip whole element subtrees for the whitelisted tags, then all
    comments. Unterminated raw-text elements (no closing tag) are left
    in place, as is any comment opened but never closed."""
    if html is None:
        return html
    for tag in tags:
        if tag in ALLOWED_TAGS:  # browser_worker.ts:692-699
            html = _DOM_STRIP_RE[tag].sub("", html)
    return RE_COMMENT.sub("", html)


def clean_html_dom_col(
    html_str: Column, tags: Iterable[str] = ("script", "style", "noscript")
) -> Column:
    """JVM-side F2: the same strips as chained regexp_replace, staying
    inside whole-stage codegen (Java regex (?is) == Python re.I|re.S for
    these patterns — agreement is pinned by tests)."""
    col = html_str
    for tag in tags:
        if tag in ALLOWED_TAGS:
            col = F.regexp_replace(col, rf"(?is)<{tag}\b.*?</{tag}\s*>", "")
    return F.regexp_replace(col, r"(?s)<!--.*?-->", "")


# href extraction — the reference does this with cheerio over stored HTML in
# its domain-count analytics (master/other/domain_count.js:37-52). Our corpus
# HTML is generated with double-quoted hrefs, so a single regex is exact; it
# also handles single quotes for robustness.
_HREF_PATTERN = r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']"""
RE_HREF = re.compile(_HREF_PATTERN, re.IGNORECASE)


def extract_links(html: str) -> list[str]:
    if not html:
        return []
    return [h.strip() for h in RE_HREF.findall(html) if h and h.strip()]


def extract_links_col(html_str: Column) -> Column:
    """JVM-side variant: regexp_extract_all stays inside codegen — use this
    for analytics over the pages table (domain counts) where the per-row UDF
    cost would dominate at 100 TB."""
    # Java regex shares this pattern's syntax verbatim; (?i) mirrors the
    # Python side's re.IGNORECASE so both extractors see <A HREF=...> too.
    return F.regexp_extract_all(html_str, F.lit("(?i)" + _HREF_PATTERN), 1)


def extract_text(
    html_series: pd.Series, tags: Iterable[str] = ("script", "style")
) -> pd.Series:
    """Vectorized text extraction for pandas UDFs: bytes -> cleaned str."""
    def one(b):
        if b is None:
            return None
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b
        return clean_html(s, tags)

    return html_series.map(one)
