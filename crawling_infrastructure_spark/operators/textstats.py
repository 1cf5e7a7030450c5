"""Text analysis operators for a training-data pipeline: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Every expression is chosen for *engine parity*: only functions whose
semantics are identical in Spark SQL and DuckDB (replace-counting instead of
regex-counting, single-space split instead of \\s+ split) so each operator
has an exact DuckDB oracle. All-JVM — no Python in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny marker-word lists per language (public stopword heads)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _count_occurrences(text_col, needle: str):
    """Occurrences of ``needle`` via the replace-length trick — byte-for-byte
    identical in Spark and DuckDB (no regex engine involved)."""
    return (
        (F.length(text_col) - F.length(F.replace(text_col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word scoring language guess. Returns (doc_id, guessed_lang,
    score). Implemented as array_max over (score, lang) structs, so the
    deterministic tie-break is language name DESCENDING (struct comparison
    is lexicographic) — the oracle must mirror that."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = [
        F.struct(
            sum(_count_occurrences(t, f" {m} ") for m in markers).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("guessed_lang"),
        best["score"].cast("int").alias("score"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a combined
    score, the usual pre-training corpus filter features."""
    t = F.col(text_col)
    n_chars = F.length(t)
    tokens = F.size(F.split(t, " "))
    punct = sum(_count_occurrences(t, p) for p in [".", ",", "!", "?", ";"])
    spaced = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, f" {s} ") for s in STOPWORDS)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        tokens.alias("n_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(
            (stop_hits / F.greatest(tokens, F.lit(1)))
            * F.least(tokens / F.lit(100.0), F.lit(1.0)),
            4,
        ).alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens, a BPE-ish regex tokenization (maximal runs of
    letters / digits / other-non-space — the class structure of the GPT-2
    pre-tokenizer pattern, kept to plain character classes so Java and RE2
    engines agree), and the chars/4 rule-of-thumb estimate. All JVM
    expressions — whole-stage codegen, no Python."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).cast("long").alias("n_bpe_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalization fingerprint: md5 over lowercased, whitespace-collapsed
    text — the cheap exact-dup key robust to formatting noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
    )
