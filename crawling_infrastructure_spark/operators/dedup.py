"""Deduplication operators over a documents table — the training-data-
pipeline extension of the crawl engine's URL-seen dedup (the reference dedups
nothing; at 100 TB corpus scale these are the operators a user of the crawl
output actually runs).

All-JVM variants (exact, n-gram Jaccard) are pure DataFrame ops; sketch
variants (MinHash-LSH, SimHash) vectorize the sketch in numpy via
mapInPandas and keep the candidate-join JVM-side.

Scale notes per operator:
- exact:    groupBy(md5(text)) — one shuffle of (hash, id), never the text.
- ngram Jaccard: shingle explode -> self-join on shingle. The shingle join
  is the classic quadratic trap; we block it by (shingle) and pre-aggregate
  distinct (doc, shingle) pairs, so only docs sharing a shingle ever meet.
- MinHash-LSH: signature = k minimums over xxhash64(shingle, seed_i)
  (numpy, one pass); band-bucket join finds candidates; exact Jaccard
  verifies. Bands/rows tuned for threshold ~0.8 (b=8, r=4 -> s-curve
  midpoint 0.79).
- SimHash: 64-bit fingerprint; near-dups = hamming <= 3 found via 4-piece
  pigeonhole bucketing (any pair within distance 3 shares >= 1 exact
  16-bit piece) — turns O(n^2) into equi-joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) -> keeper (min id) + copy count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) distinct pairs; shingle = n consecutive whitespace
    tokens. Built with JVM array functions (transform+slice) — no Python."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    # guard: sequence(1, 0) is DESCENDING in Spark — short texts get no shingles
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >= 1 shingle.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold."""
    sh = word_shingles(docs, n, id_col, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------

_MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("band_hash", T.LongType(), False),
    ]
)

_PRIME = np.uint64((1 << 61) - 1)


def _minhash_bands(pdf: pd.DataFrame, num_perm: int, bands: int, n: int, seed: int) -> pd.DataFrame:
    rows_per_band = num_perm // bands
    rng = np.random.default_rng(seed)
    A = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    B = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    out_ids, out_band, out_hash = [], [], []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = str(text).lower().split(" ")
        sh = {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}
        if not sh:
            continue
        import hashlib

        base = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in sorted(sh)
            ),
            dtype=np.uint64,
            count=len(sh),
        )
        # (a*x + b) mod p universal hashing, min per permutation (vectorized)
        sig = ((A[:, None] * base[None, :] + B[:, None]) % _PRIME).min(axis=1)
        for b in range(bands):
            seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = int(np.bitwise_xor.reduce(seg * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0x7FFFFFFFFFFFFFFF))
            out_ids.append(int(doc_id))
            out_band.append(b)
            out_hash.append(h)
    return pd.DataFrame({"doc_id": out_ids, "band": out_band, "band_hash": out_hash})


def minhash_lsh_pairs(
    docs: DataFrame, num_perm: int = 32, bands: int = 8, n: int = 3,
    threshold: float = 0.8, seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + banded LSH, verified
    with exact Jaccard (so the output is exact above the threshold, LSH only
    prunes the candidate space — same prefilter-then-verify shape as the
    URL-seen bloom). Shingles hash via md5 (deterministic across workers —
    Python's hash() is salted per process and must never reach a shuffle key)."""
    docs = docs.select(F.col("doc_id").cast("long"), "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _minhash_bands(pdf, num_perm, bands, n, seed)

    band_rows = docs.mapInPandas(gen, _MINHASH_SCHEMA)
    l = band_rows.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    r = band_rows.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    candidates = (
        l.join(r, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    exact = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    return candidates.join(exact, ["doc_a", "doc_b"], "inner")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def _md5_u64(tokens: list[str]) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc (token-hash bit voting), numpy-vectorized."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = str(text).lower().split(" ")
                if not toks:
                    continue
                h = _md5_u64(toks)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
                votes = (2 * bits - 1).sum(axis=0)
                fp = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    fp |= np.uint64(1) << np.uint64(i)
                ids.append(int(doc_id))
                fps.append(int(fp.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": fps})

    return docs.select(F.col("doc_id").cast("long"), "text").mapInPandas(gen, _SIMHASH_SCHEMA)


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming via 4x16-bit pigeonhole
    bucketing (any pair within distance 3 agrees on >= 1 of 4 pieces)."""
    fp = simhash_fingerprints(docs).cache()
    pieces = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("piece"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("piece_val"),
                )
                for i in range(4)
            ])
        ).alias("p"),
    ).select("doc_id", "simhash", F.col("p.piece"), F.col("p.piece_val"))
    l = pieces.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "piece", "piece_val")
    r = pieces.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "piece", "piece_val")
    cand = (
        l.join(r, ["piece", "piece_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_cosine_neardup(
    emb: DataFrame, threshold: float = 0.95, block_col: str = "label"
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold, blocked by ``block_col``
    (the IVF-style bucket: at 10^9 vectors the block comes from a coarse
    quantizer; here the fixture's label column). All-JVM: zip_with dot
    product inside codegen, no Python."""
    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), F.col(block_col).alias("blk"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), F.col(block_col).alias("blk"))
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (norm(F.col("ea")) * norm(F.col("eb"))), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
