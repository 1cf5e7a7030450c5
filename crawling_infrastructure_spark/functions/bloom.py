"""Sharded Bloom filter for the URL-seen set (north_rule).

Role in the dedup pipeline (operators/seen.py): the bloom is a *pre-filter*
with zero false negatives — outlinks it rejects are **definitely new** and
skip the exact anti-join entirely; only bloom-positives (seen + fpp-rate
false positives) go through the exact check. Semantics stay exact; the
expensive join's probe side shrinks by ~(1 - fpp) for genuinely-new URLs.

Scale design (SURVEY.md §7.3 risk 3): one bloom per ``url_hash % n_buckets``
shard, stored as binary blobs in the ``seen`` table. At 10^10 URLs and
fpp=1e-3, total ~17 GB split across shards — each shard's blob stays
executor-sized; shards are built/updated independently with applyInPandas.
Vectorized numpy throughout; hashing = double hashing h1 + i*h2 over the
already-computed xxhash64 url_hash (standard Kirsch-Mitzenmacher).
"""

from __future__ import annotations

import math

import numpy as np

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 — decorrelates h2 from h1."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h = (h * _M1) & _U64
    h ^= h >> np.uint64(33)
    h = (h * _M2) & _U64
    h ^= h >> np.uint64(33)
    return h


class Bloom:
    """Fixed-size bitset bloom over uint64 keys, numpy-vectorized."""

    HEADER = 16  # n_bits (8) + n_hashes (8), little-endian

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        n_words = (self.n_bits + 63) // 64
        self.bits = bits if bits is not None else np.zeros(n_words, dtype=np.uint64)

    @classmethod
    def sized(cls, n_expected: int, fpp: float) -> "Bloom":
        n_expected = max(64, n_expected)
        m = int(-n_expected * math.log(fpp) / (math.log(2) ** 2))
        m = max(512, (m + 63) // 64 * 64)
        k = max(1, round(m / n_expected * math.log(2)))
        return cls(m, min(k, 16))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = _mix(h1) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & _U64) % np.uint64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """bool array; True = maybe seen, False = definitely new."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = self.bits[(pos >> np.uint64(6))]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def serialize(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype="<u8").tobytes()
        return head + self.bits.astype("<u8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "Bloom":
        n_bits, n_hashes = np.frombuffer(blob[: cls.HEADER], dtype="<u8")
        bits = np.frombuffer(blob[cls.HEADER :], dtype="<u8").astype(np.uint64)
        return cls(int(n_bits), int(n_hashes), bits.copy())

    def union(self, other: "Bloom") -> "Bloom":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        return Bloom(self.n_bits, self.n_hashes, self.bits | other.bits)
