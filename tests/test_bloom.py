"""Bloom filter invariants: NO false negatives (correctness of the exact
dedup pipeline depends on it), bounded false positives, stable serialization."""

import numpy as np

from crawling_infrastructure_spark.functions.bloom import Bloom


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    b = Bloom.sized(10_000, 0.001)
    keys = _keys(10_000, 1)
    b.add(keys)
    assert b.contains(keys).all()


def test_false_positive_rate_bounded():
    b = Bloom.sized(10_000, 0.001)
    b.add(_keys(10_000, 1))
    other = _keys(100_000, 2)
    fpp = b.contains(other).mean()
    assert fpp < 0.005, fpp  # 5x headroom over the 1e-3 design point


def test_serialize_roundtrip():
    b = Bloom.sized(1000, 0.01)
    keys = _keys(1000, 3)
    b.add(keys)
    b2 = Bloom.deserialize(b.serialize())
    assert b2.n_bits == b.n_bits and b2.n_hashes == b.n_hashes
    assert b2.contains(keys).all()
    assert (b2.bits == b.bits).all()


def test_union():
    b1, b2 = Bloom.sized(1000, 0.01), Bloom.sized(1000, 0.01)
    k1, k2 = _keys(500, 4), _keys(500, 5)
    b1.add(k1)
    b2.add(k2)
    u = b1.union(b2)
    assert u.contains(k1).all() and u.contains(k2).all()


def test_empty():
    b = Bloom.sized(1000, 0.01)
    assert not b.contains(_keys(100, 6)).any()
    assert b.contains(np.array([], dtype=np.uint64)).shape == (0,)


def test_signed_hash_inputs():
    # url_hash values from Spark are signed int64 — must hash consistently
    b = Bloom.sized(100, 0.01)
    signed = np.array([-1, -2**63, 2**62], dtype=np.int64)
    b.add(signed.astype(np.uint64))
    assert b.contains(signed.astype(np.uint64)).all()
