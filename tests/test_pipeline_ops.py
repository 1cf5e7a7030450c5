"""Training-data pipeline operators: dedup sketches, similarity, multimodal.
The oracle-paired ops are covered by tools/check_oracle.py + the driver;
these tests cover the rows-only sketch ops' semantic guarantees."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawling_infrastructure_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from crawling_infrastructure_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    fake_feature,
    frame_sample_plan,
    sniff_format,
)
from crawling_infrastructure_spark.operators.similarity import (
    cosine_topk_blocked,
    cosine_topk_bruteforce,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra token"),  # near dup of 0
        (3, "completely different words about spark window aggregation plans"),
        (4, "completely different words about spark window aggregation plan"),  # near dup of 3
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    rows = {r["keeper_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert rows[0] == 2  # docs 0 and 1 identical
    assert rows[2] == 1


def test_ngram_jaccard_finds_neardups(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 3, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert (3, 4) in pairs
    assert (0, 3) not in pairs


def test_minhash_lsh_superset_of_high_jaccard(docs):
    got = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # identical docs always collide in every band; verified output is exact
    assert (0, 1) in got
    for a, b in got:
        assert a < b


def test_simhash_identical_docs_same_fp(docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_neardup_pairs(docs, 3).collect()}
    assert pairs[(0, 1)] == 0


def test_simhash_deterministic_across_runs(docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert a == b


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = rng.normal(size=8)
        v = (v / np.linalg.norm(v)).astype(float).tolist()
        rows.append((i, v, i % 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_bruteforce_topk_matches_numpy(vectors):
    got = cosine_topk_bruteforce(vectors.filter(F.col("vec_id") < 3), vectors, k=3).collect()
    pdf = vectors.toPandas().set_index("vec_id")
    M = np.stack(pdf["embedding"].to_numpy())
    for q in range(3):
        cos = (M @ M[q]) / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[q]))
        cos[q] = -2
        order = np.argsort([(-round(c, 4), i) for i, c in enumerate(cos)], axis=0)
        want_top = sorted(range(len(cos)), key=lambda i: (-round(cos[i], 4), i))[:3]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert mine == want_top


def test_blocked_topk_subset_of_block(vectors):
    got = cosine_topk_blocked(vectors.filter(F.col("vec_id") < 4), vectors, k=3).collect()
    for r in got:
        assert r["query_id"] % 4 == r["neighbor_id"] % 4  # same label block


def test_media_features_plumbing(spark):
    rows = [
        (0, b"\xff\xd8rest-of-jpeg"),
        (1, b"\x89PNG\r\n\x1a\nrest"),
        (2, b"RIFFxxxxWAVE"),
        (3, b"plain bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert out[0]["format"] == "jpeg" and out[1]["format"] == "png"
    assert out[2]["format"] == "riff" and out[3]["format"] == "unknown"
    assert out[4]["format"] == "empty" and out[4]["n_bytes"] == 0
    assert len(out[0]["feature"]) == 8
    # deterministic fake feature
    assert out[3]["feature"] == [pytest.approx(x) for x in fake_feature(b"plain bytes").tolist()]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8...")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 25), (2, 3), (3, 0)], "media_id long, n_frames int")
    rows = frame_sample_plan(df, every_nth=10).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert got[1] == [0, 10, 20]
    assert got[2] == [0]
    assert got[3] == [0]


def test_sniff_format_unit():
    assert sniff_format(b"") == "empty"
    assert sniff_format(b"\xff\xd8\xff") == "jpeg"


def test_resize_media_plumbing(spark):
    """Resize leg: mapInPandas consumes AND emits binary columns with a
    declared schema; pixel buffers are exactly width*height, deterministic
    across runs, and nearest-neighbor indices stay in-bounds for payloads
    smaller and larger than the target."""
    from crawling_infrastructure_spark.operators.multimodal import (
        fake_decode_image,
        resize_media,
    )

    rows = [
        (1, b"\x01\x02\x03"),                 # tiny payload, tiled up
        (2, bytes(range(256)) * 40),          # larger than target
        (3, None),                            # null payload -> zeros
    ]
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    out = {r.media_id: r for r in resize_media(df, 16, 8).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.width, r.height) == (16, 8)
        assert len(bytes(r.pixels)) == 16 * 8
    assert bytes(out[3].pixels) == bytes(16 * 8)
    # deterministic replay
    out2 = {r.media_id: bytes(r.pixels) for r in resize_media(df, 16, 8).collect()}
    assert out2 == {k: bytes(v.pixels) for k, v in out.items()}
    # the fake decoder honors the (height, width) contract a real one has
    img = fake_decode_image(b"\x09", 5, 4)
    assert img.shape == (4, 5) and img.dtype.name == "uint8"
