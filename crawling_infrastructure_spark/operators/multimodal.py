"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed with mapInPandas in Arrow batches.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, or NotImplementedError for the real-codec
path) while everything Spark-side — schema, batch shape, partition sizing —
is real and tested. Swapping the stub for PIL/torchaudio changes ONE
function, not the plan.

Scale note: binary payloads ride the Arrow transfer; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so batch_bytes =
records x avg_payload stays ~10-100 MB per Python worker."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_media(payload: bytes) -> np.ndarray:
    """REAL decode path — requires codec libs absent from this container."""
    raise NotImplementedError(
        "media decode requires PIL/libav; use fake_feature() in this sandbox"
    )


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram moments. Same shape,
    dtype, and batch mechanics as a real embedding."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def sniff_format(payload: bytes) -> str:
    if not payload:
        return "empty"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:4] == b"RIFF":
        return "riff"
    return "unknown"


def extract_media_features(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload",
    use_real_decoder: bool = False,
) -> DataFrame:
    """(id, binary payload) -> (id, n_bytes, format, feature[dim]).
    mapInPandas so one Arrow batch is one Python call — never per-row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fe = decode_media if use_real_decoder else fake_feature
        for pdf in batches:
            ids, sizes, fmts, feats = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                ids.append(int(mid))
                sizes.append(len(b))
                fmts.append(sniff_format(b))
                feats.append(fe(b).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": sizes, "format": fmts, "feature": feats}
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) metadata to
    (media_id, frame_idx) rows JVM-side with sequence+explode; the decode of
    each sampled frame is the stubbed step."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth))
        ).alias("frame_idx"),
    )
