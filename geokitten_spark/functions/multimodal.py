"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Spark-side plumbing is REAL (schemas, Arrow batching, mapInPandas
signatures, partitioning); the codec step is gated behind an import-try —
with Pillow/av absent in this container the decode raises
``NotImplementedError`` unless ``fake=True`` selects the deterministic
fake decoder (a pure function of the payload bytes, so tests and oracle
runs are reproducible).

Table shape (mirrors the documents table pattern):
    media(media_id LONG, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, n_frames INT, sample_rate INT>)

Operators:
* ``decode_image``      — payload → HxWx3 uint8 (fake: byte-fold pattern)
* ``image_features``    — payload → 64-dim float array (byte histogram,
                          L2-normalized) — the embedding-side input for
                          the ANN/near-dup operators
* ``resize_meta``       — pure-SQL metadata transform (no Python)
* ``frame_sample``      — video payload → every k-th frame's features
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media",
    "image_features",
    "frame_sample_features",
    "resize_meta",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

_HAVE_PIL = False
try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def synthetic_media(spark: SparkSession, sf_dir: str, n_rows: int = 200) -> DataFrame:
    """Deterministic media fixture derived from the documents table: the
    text bytes stand in for an encoded payload; metadata is a pure function
    of doc_id. No external data."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n_rows)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile the payload bytes into HxWx3."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    reps = (need + len(arr) - 1) // max(1, len(arr))
    return np.tile(arr, reps)[:need].reshape(height, width, 3)


def _decode(payload: bytes, width: int, height: int, fake: bool) -> np.ndarray:
    if fake:
        return _decode_fake(payload, width, height)
    if not _HAVE_PIL:  # real path requires an image codec
        raise NotImplementedError(
            "real image decode requires Pillow; pass fake=True for the "
            "deterministic fake decoder"
        )
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def _features_of(img: np.ndarray) -> np.ndarray:
    """64-bin byte histogram, L2-normalized — a deterministic stand-in for
    a vision embedding with the same column type (array<float>)."""
    hist, _ = np.histogram(img.reshape(-1), bins=64, range=(0, 256))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def image_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """payload → 64-dim feature vector (mapInPandas; Arrow-batched).

    Output: (media_id, kind, embedding array<float>). Real plumbing; the
    decode kernel is swappable (fake vs Pillow)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _decode(bytes(payload), meta["width"], meta["height"], fake)
                feats.append(_features_of(img).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": feats,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_features(
    media: DataFrame, *, every_k: int = 5, fake: bool = True
) -> DataFrame:
    """Video rows → one feature row per sampled frame (frame f decodes a
    byte-rotated payload — deterministic). Output one row per
    (media_id, frame_no)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, feats = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                for f in range(0, int(meta["n_frames"]), every_k):
                    rot = raw[f % max(1, len(raw)):] + raw[: f % max(1, len(raw))]
                    img = _decode(rot, meta["width"], meta["height"], fake)
                    ids.append(mid)
                    frames.append(f)
                    feats.append(_features_of(img).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frames, "embedding": feats}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)


def resize_meta(media: DataFrame, *, max_side: int = 32) -> DataFrame:
    """Pure-SQL metadata resize (aspect-preserving clamp) — no Python; the
    actual pixel resample would live in the decode kernel."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.withColumn(
        "resized_meta",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
        ),
    )
