"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Spark-side plumbing is REAL (schemas, Arrow batching, mapInPandas
signatures, partitioning). The decode kernel dispatches per payload:

* **PPM (P6) / PGM (P5)** — REAL decode, implemented here in pure numpy
  (header parse incl. comments + frombuffer pixel read; see
  ``decode_ppm``/``encode_ppm``). The synthetic media fixture emits
  valid P6 payloads for image rows, so the image pipeline exercises a
  genuine binary→pixels decode end to end with no external codec.
* **JPEG/PNG/etc.** — gated behind an import-try; with Pillow absent in
  this container these raise ``NotImplementedError``.
* **fake=True** — deterministic byte-fold fallback for payloads that are
  not encoded media at all (the audio/video stand-ins), a pure function
  of the payload bytes so tests and oracle runs are reproducible.

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
    "encode_ppm",
    "decode_ppm",
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
    """Deterministic media fixture derived from the documents table.

    Image rows carry REAL binary PPM (P6) payloads (pixels tiled from the
    text bytes — a pure function of the row, encoded with ``encode_ppm``),
    so the decode path is a genuine format parse; audio/video rows keep
    raw text bytes as opaque stand-in payloads. No external data."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _ppm_payload(text: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        out = []
        for t, w, h in zip(text, width, height):
            raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            need = int(w) * int(h) * 3
            reps = (need + len(raw) - 1) // max(1, len(raw))
            px = np.tile(raw, reps)[:need].reshape(int(h), int(w), 3)
            out.append(encode_ppm(px))
        return pd.Series(out)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n_rows)
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", _ppm_payload(F.col("text"), w, h))
        .otherwise(F.col("text").cast("binary"))
        .alias("payload"),
        F.struct(
            (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# real PPM/PGM codec (pure numpy — netpbm binary formats, no external libs)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 (or HxW) uint8 → binary PPM (P6) / PGM (P5) bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected HxWx3 or HxW uint8, got shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + img.tobytes()


def _ppm_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace/comment-separated integer tokens from ``buf``
    beginning at ``start``; returns (values, offset past the single
    whitespace byte that terminates the last token) per the netpbm spec."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(buf) and (buf[i : i + 1].isspace() or buf[i] == ord("#")):
            if buf[i] == ord("#"):  # comment runs to end of line
                while i < len(buf) and buf[i] not in (10, 13):
                    i += 1
            else:
                i += 1
        j = i
        while j < len(buf) and buf[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8, or PGM (P5) → HxWx3 (gray
    replicated) — a REAL image decode, spec-compliant incl. '#' comments."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    (w, h, maxval), off = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise NotImplementedError("only 8-bit netpbm supported")
    need = w * h * channels
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    img = px.reshape(h, w, channels)
    return np.repeat(img, 3, axis=2) if channels == 1 else img


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile the payload bytes into HxWx3."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    reps = (need + len(arr) - 1) // max(1, len(arr))
    return np.tile(arr, reps)[:need].reshape(height, width, 3)


def _decode(payload: bytes, width: int, height: int, fake: bool) -> np.ndarray:
    if payload[:2] in (b"P6", b"P5"):  # real decode, no codec lib needed
        return decode_ppm(payload)
    if fake:
        return _decode_fake(payload, width, height)
    if not _HAVE_PIL:  # JPEG/PNG/... require an image codec
        raise NotImplementedError(
            "decoding non-netpbm formats requires Pillow; pass fake=True "
            "for the deterministic fallback decoder"
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
