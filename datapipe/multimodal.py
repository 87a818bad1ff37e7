"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The actual codec step is STUBBED (no
image/audio libraries in this container): `decode_image(real=True)`
raises NotImplementedError, while the default deterministic fake decoder
makes the Spark-side plumbing (schema, partitioning, UDF signature,
Arrow batch shape) real and testable end-to-end.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ])),
])


def synth_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fabricate deterministic binary payloads from a text corpus (the
    sandbox stand-in for real media files): payload = UTF-8 bytes,
    media_type cycles by doc_id, metadata derived from payload length."""
    payload = F.encode(F.col(text_col), "UTF-8")
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                      (F.col("doc_id") % 3 + 1).cast("int"))
    n = F.length(payload)
    meta = F.struct((n % 640 + 1).cast("int").alias("width"),
                    (n % 480 + 1).cast("int").alias("height"),
                    F.lit(16000).alias("sample_rate"),
                    (n % 30 + 1).cast("int").alias("n_frames"))
    return df.select("doc_id", mt.alias("media_type"),
                     payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake pixel decode: sha256-seeded byte tiling."""
    seed = hashlib.sha256(payload).digest()
    base = np.frombuffer(seed, dtype=np.uint8)
    need = w * h * 3
    return np.resize(base, need).reshape(h, w, 3)


def decode_image(payload: bytes, w: int, h: int, real: bool = False
                 ) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. ``real=True`` would use an
    actual codec (PIL/libjpeg) — STUB: not available in this container."""
    if real:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "plug in PIL/torchvision here on a full cluster")
    return _fake_decode(payload, w, h)


FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("mean_pixel", T.DoubleType()),
    T.StructField("feat", T.ArrayType(T.FloatType())),
])


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media rows: decode (fake),
    mean pixel, an 8-dim channel-histogram feature, plus exact byte
    stats. One mapInPandas pass; batch shape = (rows, payload bytes),
    no per-row Python beyond the decode call itself."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                meta = r.meta
                w = int(meta["width"]) if meta is not None else 8
                h = int(meta["height"]) if meta is not None else 8
                px = decode_image(payload, max(w, 1), max(h, 1))
                hist = np.bincount(px.ravel() >> 5, minlength=feat_dim
                                   ).astype(np.float64)
                hist = hist / hist.sum()
                rows.append({
                    "doc_id": r.doc_id,
                    "media_type": r.media_type,
                    "n_bytes": len(payload),
                    "content_hash": hashlib.md5(payload).hexdigest(),
                    "mean_pixel": float(px.mean()),
                    "feat": hist.astype(np.float32),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32
                  ) -> DataFrame:
    """Resize plumbing: decode (fake) → nearest-neighbor resample →
    re-encode as raw bytes. Demonstrates the binary→binary UDF shape."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                meta = r.meta
                w = max(int(meta["width"]), 1)
                h = max(int(meta["height"]), 1)
                px = decode_image(bytes(r.payload), w, h)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = px[yi][:, xi]
                rows.append({"doc_id": r.doc_id,
                             "payload": small.tobytes(),
                             "width": out_w, "height": out_h})
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return media.where(F.col("media_type") == "image").mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emit one row per sampled
    frame index (explode-style fan-out driven by metadata, decode
    stubbed)."""
    v = media.where(F.col("media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return (v.select("doc_id", F.explode(idx).alias("frame_idx"),
                     F.length("payload").alias("n_bytes"))
            .select("doc_id", "frame_idx", "n_bytes"))
