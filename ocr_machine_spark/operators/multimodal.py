"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's raster stage (pdf2image renders, word-crop tensors,
``training_strikethrough/processing_scripts/create_bbox_chunked.py:7-26``,
64×365 grayscale tensors at ``model_training_pipeline.py:18-45``) generalizes
here to lake-native media handling: one row per asset, ``payload: binary``,
typed ``meta`` struct, and every transform an Arrow-batched ``mapInPandas``.

The actual codecs (PIL/libav) are NOT in this container, so the decode step is
STUBBED (clearly marked): ``decode_media`` produces a deterministic fake
feature map derived from the payload bytes when no codec is importable, and
raises ``NotImplementedError`` when ``strict=True``. Everything Spark-side —
schemas, batch shapes, partitioning, UDF signatures, determinism — is real and
tested; swapping in a real codec changes only the marked inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 32

FEATURES_SCHEMA = f"media_id long, kind string, ok boolean, features array<float>, n_bytes long"

FRAMES_SCHEMA = "media_id long, frame_idx int, offset_ms int"


def _codec_available() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from payload bytes.

    Stands in for decode→resize→embed. sha256-seeded so re-runs and
    partitionings are byte-identical (the engine's determinism contract)."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def generate_media(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes; metadata typed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 5)
                meta = {
                    "width": 64 + (i % 8) * 16 if kind == "image" else None,
                    "height": 64 + (i % 4) * 16 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 24 * (1 + i % 10) if kind == "video" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """payload → fixed-dim feature vector per asset (Arrow-batched).

    ``strict=True`` demands a real codec and raises ``NotImplementedError``
    in this container — the clearly-marked stub boundary."""
    has_codec = _codec_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
            ):
                if payload is None:
                    rows.append((mid, kind, False, None, 0))
                    continue
                if strict and not has_codec:
                    raise NotImplementedError(
                        "real media decode requires PIL/libav (not in this container); "
                        "use strict=False for the deterministic stub"
                    )
                feats = _fake_decode_features(bytes(payload))
                rows.append((mid, kind, True, feats.tolist(), len(payload)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "ok", "features", "n_bytes"])

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>, "
    "resized boolean"
)


def resize_images(media: DataFrame, *, max_side: int = 64, strict: bool = False) -> DataFrame:
    """image rows → bounded-size variants: metadata is recomputed exactly
    (aspect-preserving clamp to ``max_side``); the pixel resample itself is
    the stubbed codec step (PIL absent — ``strict=True`` raises at the same
    marked boundary as ``decode_media``; the stub passes the payload through
    with a deterministic marker byte so tests can assert the transform ran).
    Arrow-batched ``mapInPandas``; the batch shape, schema and partitioning
    are the real production plumbing — swapping in PIL changes only the
    marked inner function. Raster-stage analogue:
    ``training_strikethrough/processing_scripts/create_bbox_chunked.py:7-26``
    (word-crop resamples to fixed tensors)."""
    has_codec = _codec_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist(), pdf["meta"].tolist()
            ):
                w = meta.get("width") if isinstance(meta, dict) else meta["width"]
                h = meta.get("height") if isinstance(meta, dict) else meta["height"]
                if w is None or h is None or payload is None:
                    rows.append((mid, payload, meta, False))
                    continue
                scale = min(max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                if (nw, nh) == (w, h):
                    rows.append((mid, payload, meta, False))
                    continue
                if strict and not has_codec:
                    raise NotImplementedError(
                        "real image resample requires PIL (not in this container); "
                        "use strict=False for the deterministic stub"
                    )
                # STUB resample: metadata math is real; pixels are passthrough
                # + marker byte (deterministic)
                new_meta = dict(meta)
                new_meta["width"], new_meta["height"] = nw, nh
                rows.append((mid, bytes(payload) + b"\x00", new_meta, True))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta", "resized"])

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload", "meta")
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """video → deterministic frame-sample plan (frame_idx, offset_ms).

    Pure column expressions over the typed metadata — no decode needed to
    PLAN the sampling; the decode of chosen frames is the stubbed step."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n_frames")
    )
    idx = F.explode(F.sequence(F.lit(0), ((F.col("n_frames") - 1) / every_n).cast("int"))).alias("k")
    return (
        vids.select("media_id", "n_frames", idx)
        .select(
            "media_id",
            (F.col("k") * every_n).cast("int").alias("frame_idx"),
            (F.col("k") * every_n * 1000 / 24).cast("int").alias("offset_ms"),
        )
    )
