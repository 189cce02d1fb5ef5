"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The image/audio codec libraries are NOT in this
container, so the codec call itself is stubbed (deterministic fake or
NotImplementedError per task instructions) — everything Spark-side is
real and tested: schemas, column pruning (payload never read unless
the UDF needs it), batch shapes, partitioning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("media_id bigint, kind string, feat_dim int, "
                  "features array<float>, decode_status string")

_FEAT_DIM = 32


def real_decode(payload: bytes, kind: str):  # pragma: no cover
    """The codec seam. On a real cluster this dispatches to
    PIL/ffmpeg/torchaudio; those libs are absent in this container."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use fake_decode for deterministic plumbing tests")


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: features derived from a sha256 of the
    payload, so tests exercise real Arrow batches end-to-end with
    reproducible outputs."""
    if payload is None:
        payload = b""
    h = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(_FEAT_DIM).astype(np.float32)


def extract_media_features(media: DataFrame,
                           use_fake: bool = True) -> DataFrame:
    """media(MEDIA_SCHEMA) -> per-item feature vectors. Narrow
    mapInPandas: zero shuffles; the binary column flows scan->UDF
    only."""
    decode = fake_decode if use_fake else real_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append([float(x) for x in decode(payload, kind)])
                    status.append("ok")
                except NotImplementedError:
                    feats.append([0.0] * _FEAT_DIM)
                    status.append("stubbed")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat_dim": _FEAT_DIM,
                "features": feats,
                "decode_status": status,
            })

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(fn, FEATURE_SCHEMA))


RESIZED_SCHEMA = ("media_id bigint, kind string, payload binary, "
                  "width int, height int, resize_status string")


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic resize stand-in: output bytes derived from the
    payload digest + target dims, length proportional to the target
    area — reproducible batch shapes without a codec."""
    if payload is None:
        payload = b""
    seed = hashlib.sha256(
        bytes(payload) + f"{w}x{h}".encode()).digest()
    size = max(16, (w * h) // 256)
    reps = size // len(seed) + 1
    return (seed * reps)[:size]


def real_resize(payload: bytes, kind: str, w: int,
                h: int) -> bytes:  # pragma: no cover
    """The resize codec seam (PIL for images, ffmpeg scale for
    video); absent in this container."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use fake_resize for deterministic plumbing tests")


def resize_media(media: DataFrame, target_w: int = 224,
                 target_h: int = 224,
                 use_fake: bool = True) -> DataFrame:
    """Image/video resize stage: payload -> resized payload with
    updated metadata. Narrow mapInPandas (payload flows scan->UDF
    only, no shuffle); the codec call sits behind the same
    fake/NotImplementedError seam as feature extraction and is
    dispatched with each row's own kind."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, status = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    if use_fake:
                        out.append(fake_resize(payload, target_w,
                                               target_h))
                        status.append("ok")
                    else:
                        out.append(real_resize(payload, kind,
                                               target_w, target_h))
                        status.append("decoded")
                except NotImplementedError:
                    out.append(b"")
                    status.append("stubbed")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": out,
                "width": target_w,
                "height": target_h,
                "resize_status": status,
            })

    return (media.filter(F.col("kind").isin("image", "video"))
            .select("media_id", "kind", "payload")
            .mapInPandas(fn, RESIZED_SCHEMA))


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index, derived from metadata only — the payload column is never
    touched, so Catalyst prunes it from the scan entirely."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id", "n_frames")
            .withColumn("frame_idx",
                        F.explode(F.sequence(
                            F.lit(0),
                            F.greatest(F.col("n_frames") - 1, F.lit(0)),
                            F.lit(every_nth)))))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"))
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    kinds.alias("kind"),
                    F.encode(F.concat(F.lit("payload-"),
                                      F.col("id").cast("string")),
                             "UTF-8").alias("payload"),
                    (F.col("id") % 640 + 16).cast("int").alias("width"),
                    (F.col("id") % 480 + 16).cast("int").alias("height"),
                    (F.col("id") % 100 + 1).cast("int").alias("n_frames")))
