"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are real and tested — schema, Arrow batch
shape, partition-friendly mapInPandas UDF signatures, deterministic
synthesis of binary payloads.  The actual media decode is STUBBED:
this container has no image/audio libraries, so ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a documented
deterministic fake (md5-derived dimensions, mean byte value as
"brightness") stands in so the pipeline is end-to-end testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "n_bytes long, payload_md5 string"
)


def synthesize_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads from text (stand-in for real blobs):
    payload = utf-8 bytes; metadata columns computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video")).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real impl would use PIL/libjpeg (not in this container).

    fake=True returns the documented deterministic fake: dimensions from
    the md5 of the payload, brightness from the payload length."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/pillow — not available here; "
            "pass fake=True for the deterministic test double"
        )
    digest = hashlib.md5(payload).digest()
    return {
        "width": 1 + digest[0],
        "height": 1 + digest[1],
        "brightness": float(len(payload) % 251),
    }


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: Arrow binary column in, flat typed columns out —
    exactly the plumbing a real decoder (resize / frame-sample /
    mel-spectrogram) would use; only ``decode_image`` is a stub."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p if p is not None else b"", fake=fake)
                     for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "brightness": np.round([f["brightness"] for f in feats], 6),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        extract,
        "doc_id long, media_type string, width int, height int, brightness double",
    )


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: per payload, offsets of sampled frames
    (every_n_bytes stride) — JVM expressions only, demonstrates how a
    video pipeline fans one blob out to per-frame rows."""
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1))
    return media.select(
        "doc_id", "media_type", "n_bytes",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1)
        ).alias("frame_idx"),
    ).select(
        "doc_id", "media_type", "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )
