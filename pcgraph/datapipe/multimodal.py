"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, partition sizing, Arrow batch
shape, mapInPandas signatures — while the codec step is stubbed behind
``DECODERS`` (the image/audio libraries are not in this container; a
deployment drops in PIL/torchaudio/ffmpeg without touching the plan).
A deterministic fake decoder exercises the full path in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<double>"


def real_decoder(kind: str, payload: bytes) -> np.ndarray:
    """Placeholder for the real codec (PIL / torchaudio / ffmpeg).

    Not available in this environment — deployments override
    ``DECODERS[kind]``; the Spark plan (partitioning, Arrow batching,
    schema) is identical either way.
    """
    raise NotImplementedError(
        f"no codec for {kind!r} in this environment; register one in DECODERS"
    )


def fake_decoder(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 8 doubles derived from sha256(payload).
    Lets the full distributed path run (and be asserted on) without
    media libraries."""
    digest = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1) / 255.0


DECODERS: dict[str, Callable[[str, bytes], np.ndarray]] = {
    "image": fake_decoder,
    "audio": fake_decoder,
    "video": fake_decoder,
}


def media_metadata(media: DataFrame) -> DataFrame:
    """Cheap metadata pass — never decodes: sizes, hashes, per-kind stats
    (all JVM-side)."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
        "width",
        "height",
    )


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, vectorized
    within batch).  Binary payloads dominate memory: callers should
    repartition so a task's batch fits the executor (payload_bytes *
    batch_rows << executor memory); partition count survives into the
    output for downstream joins."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..workerenv import optimize_worker

        optimize_worker()
        for pdf in batches:
            feats = [
                DECODERS[k](k, p).tolist()
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index (the
    decode itself is the stubbed codec).  Pure SQL explode — the shuffle
    cost is visible in the plan before any codec runs."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )
