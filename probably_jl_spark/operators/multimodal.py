"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decoded / feature-extracted inside ``mapInPandas``.

The decode step itself is a clearly-marked STUB (this container ships no
image/audio libraries): ``decoder=None`` raises NotImplementedError, and
``deterministic_fake_decoder`` produces schema-correct fake features
derived from xxhash64 of the payload, so the Spark-side plumbing —
binary schema, Arrow batch shapes, partitioning, UDF signatures — is real
and fully tested. Swapping in a real decoder (PIL/librosa/ffmpeg) is a
one-argument change with no plan changes.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta string"
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "channels int, duration_ms int, feature array<float>"
)

FEATURE_DIM = 16


def as_media_table(df: DataFrame, id_col: str, payload_col, kind: str = "image") -> DataFrame:
    """Project any table into the canonical media shape (binary payload +
    metadata). Used to exercise the pipeline with synthetic payloads."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("payload"),
        F.to_json(F.struct(F.lit(kind).alias("kind"))).alias("meta"),
    )


def deterministic_fake_decoder(kind: str, payload: bytes) -> dict:
    """STUB decoder: schema-correct, deterministic pseudo-features derived
    from the payload hash. NOT a real decode — stands in for PIL/librosa/
    ffmpeg which are absent in this container."""
    from ..sketches.hashing import xxhash64_bytes

    h = xxhash64_bytes(payload or b"")
    rs = np.random.RandomState(h % (2**31))
    out = {
        "n_bytes": len(payload or b""),
        "width": int(64 + h % 1024) if kind == "image" else 0,
        "height": int(64 + (h >> 10) % 1024) if kind == "image" else 0,
        "channels": 3 if kind == "image" else (1 if kind == "audio" else 0),
        "duration_ms": int(h % 600000) if kind in ("audio", "video") else 0,
        "feature": rs.normal(size=FEATURE_DIM).astype(np.float32),
    }
    return out


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[str, bytes], dict] | None = deterministic_fake_decoder,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over media rows. ``decoder=None``
    raises NotImplementedError (real decode unavailable here); pass
    ``deterministic_fake_decoder`` (default) for plumbing tests or a real
    decoder callable in production."""
    if decoder is None:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass deterministic_fake_decoder or a real "
            "decoder callable"
        )

    def part(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                feats = decoder(kind, bytes(payload) if payload is not None else b"")
                feats["media_id"] = int(mid)
                feats["kind"] = kind
                rows.append(feats)
            out = pd.DataFrame(rows)
            out["feature"] = out["feature"].map(lambda a: a.tolist())
            yield out[
                ["media_id", "kind", "n_bytes", "width", "height", "channels", "duration_ms", "feature"]
            ]

    return df.mapInPandas(part, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_id, frame_idx, ts_ms) from the decoded duration — the decode of
    the frame itself is the stubbed step. Demonstrates the explode-based
    fan-out shape a real sampler uses."""
    feats = extract_media_features(df)
    return feats.filter(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx", "_i"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
