"""Multimodal binary-column operators (SURVEY §7 Phase 3 north-star
extension): image/audio/video as opaque `binary` columns with typed
metadata, processed through Arrow-batched mapInPandas.

The container has no media libraries, so the DECODE step is stubbed two
ways (both clearly marked):
  - ``decode_media(..., stub=False)`` raises NotImplementedError naming the
    missing dependency — the integration point for pillow/av/soundfile;
  - ``decode_media(..., stub=True)`` (default) derives a DETERMINISTIC fake
    decode from the blob's md5 digest, so the Spark-side plumbing — schema,
    batch shape, partitioning, downstream joins — is real and testable.

At 100 TB the blobs dominate storage: operators never shuffle blob bytes
unless the output needs them (feature extraction shuffles features, frame
sampling keeps blobs within the map task)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def with_blob(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Attach the multimodal column pattern to a table: an opaque binary
    payload plus typed metadata (mime, byte length). On real data the blob
    column arrives from ingestion; here it is the utf-8 payload of text."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn("mime", F.lit(mime)).withColumn(
        "n_bytes", F.octet_length(blob)
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real media decode: md5-derived 'pixel'
    stats + a FEATURE_DIM-float embedding in [0,1]. Same bytes -> same
    output, any engine."""
    digest = hashlib.md5(blob).digest()
    return {
        "width": 16 + digest[0],
        "height": 16 + digest[1],
        "channels": 1 + (digest[2] % 4),
        "features": [b / 255.0 for b in digest],
    }


def decode_media(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", stub: bool = True
) -> DataFrame:
    """Decode + feature-extract: (id, width, height, channels,
    features array<double>). mapInPandas — one python pass per partition,
    Arrow both ways, blobs never shuffled (only the small decoded rows)."""
    if not stub:
        raise NotImplementedError(
            "real media decode requires pillow/av/soundfile, not present in "
            "this container; call with stub=True for the deterministic fake"
        )

    schema = f"{id_col} bigint, width int, height int, channels int, features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "channels": [r["channels"] for r in rows],
                    "features": [r["features"] for r in rows],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def resize_meta(
    df: DataFrame, max_side: int, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Resize planning (the metadata half of a real resize): computes target
    dimensions preserving aspect ratio, capped at max_side. The pixel
    transform itself belongs in the same mapInPandas pass once a decoder is
    present."""
    decoded = decode_media(df, id_col=id_col, blob_col=blob_col)
    scale = F.least(
        F.lit(1.0), max_side / F.greatest(F.col("width"), F.col("height")).cast("double")
    )
    return decoded.select(
        id_col,
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Frame sampling for video-like blobs: emits (id, frame_idx,
    frame_blob) with n_frames evenly-spaced slices per blob. The explode
    happens INSIDE the map task (one python pass, no Generate re-eval, no
    blob shuffle before slicing)."""
    schema = f"{id_col} bigint, frame_idx int, frame_blob binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                step = max(1, len(blob) // n_frames)
                for k in range(n_frames):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(blob[k * step : (k + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_blob": frames})

    return df.select(id_col, blob_col).mapInPandas(gen, schema)
