"""Multimodal binary-column operators (SURVEY §7 Phase 3 north-star
extension): image/audio/video as opaque `binary` columns with typed
metadata, processed through Arrow-batched mapInPandas.

The container has no media libraries, so the DECODE step has two paths
(both clearly marked):
  - ``decode_media(..., stub=False)`` REALLY decodes the formats
    struct+numpy can handle alone — BMP (24bpp uncompressed) and WAV
    (16-bit PCM), dispatched per blob by magic bytes — and raises
    NotImplementedError naming the missing dependency (pillow/av/
    soundfile) for compressed formats;
  - ``decode_media(..., stub=True)`` (default) derives a DETERMINISTIC fake
    decode from the blob's md5 digest, so the Spark-side plumbing — schema,
    batch shape, partitioning, downstream joins — is testable on arbitrary
    bytes.

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




# --- real decoders for container-supported formats ---------------------------
#
# Two uncompressed formats decode with stdlib struct + numpy alone — no
# pillow/av/soundfile needed — so `stub=False` is REAL for them:
#   - BMP (Windows bitmap, BITMAPINFOHEADER, 24bpp uncompressed)
#   - WAV (RIFF PCM, 16-bit)
# Compressed formats (PNG/JPEG/MP3/MP4...) still raise loudly, naming the
# missing dependency. Dispatch is by magic bytes, per blob.


def _decode_bmp(blob: bytes) -> dict:
    """Pure-numpy BMP decode: 24bpp uncompressed BITMAPINFOHEADER only.
    Handles 4-byte row padding and bottom-up row order (positive height)."""
    import struct

    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    (pixel_off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP decode supports 24bpp uncompressed only (got bpp={bpp}, "
            f"compression={compression}) — compressed bitmaps need pillow"
        )
    flip = height > 0
    h = abs(height)
    row_size = ((24 * width + 31) // 32) * 4
    px = np.frombuffer(blob, dtype=np.uint8, count=h * row_size, offset=pixel_off)
    px = px.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    if flip:
        px = px[::-1]
    bgr = px.astype(np.float64)
    # features: per-channel means (RGB order) + luminance mean, /255
    means = bgr.mean(axis=(0, 1))  # B, G, R
    lum = (0.299 * bgr[..., 2] + 0.587 * bgr[..., 1] + 0.114 * bgr[..., 0]).mean()
    return {
        "width": int(width),
        "height": int(h),
        "channels": 3,
        "features": [means[2] / 255.0, means[1] / 255.0, means[0] / 255.0, lum / 255.0],
    }


def _decode_wav(blob: bytes) -> dict:
    """Pure-numpy RIFF/WAVE decode: PCM (format 1), 16-bit samples.
    Walks chunks (even-padded), tolerating extras like LIST before data."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV decode supports 16-bit PCM only (got format={audio_format}, "
            f"bits={bits}) — compressed audio needs soundfile/av"
        )
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // channels
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return {
        "width": n_frames,  # frames along the time axis
        "height": 1,
        "channels": int(channels),
        "features": [float(sample_rate), n_frames / float(sample_rate), rms, peak],
    }


def _real_decode(blob: bytes) -> dict:
    """Magic-byte dispatch to a real decoder; loud failure for formats
    that genuinely need a media library."""
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _decode_wav(blob)
    head = bytes(blob[:4])
    raise NotImplementedError(
        f"no container-supported decoder for magic {head!r}: BMP(24bpp) and "
        "WAV(PCM16) decode with struct+numpy; PNG/JPEG/MP3/MP4 require "
        "pillow/av/soundfile, not present in this container"
    )


def decode_media(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", stub: bool = True
) -> DataFrame:
    """Decode + feature-extract: (id, width, height, channels,
    features array<double>). mapInPandas — one python pass per partition,
    Arrow both ways, blobs never shuffled (only the small decoded rows).

    ``stub=False`` performs a REAL decode for the formats the container
    can support with struct+numpy alone — BMP (24bpp uncompressed) and
    WAV (16-bit PCM) — dispatched per blob by magic bytes; any other
    format raises NotImplementedError naming the missing media library.
    ``stub=True`` (default) keeps the md5-derived deterministic fake for
    engine-portable plumbing tests on arbitrary bytes."""
    decode = _fake_decode if stub else _real_decode

    schema = f"{id_col} bigint, width int, height int, channels int, features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(b)) for b in pdf[blob_col]]
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
