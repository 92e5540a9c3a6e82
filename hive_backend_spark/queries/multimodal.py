"""Multimodal-column plumbing — SURVEY §7 Phase 3.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
alongside. The decode/feature-extract stages live in
``hive_backend_spark.operators.multimodal`` as mapInPandas operators (decode
stubbed — no media libs in this container); the oracle-checked queries here
exercise the Spark-side plumbing that IS portable SQL: binary
encode/length/digest handling on real columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q80_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) AS n_codepoints,
           octet_length(encode(text)) > length(text) AS multibyte
    FROM documents
    """,
)
def q80_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length vs codepoint length on the
    utf-8-encoded payload — the schema pattern for multimodal blobs
    (binary column + derived typed metadata columns)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.length(F.col("text")).alias("n_codepoints"),
        (F.octet_length(blob) > F.length(F.col("text"))).alias("multibyte"),
    )


@register(
    "q81_binary_digest_partition",
    oracle="""
    SELECT bucket, count(*) AS n_docs, round(sum(octet_length(encode(text))) / 1024.0, 4) AS kb
    FROM (
      SELECT text, CAST(substring(md5(text), 1, 2) AS VARCHAR) AS bucket
      FROM documents
    )
    GROUP BY bucket
    """,
)
def q81_binary_digest_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed bucketing: digest-prefix buckets with per-bucket
    byte budgets — the layout planner for sharding 100 TB of blobs into
    balanced partitions (256 buckets from 2 hex chars)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("text")), 1, 2)
    return (
        docs.select("text", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(F.octet_length(F.encode(F.col("text"), "UTF-8"))) / 1024.0, 4).alias("kb"),
        )
    )


@register(
    "q83_decode_features",
    oracle="""
    SELECT doc_id,
           16 + (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS width,
           16 + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS height,
           list_transform(range(0, 16), j ->
             ((strpos('0123456789abcdef', substr(md5(text), 2*j + 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(text), 2*j + 2, 1)) - 1)) / 255.0) AS features
    FROM documents
    """,
)
def q83_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + feature extraction through the mapInPandas
    operator (operators/multimodal.py decode_media): blob -> (width, height,
    16-dim feature vector). The stub decode derives everything from the
    blob's md5 digest, so the oracle replays the identical bytes from SQL —
    proving the full plumbing (binary column in, Arrow batches through
    python, typed struct out) without a media library in the container."""
    from ..operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    decoded = MM.decode_media(MM.with_blob(docs))
    return decoded.select("doc_id", "width", "height", "features")


@register(
    "q117_frame_sample",
    oracle="""
    SELECT doc_id, f.k AS frame_idx,
           md5(substr(text, CAST(f.k * greatest(len(text) // 4, 1) + 1 AS INT),
                      CAST(greatest(len(text) // 4, 1) AS INT))) AS frame_md5,
           len(substr(text, CAST(f.k * greatest(len(text) // 4, 1) + 1 AS INT),
                      CAST(greatest(len(text) // 4, 1) AS INT))) AS frame_len
    FROM documents, (SELECT unnest(range(0, 4)) AS k) f
    """,
)
def q117_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas operator
    (operators/multimodal.sample_frames): each video-like blob yields 4
    evenly-spaced byte slices, exploded INSIDE the map task (no Generate
    over a UDF column, no blob shuffle). The oracle replays the identical
    slicing with substr over the (ASCII) payload — byte offsets equal char
    offsets here, so each emitted frame's md5 and length are value-checked
    engine-to-engine. The frame table is the input to any downstream
    per-frame decode/embed stage."""
    from ..operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    frames = MM.sample_frames(MM.with_blob(docs), n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5("frame_blob").alias("frame_md5"),
        F.octet_length("frame_blob").alias("frame_len"),
    )
