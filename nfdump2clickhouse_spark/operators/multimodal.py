"""Multimodal columns (SURVEY §2.11 `multimodal_binary` + driver-mandated
extensions): image/audio/video as opaque BinaryType columns with typed
metadata structs, processed by Arrow-batched pandas functions.

The decode step is STUBBED (no image/audio libraries in this container):
`mm_decode_stub` produces deterministic fake features and raises
NotImplementedError if real decoding is requested. The Spark-side
plumbing — schema, binary round-trip, mapInPandas batch shape — is real
and tested.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


def _with_blob(d: DataFrame) -> DataFrame:
    """documents.text → fake media blob + typed metadata struct."""
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("lang").alias("codec"),
            F.col("n_chars").cast("int").alias("n_bytes_meta"),
            (F.col("doc_id") % 4).cast("int").alias("channel"),
        ).alias("meta"),
    )


@register(
    "multimodal_binary",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           sha256(text)                     AS digest
    FROM documents
    """,
)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType column + metadata struct, round-tripped through a
    partitioned parquet write (blob pointers at rest) and read back —
    digest proves byte-exactness end-to-end."""
    blobs = _with_blob(table(spark, sf_dir, "documents"))
    out = os.path.join(tempfile.mkdtemp(prefix="mm_blob_"), "blobs")
    blobs.withColumn("bucket", (F.col("doc_id") % 8).cast("int")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "doc_id",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.sha2("content", 256).alias("digest"),
    )


@register("mm_decode_stub")  # rows-only: stubbed decode, Spark plumbing real
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 'decode' of binary media via mapInPandas (Arrow batches).

    Real decode would call PIL/libav here; this container has neither, so
    features are a deterministic fake derived from the bytes. Set
    real=True in `decode_batch` to see the guarded NotImplementedError.
    """

    def decode_batch(batches, real: bool = False):
        if real:
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "environment; wire PIL/torchaudio here on a real cluster"
            )
        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # fake 'image' dims: deterministic functions of the blob
                    "width": content.map(lambda b: 16 + len(b) % 240),
                    "height": content.map(lambda b: 16 + (len(b) * 7) % 240),
                    "mean_byte": content.map(
                        lambda b: round(sum(b) / len(b), 4) if len(b) else 0.0
                    ),
                }
            )

    blobs = _with_blob(table(spark, sf_dir, "documents"))
    return blobs.mapInPandas(
        decode_batch, "doc_id long, width int, height int, mean_byte double"
    )


@register("mm_frame_sample")  # rows-only: binary slicing demo
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a fake 'video' blob: fixed 32-byte frames,
    keep every 4th — pure Column substring arithmetic on BinaryType (the
    shape of video-frame extraction without a decoder)."""
    blobs = _with_blob(table(spark, sf_dir, "documents"))
    frame_size, stride = 32, 4
    n_frames = F.floor(F.octet_length("content") / frame_size).cast("int")
    frames = blobs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(stride))
        ).alias("frame_no"),
        "content",
    )
    return frames.select(
        "doc_id",
        "frame_no",
        F.expr(f"substring(content, frame_no * {frame_size} + 1, {frame_size})").alias(
            "frame_bytes"
        ),
    )
