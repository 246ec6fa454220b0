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

import numpy as np
import pandas as pd
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
    if blobs.isEmpty():
        # zero-partition writes cannot re-read (UNABLE_TO_INFER_SCHEMA,
        # r7 edge class 4; guard applied r9 per SURVEY §17.1) — the
        # cheap limit-1 probe skips the round-trip, schema-stable
        return spark.createDataFrame(
            [], "doc_id long, n_bytes bigint, digest string"
        )
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

    # NULL text → NULL blob: not decodable media — gated before the
    # Python worker (None crashes len()/sum(); EDGE_SWEEP_r10 class A)
    blobs = _with_blob(table(spark, sf_dir, "documents")).filter(
        F.col("content").isNotNull()
    )
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


@register(
    "mm_feature_extract",
    # Flat (doc_id, bin, frac) rows, not a 16-wide array — the driver
    # canonicalizer cannot sort list cells (VERDICT r1 wrong-#1); the UDF
    # still emits the vector, the plan explodes it at the end.
    oracle="""
    WITH b AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
      FROM documents
    )
    SELECT doc_id, CAST(i AS BIGINT) AS bin,
           ROUND(len(list_filter(bytes, x -> x // 16 = i)) * 1.0 / len(bytes), 4)
             AS frac
    FROM b, UNNEST(generate_series(0, 15)) AS t(i)
    WHERE len(bytes) > 0
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media: a normalized 16-bin byte
    histogram per blob (the stand-in for an image/audio embedding — the
    real extractor swaps into the same UDF body). Arrow-batched pandas
    UDF over the BinaryType column: one numpy bincount per blob, the
    batch shape a GPU feature extractor needs. The oracle recomputes the
    histogram from first principles in SQL, so the hash check validates
    the whole binary → vector path, not just row counts. Zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def byte_hist(content: pd.Series) -> pd.Series:
        out = []
        for b in content:
            a = np.frombuffer(b, dtype=np.uint8)
            if len(a) == 0:
                out.append(None)
                continue
            h = np.bincount(a >> 4, minlength=16).astype(np.float64) / len(a)
            out.append(np.floor(h * 10000 + 0.5) / 10000)  # half-up, h ≥ 0
        return pd.Series(out)

    blobs = _with_blob(table(spark, sf_dir, "documents"))
    hist = blobs.filter(F.octet_length("content") > 0).select(
        "doc_id", byte_hist("content").alias("hist")
    )
    return hist.select("doc_id", F.posexplode("hist").alias("bin", "frac")).select(
        "doc_id", F.col("bin").cast("long").alias("bin"), "frac"
    )


@register("mm_resize_stub")  # rows-only: stubbed resample, Spark plumbing real
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize plumbing: each blob is 'resampled' to a fixed 64-byte
    thumbnail by strided byte selection (a real resize would decode →
    interpolate → re-encode in this same mapInPandas body — the guarded
    NotImplementedError marks the swap point). Demonstrates the
    fixed-size-output contract GPU preprocessing needs: every output row
    carries exactly TARGET bytes regardless of input size."""
    TARGET = 64

    def resize_batch(batches, real: bool = False):
        if real:
            raise NotImplementedError(
                "image resize needs PIL/opencv; not available in this "
                "environment — wire the decoder here on a real cluster"
            )
        import numpy as np
        import pandas as pd

        for pdf in batches:
            thumbs, widths = [], []
            for b in pdf["content"]:
                a = np.frombuffer(b, dtype=np.uint8)
                if len(a) == 0:
                    thumbs.append(bytes(TARGET))
                else:
                    idx = (np.arange(TARGET) * len(a)) // TARGET
                    thumbs.append(a[idx].tobytes())
                widths.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": widths,
                    "thumb": thumbs,
                }
            )

    # NULL blob gate, same contract as mm_decode_stub (class A)
    blobs = _with_blob(table(spark, sf_dir, "documents")).filter(
        F.col("content").isNotNull()
    )
    return blobs.mapInPandas(
        resize_batch, "doc_id long, orig_bytes int, thumb binary"
    )
