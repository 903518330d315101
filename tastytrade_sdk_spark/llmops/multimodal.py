"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested: payloads travel as
``BinaryType`` columns with a metadata struct, batch through
``mapInPandas`` (Arrow), and partition by content hash so repeated
payloads co-locate. The actual media decoding (image/audio/video) is
STUBBED — the codec libraries are not in this container — behind
``NotImplementedError`` or a deterministic fake, clearly marked.

At 100 TB: payloads live in the lake as (binary, meta) rows; decode /
feature-extract runs as mapInPandas over size-capped Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch tuned down for large
blobs), and the derived features are columnar outputs joined back by
content hash — the blob never shuffles more than once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "application/octet-stream"
) -> DataFrame:
    """Typed metadata struct computed JVM-side from the binary column."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(p).alias("n_bytes"),
            F.md5(p).alias("content_hash"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image codecs are not available in this container.

    Real implementation: PIL.Image.open(io.BytesIO(payload)).
    """
    raise NotImplementedError("image decode requires PIL/opencv (not in container)")


def fake_image_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake feature extractor (CLEARLY MARKED FAKE):
    byte-histogram moments, so tests can assert real plumbing without
    codecs. Replace with a model/codec call in production."""
    if not payload:
        return [0.0] * n_features
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    feats = [
        float(arr.mean()),
        float(arr.std()),
        float(arr.min()),
        float(arr.max()),
        float(np.median(arr)),
        float(len(arr)),
        float((arr > 127).mean()),
        float(arr[:16].sum()),
    ]
    return feats[:n_features]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 8,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary
    payloads — the real distributed shape; the kernel inside is the
    deterministic fake above."""
    out_schema = T.StructType(
        [
            # derive the id type from the input — hardcoding LongType
            # breaks Arrow conversion for string/int ids
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        fake_image_features(p, n_features) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
) -> DataFrame:
    """'Frame sampling' plumbing demo on opaque payloads: emit one row
    per sampled offset (explode of a computed offset sequence) — the
    same plan shape a video frame sampler produces, minus the codec."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        id_col,
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
