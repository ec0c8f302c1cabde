"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; decode
and feature-extraction run as Arrow-batched ``mapInPandas`` stages. The
decode step itself is STUBBED (no image/audio libs in this container):
`decode_image` raises NotImplementedError, and `fake_decode_features`
is the deterministic stand-in used by tests — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real.

Scale shape: media bytes never leave their partition; the extractor
streams Arrow batches, so executor memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch * max_media_size`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes, fmt: str):
    """Real decode requires PIL/opencv — not available in this
    container. The call site (extract_features) is the integration
    point; swap this function in a full deployment."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment"
    )


def fake_decode_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for decode + embed: n doubles derived from
    the md5 of the payload, each in [0, 1)."""
    digest = hashlib.md5(payload or b"").hexdigest()
    return [int(digest[i * 4 : i * 4 + 4], 16) / 65536.0 for i in range(n)]


def extract_features(media_df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] if m is not None else None for m in pdf["meta"]],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [
                        fake_decode_features(p, feature_dim) for p in pdf["payload"]
                    ],
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept frame
    index (posexplode over a sequence sized by metadata — the decode of
    the actual frame is the stubbed step)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media_df.filter(F.col("meta.kind") == "video")
        .select("media_id", F.posexplode(frames).alias("pos", "frame_idx"))
        .select("media_id", "frame_idx")
    )
