"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode / feature-extract as Arrow-batched pandas
functions over ``mapInPandas``.

The decode step itself is STUBBED — the image/audio libraries are not in
this container — behind ``FAKE_DECODER`` (deterministic metadata derived
from the bytes) or ``NotImplementedError``. The Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested. The reference's analog is the per-file ffprobe subprocess fan-out
(itdbmetadata.py:135-157) whose JSON output lands in a relational column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder: metadata derived from byte length/content.
    Replace with PIL / ffprobe when the libs are available."""
    n = len(content)
    return (64 + n % 577, 64 + n % 331, "png" if n % 2 == 0 else "jpeg")


def _real_decode(content: bytes):  # pragma: no cover - deploy-time path
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this environment; "
        "swap _fake_decode for a PIL/ffprobe-backed decoder at deploy time"
    )


def decode_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """binary column → typed metadata via mapInPandas (Arrow batches).

    Scale: runs once per Arrow batch per partition — per-row Python overhead
    amortized; binary bytes never shuffle (narrow transformation)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(c) for c in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in metas], dtype="int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="int32"),
                    "format": [m[2] for m in metas],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_manifest(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling plan for video-like blobs: one row per (doc, frame_idx)
    — pure relational explode; the actual frame extraction happens in the
    decode UDF at deploy time."""
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )
