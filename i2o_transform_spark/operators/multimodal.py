"""Multimodal (binary) column plumbing.

Web-scale training pipelines carry image/audio/video payloads as opaque
``binary`` columns + typed metadata (same shape as the pages table's
``html:binary``).  The Spark-side contract here is real and tested:

* schema: (id, media:binary, media_type:string) -> metadata struct
* execution: mapInPandas — Arrow batches of binary values, vectorized
  per-batch processing, bounded batch memory via
  spark.sql.execution.arrow.maxRecordsPerBatch
* partitioning: binary payloads never participate in joins/shuffles; only
  extracted metadata columns flow downstream (column pruning keeps the bytes
  out of every exchange)

Real decoders (PIL/ffmpeg) are not in this container, so ``decode_media``
dispatches to a clearly-marked deterministic fake when the library is absent
— the plumbing (schema, batching, signature) is what the engine owns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic fake decode (real decoders unavailable in-container).

    STUB: replace with PIL.Image.open / av.open when the libs exist.  The
    fake derives (width, height, n_frames) purely from the payload bytes so
    tests are stable.
    """
    n = len(payload)
    width = (n % 640) + 1
    height = ((n // 7) % 480) + 1
    n_frames = 1 if media_type == "image" else (n % 250) + 1
    return width, height, n_frames


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    type_col: str = "media_type",
) -> DataFrame:
    """Vectorized metadata extraction over a binary column via mapInPandas.

    Input partitioning is preserved (narrow op, zero shuffle); output carries
    only small typed columns so downstream plans never move the payload.
    """
    id_name, media_name, type_name = id_col, media_col, type_col

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(payload if payload is not None else b"", mtype)
                for payload, mtype in zip(pdf[media_name], pdf[type_name])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "media_type": pdf[type_name],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf[media_name]
                    ],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                }
            )

    return df.select(id_col, media_col, type_col).mapInPandas(
        process, MEDIA_META_SCHEMA
    )


def frame_sample_plan(meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    The decode itself is stubbed; the Spark-side fan-out (explode over a
    sequence — the expensive part at scale) is real: payload bytes stay
    behind, only (doc_id, frame_idx) rows flow."""
    return meta.where(F.col("n_frames") > 1).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Feature extraction over a binary column via mapInPandas.

    STUB compute (no image libs in-container): feature i is a deterministic
    function of payload size — replace the inner lambda with a real encoder
    (CLIP/resnet) when available.  The Spark-side contract is the real part:
    Arrow-batched binary in, fixed-length ``array<float>`` out, schema and
    partitioning preserved, payload never crosses a shuffle.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[media_col].map(
                lambda b: len(b) if b is not None else 0
            )
            feats = [
                [float(((n * (i + 1)) % 1000) / 1000.0) for i in range(dim)]
                for n in n_bytes
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, media_col).mapInPandas(process, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize plumbing over a binary column via mapInPandas.

    STUB decode/resample (PIL absent): the fake emits the first
    ``width*height//64`` payload bytes so output size is deterministic;
    swap in `PIL.Image.open(...).resize(...)` when the lib exists.  What the
    engine owns — Arrow binary batching, bounded output size, payload pruned
    from every downstream exchange — is real and oracle-checked.
    """
    cap = max(1, width * height // 64)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf[media_col].map(
                lambda b: (b or b"")[:cap]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    out = df.select(id_col, media_col).mapInPandas(process, _RESIZE_SCHEMA)
    return out
