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
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic fake decode for container formats with no in-container
    decoder (video/audio — ffmpeg absent).

    STUB: replace with av.open / soundfile when the libs exist.  The fake
    derives (width, height, n_frames) purely from the payload bytes so tests
    are stable.  Still images do NOT take this path — their headers are
    parsed for real by :func:`parse_image_header`.
    """
    n = len(payload)
    width = (n % 640) + 1
    height = ((n // 7) % 480) + 1
    n_frames = 1 if media_type == "image" else (n % 250) + 1
    return width, height, n_frames


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (all SOFn except the
# DHT/JPG/DAC markers that share the 0xC0 block)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = frozenset(range(0xD0, 0xDA)) | {0x01}  # RSTn, SOI/EOI, TEM


def parse_image_header(payload: bytes):
    """Real, dependency-free image header parse: (format, width, height), or
    None if the payload is not a recognizable PNG/JPEG/GIF.

    Reads only the published container headers (PNG IHDR, JPEG SOFn segment
    walk, GIF logical screen descriptor) — no pixel decode, so it is O(header)
    per payload regardless of image size, which is exactly what a 100 TB
    metadata pass wants.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        return "png", width, height
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        return "gif", width, height
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # corrupt marker stream
            marker = payload[i + 1]
            if marker in _JPEG_STANDALONE:
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                return "jpeg", width, height
            i += 2 + seg_len
    return None


def parse_wav_header(payload: bytes):
    """Real, dependency-free WAV (RIFF) header parse:
    (sample_rate, n_channels, bits_per_sample, n_frames), or None if the
    payload is not a recognizable RIFF/WAVE container.

    Walks the chunk list reading only declared sizes (the 'fmt ' fields and
    the 'data' chunk's declared byte length) — no sample decode, O(header)
    per payload.  ``n_frames`` is the per-channel sample count
    (data_size / block_align), the audio analogue of the image dimensions.
    """
    n = len(payload)
    if n < 36 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= n:
            n_channels = int.from_bytes(payload[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            block_align = int.from_bytes(payload[i + 20 : i + 22], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
            fmt = (sample_rate, n_channels, block_align, bits)
        elif cid == b"data":
            data_size = size
        if fmt is not None and data_size is not None:
            break
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    sample_rate, n_channels, block_align, bits = fmt
    if block_align <= 0:
        return None
    return sample_rate, n_channels, bits, data_size // block_align


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    type_col: str = "media_type",
) -> DataFrame:
    """Vectorized metadata extraction over a binary column via mapInPandas.

    Still-image payloads (PNG/JPEG/GIF) get a REAL header parse —
    ``media_type`` is replaced by the detected format and (width, height)
    come from the container header.  WAV payloads get a REAL RIFF chunk-walk
    (:func:`parse_wav_header`): width/height are NULL, ``n_frames`` is the
    per-channel sample count, and (sample_rate, n_channels) are filled.
    Remaining payloads (video / compressed-audio containers; no ffmpeg
    in-container) fall back to the deterministic ``_decode_stub`` with their
    declared type, sample_rate/n_channels NULL.

    Input partitioning is preserved (narrow op, zero shuffle); output carries
    only small typed columns so downstream plans never move the payload.
    """
    id_name, media_name, type_name = id_col, media_col, type_col

    def _meta(payload, mtype):
        payload = payload if payload is not None else b""
        parsed = parse_image_header(payload)
        if parsed is not None:
            fmt, width, height = parsed
            return fmt, width, height, 1, None, None
        wav = parse_wav_header(payload)
        if wav is not None:
            sample_rate, n_channels, _bits, n_frames = wav
            return "wav", None, None, n_frames, sample_rate, n_channels
        return (mtype, *_decode_stub(payload, mtype), None, None)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _meta(payload, mtype)
                for payload, mtype in zip(pdf[media_name], pdf[type_name])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "media_type": [m[0] for m in metas],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf[media_name]
                    ],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                    "sample_rate": [m[4] for m in metas],
                    "n_channels": [m[5] for m in metas],
                }
            )

    return df.select(id_col, media_col, type_col).mapInPandas(
        process, MEDIA_META_SCHEMA
    )


# Byte sizes of the synthesized fixtures below (header-only images)
SYNTH_PNG_BYTES = 33
SYNTH_JPEG_BYTES = 41
SYNTH_GIF_BYTES = 14


def synth_image_bytes(fmt: str, width: int, height: int) -> bytes:
    """Deterministic, spec-conformant image *header* bytes for fixtures.

    Emits the real container headers (PNG signature+IHDR, JPEG
    SOI+APP0+SOF0+EOI, GIF89a logical screen descriptor) with the given
    dimensions — enough for any header-reading decoder, no pixel data (the
    PNG CRC and JPEG entropy stream are absent, so full decoders would
    reject them; header parsers, including :func:`parse_image_header`, read
    them exactly like PIL-produced files).
    """
    import struct

    if fmt == "png":
        return (
            _PNG_SIG
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", width, height)
            + b"\x08\x02\x00\x00\x00"
            + b"\x00\x00\x00\x00"  # CRC placeholder (not header-relevant)
        )
    if fmt == "jpeg":
        return (
            b"\xff\xd8"  # SOI
            + b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"  # APP0
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", height, width)
            + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"  # SOF0 components
            + b"\xff\xd9"  # EOI
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + b"\xf0\x00\x00"  # GCT flags / bg / aspect
            + b"\x3b"  # trailer
        )
    raise ValueError(f"unknown fixture format {fmt!r}")


def synth_image_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture generator: (id) -> (id, media:binary, media_type:'image') with
    real PNG/JPEG/GIF headers, dimensions a pure function of the id
    (format = id%3, width = id%640+1, height = id%480+1) so an SQL oracle can
    predict the parsed metadata without reading bytes."""
    fmts = ["png", "jpeg", "gif"]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media": [
                        synth_image_bytes(
                            fmts[i % 3], i % 640 + 1, i % 480 + 1
                        )
                        for i in ids
                    ],
                    "media_type": "image",
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(id_col).mapInPandas(process, schema)


SYNTH_WAV_BYTES = 44  # header-only RIFF fixture (data body declared, absent)
_WAV_RATES = (8000, 16000, 22050, 44100)


def synth_wav_bytes(
    sample_rate: int, n_channels: int, bits: int, n_samples: int
) -> bytes:
    """Deterministic, spec-conformant WAV *header* bytes for fixtures: RIFF +
    'fmt ' (PCM) + 'data' chunk header with the declared sample count — the
    44-byte canonical header any RIFF chunk walker (including
    :func:`parse_wav_header`) reads exactly like a soundfile-produced WAV;
    the sample body is absent (header parsers never touch it)."""
    import struct

    block_align = n_channels * bits // 8
    data_size = n_samples * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, n_channels, sample_rate,
            sample_rate * block_align, block_align, bits,
        )
        + b"data"
        + struct.pack("<I", data_size)
    )


def synth_mixed_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture generator for a MIXED media column: doc_id % 4 routes to
    png/jpeg/gif/wav, every field a pure function of the id (images:
    width = id%640+1, height = id%480+1; wav: rate = _WAV_RATES[(id//4)%4],
    channels = id%2+1, 16-bit, n_samples = id%50000+1) so an SQL oracle
    predicts the parsed metadata of every branch without reading bytes."""
    fmts = ["png", "jpeg", "gif"]

    def one(i: int) -> tuple[bytes, str]:
        if i % 4 == 3:
            return (
                synth_wav_bytes(
                    _WAV_RATES[(i // 4) % 4], i % 2 + 1, 16, i % 50000 + 1
                ),
                "audio",
            )
        return synth_image_bytes(fmts[i % 4], i % 640 + 1, i % 480 + 1), "image"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            media = [one(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media": [m for m, _ in media],
                    "media_type": [t for _, t in media],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(id_col).mapInPandas(process, schema)


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
