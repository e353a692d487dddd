"""WARC (Web ARChive) source — the ingest format of the Common-Crawl-style
pages table (input_hint: url, warc_ts, html...).

A 100 TB crawl arrives as tens of thousands of ``*.warc.gz`` segment files
(each a concatenation of per-record gzip members, per the WARC 1.0 / ISO
28500 spec).  Spark-first shape:

* ``spark.read.format("binaryFile")`` lists and reads whole segment files —
  one task per file, so parallelism == segment count, exactly how
  Common Crawl shards its dumps.  No Python file handling on the driver.
* record split + header parse + body extraction run inside ONE
  ``mapInPandas`` stage per file batch (Arrow in: file bytes; Arrow out:
  typed (url, warc_ts, html) rows) — the same fused narrow-stage shape as
  ``plans/kg.extract_and_assemble``, which consumes this frame unchanged.
* multi-member gzip decompression is stdlib ``zlib`` with per-member
  resync (the published trick every WARC reader uses: decompress, read
  ``unused_data``, continue) — no external warcio dependency.

The writer twin (:func:`write_warc_bytes`) emits spec-conforming segments
(CRLF header blocks, Content-Length-framed bodies, per-record gzip members)
and exists so tests and fixtures can round-trip without network access.

Reference parity: the reference binds flat source tables via config
(SURVEY §2.1 S1); for the web-scale recast the equivalent "source binding"
is the crawl segment listing + record parse, which this module provides.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("segment_path", StringType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("record_type", StringType()),
        StructField("html", BinaryType()),
        StructField("record_offset", LongType()),
    ]
)


def split_gzip_members(payload: bytes) -> list[tuple[int, bytes]]:
    """Split a multi-member gzip stream into (offset, decompressed) pairs.

    Per-record gzip members are WARC's random-access affordance; each is
    decompressed independently with ``zlib`` (wbits=47 accepts the gzip
    wrapper) and the next member starts where ``unused_data`` begins."""
    out: list[tuple[int, bytes]] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 2] != b"\x1f\x8b":
            break  # trailing garbage / padding — stop cleanly
        d = zlib.decompressobj(47)
        body = d.decompress(payload[pos:])
        out.append((pos, body))
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out


def parse_warc_record(raw: bytes) -> dict | None:
    """Parse one decompressed WARC record: version line, CRLF header block,
    Content-Length-framed body.  Returns None for non-WARC payloads."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    headers: dict[str, str] = {}
    lines = raw[:head_end].split(b"\r\n")
    for ln in lines[1:]:
        sep = ln.find(b":")
        if sep > 0:
            headers[ln[:sep].decode("ascii", "replace").strip().lower()] = (
                ln[sep + 1 :].decode("utf-8", "replace").strip()
            )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None
    body = raw[head_end + 4 : head_end + 4 + length]
    return {
        "url": headers.get("warc-target-uri"),
        "date": headers.get("warc-date"),
        "record_type": headers.get("warc-type"),
        "body": body,
    }


def read_warc(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Crawl-segment scan: ``*.warc.gz`` files -> (url, warc_ts, html) rows.

    ``binaryFile`` supplies (path, content) per segment; the Arrow stage
    splits gzip members, parses record headers, keeps ``record_types``
    (request/metadata records are dropped like every crawl consumer does)
    and emits input_hint-shaped rows.  Narrow (zero shuffle); feeds
    ``plans/kg.extract_and_assemble`` directly."""
    files = spark.read.format("binaryFile").load(path_glob)
    keep = set(record_types)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for off, raw in split_gzip_members(bytes(blob)):
                    rec = parse_warc_record(raw)
                    if rec is None or rec["record_type"] not in keep:
                        continue
                    rows.append(
                        (
                            path,
                            rec["url"],
                            pd.Timestamp(rec["date"]).tz_localize(None)
                            if rec["date"]
                            else None,
                            rec["record_type"],
                            rec["body"],
                            off,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "segment_path",
                    "url",
                    "warc_ts",
                    "record_type",
                    "html",
                    "record_offset",
                ],
            )

    return files.select("path", "content").mapInPandas(process, WARC_SCHEMA)


def write_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (url, iso_ts, body) records to a spec-conforming
    ``.warc.gz`` segment: one gzip member per record, CRLF header block,
    Content-Length framing.  Deterministic (gzip mtime pinned to 0)."""
    out = io.BytesIO()
    for url, iso_ts, body in records:
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso_ts}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
        ).encode()
        raw = head + b"\r\n" + body + b"\r\n\r\n"
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        out.write(buf.getvalue())
    return out.getvalue()


def warc_roundtrip_frame(
    pages: DataFrame, records_per_segment: int = 100
) -> DataFrame:
    """In-memory WARC round-trip over an input_hint pages frame: group rows
    into segments, serialize each segment with :func:`write_warc_bytes`,
    re-parse with the reader kernel, emit the recovered rows.  Exists so
    the parse path is oracle-checkable without touching the filesystem —
    the byte-identical-html invariant holds iff output == input."""
    cols = ["url", "warc_ts", "html"]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                (
                    u,
                    pd.Timestamp(t).strftime("%Y-%m-%dT%H:%M:%SZ"),
                    bytes(h),
                )
                for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
            ]
            rows = []
            for i in range(0, len(recs), records_per_segment):
                blob = write_warc_bytes(recs[i : i + records_per_segment])
                for _, raw in split_gzip_members(blob):
                    rec = parse_warc_record(raw)
                    rows.append(
                        (
                            rec["url"],
                            pd.Timestamp(rec["date"]).tz_localize(None),
                            rec["body"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
        ]
    )
    return pages.select(cols).mapInPandas(process, schema)
