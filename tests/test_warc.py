"""WARC source: spec round-trip, file-based binaryFile read, filtering."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from i2o_transform_spark.sources.warc import (
    parse_warc_record,
    read_warc,
    split_gzip_members,
    warc_roundtrip_frame,
    write_warc_bytes,
)


def test_gzip_member_split_and_record_parse():
    recs = [
        ("https://a.example/x", "2024-03-01T10:00:00Z", b"<html>A body\r\nwith CRLF</html>"),
        ("https://b.example/y", "2024-03-02T11:30:05Z", b"\x00\x01binary ok\xff"),
    ]
    blob = write_warc_bytes(recs)
    members = split_gzip_members(blob)
    assert len(members) == 2 and members[0][0] == 0
    for (url, ts, body), (_, raw) in zip(recs, members):
        rec = parse_warc_record(raw)
        assert rec["url"] == url and rec["record_type"] == "response"
        assert rec["date"] == ts
        assert rec["body"] == body  # byte-identical through framing
    # determinism (mtime pinned): same records -> same bytes
    assert write_warc_bytes(recs) == blob
    # non-WARC member declines cleanly
    assert parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\n") is None
    assert split_gzip_members(b"not gzip at all") == []


def test_read_warc_from_segment_files(spark, tmp_path):
    """binaryFile scan over two .warc.gz segments: every response record
    recovered byte-identically, non-response records dropped, one input
    split per segment (Common-Crawl parallelism shape)."""
    seg_rows = {
        "seg-00001.warc.gz": [
            ("https://s1.example/p0", "2024-01-05T00:00:00Z", b"<p>alpha</p>"),
            ("https://s1.example/p1", "2024-01-05T00:00:01Z", b"<p>beta</p>"),
        ],
        "seg-00002.warc.gz": [
            ("https://s2.example/p0", "2024-01-06T12:00:00Z", "<p>ünicode</p>".encode()),
        ],
    }
    for name, rows in seg_rows.items():
        (tmp_path / name).write_bytes(write_warc_bytes(rows))
    # a request record interleaved: the reader must drop it
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://s1.example/p0\r\n"
        b"WARC-Date: 2024-01-05T00:00:00Z\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    buf = gzip.compress(req, mtime=0)
    with open(tmp_path / "seg-00001.warc.gz", "ab") as f:
        f.write(buf)

    df = read_warc(spark, os.path.join(str(tmp_path), "*.warc.gz"))
    got = {
        r.url: (r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r.html), r.record_type)
        for r in df.collect()
    }
    want = {
        url: (ts, body, "response")
        for rows in seg_rows.values()
        for url, ts, body in rows
    }
    assert got == want
    assert df.rdd.getNumPartitions() >= 1


def test_warc_roundtrip_frame_byte_identity(spark):
    pages = spark.createDataFrame(
        [
            (f"https://ex.com/{i}", f"2024-02-0{1 + i % 9} 08:00:0{i % 10}",
             f"<html>doc {i} ☃</html>".encode())
            for i in range(37)
        ],
        "url string, ts string, html binary",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "html")
    back = warc_roundtrip_frame(pages, records_per_segment=10)
    a = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.collect()}
    b = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert a == b and len(a) == 37
