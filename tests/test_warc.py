"""WARC source: pure-bytes parser round-trip + Spark integration."""

from datetime import datetime

from rdf_mapper_spark.warc import parse_warc_bytes, read_warc_pages, warc_bytes

RECORDS = [
    ("http://ex.com/a", "2025-01-01T00:00:00Z",
     b"<html><body><p>alpha page</p></body></html>"),
    ("http://ex.com/b", "2025-01-02T12:30:00Z",
     b"<html><body><p>beta page</p></body></html>"),
]


def test_roundtrip_pure_bytes():
    got = parse_warc_bytes(warc_bytes(RECORDS))
    assert [(u, t, h) for u, t, h in got] == [
        ("http://ex.com/a", datetime(2025, 1, 1, 0, 0), RECORDS[0][2]),
        ("http://ex.com/b", datetime(2025, 1, 2, 12, 30), RECORDS[1][2]),
    ]


def test_skips_non_response_and_truncated_tail():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nxxxx\r\n\r\n")
    data = info + warc_bytes(RECORDS[:1])
    # truncated tail: a record header claiming more bytes than remain
    data += (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"WARC-Target-URI: http://ex.com/trunc\r\n"
             b"WARC-Date: 2025-01-03T00:00:00Z\r\n"
             b"Content-Length: 99999\r\n\r\nshort")
    got = parse_warc_bytes(data)
    assert [u for u, _, _ in got] == ["http://ex.com/a"]


def test_read_warc_pages_and_extract(spark, tmp_path):
    """Two .warc files -> pages table -> text extraction runs unchanged."""
    from pyspark.sql import functions as F

    from rdf_mapper_spark.pipeline.extract import with_extracted_text

    (tmp_path / "c1.warc").write_bytes(warc_bytes(RECORDS[:1]))
    (tmp_path / "c2.warc").write_bytes(warc_bytes(RECORDS[1:]))
    (tmp_path / "ignore.txt").write_text("not a warc")

    pages = read_warc_pages(spark, str(tmp_path))
    rows = {(r.url, str(r.warc_ts), bytes(r.html))
            for r in pages.collect()}
    assert rows == {
        ("http://ex.com/a", "2025-01-01 00:00:00", RECORDS[0][2]),
        ("http://ex.com/b", "2025-01-02 12:30:00", RECORDS[1][2]),
    }
    texts = {r.url: r.extracted_text
             for r in with_extracted_text(pages)
             .select("url", "extracted_text").collect()}
    assert texts == {"http://ex.com/a": "alpha page",
                     "http://ex.com/b": "beta page"}


def test_parser_never_crashes_on_mutated_bytes():
    """Crawl archives end mid-record and get corrupted; the walk must
    terminate without raising on arbitrary mutations/truncations, and any
    records it does return must carry bytes payloads."""
    import random

    rng = random.Random(13)
    base = warc_bytes(RECORDS * 3)
    for _ in range(200):
        data = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            op = rng.randrange(3)
            if op == 0 and data:       # flip a byte
                data[rng.randrange(len(data))] = rng.randrange(256)
            elif op == 1 and data:     # truncate
                del data[rng.randrange(len(data)):]
            else:                      # insert garbage
                pos = rng.randrange(len(data) + 1)
                data[pos:pos] = bytes(rng.randrange(256)
                                      for _ in range(rng.randrange(8)))
        out = parse_warc_bytes(bytes(data))
        assert all(isinstance(h, bytes) for _, _, h in out)
