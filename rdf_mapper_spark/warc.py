"""WARC (Web ARChive, ISO 28500) source: Common-Crawl's native format.

Crawl archives arrive as WARC files, not parquet — this connector turns a
directory of them into the pipeline's pages table
(url, warc_ts, html, text=NULL, lang=NULL); `pipeline.extract` then fills
`text` and the mapping engine runs unchanged.

WARC records are length-prefixed (`Content-Length` governs the payload),
so the format is NOT line-splittable: the safe parallel unit is the FILE,
exactly how production Common-Crawl readers shard work (CC ships ~1 GB
WARCs, tens of thousands per crawl — ample parallelism at file
granularity).  Implementation: `binaryFile` source (one row per file,
Spark handles listing/partition planning) -> `mapInPandas` walking records
with a pure-bytes parser.  Arrow moves each file's bytes once; no per-row
Python.

Only `WARC-Type: response` records yield pages; the HTTP envelope is
stripped (payload after the first CRLFCRLF) so `html` is the raw body,
matching the input_hint column. Truncated/malformed tails stop the walk
for that file rather than erroring the task (crawl archives routinely end
mid-record).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(data: bytes) -> list[tuple[str, datetime, bytes]]:
    """Pure-bytes record walk -> [(url, ts, html)] for response records.

    Shared verbatim by the executor path (inside mapInPandas) and tests —
    the single reference implementation, like pipeline.extract.extract_text.
    """
    out = []
    i = 0
    n = len(data)
    while i < n:
        if not data.startswith(b"WARC/", i):
            break
        hdr_end = data.find(_CRLF2, i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace"))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break  # adversarial: a negative length would stall the walk
        block_start = hdr_end + len(_CRLF2)
        block_end = block_start + length
        if block_end > n:
            break  # truncated tail
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri")
            ts_raw = headers.get("warc-date", "")
            try:
                ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
            except ValueError:
                ts = None
            block = data[block_start:block_end]
            # strip the HTTP envelope if present (status line + headers)
            if block.startswith(b"HTTP/"):
                env_end = block.find(_CRLF2)
                body = block[env_end + len(_CRLF2):] if env_end >= 0 else block
            else:
                body = block
            if url is not None:
                out.append((url, ts, body))
        # each record block is followed by two CRLFs (record separator)
        i = block_end
        while data.startswith(b"\r\n", i):
            i += 2
    return out


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of .warc files -> pages DataFrame
    (url, warc_ts, html, text=NULL, lang=NULL)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, html in parse_warc_bytes(bytes(content)):
                    rows.append((url, ts, html, None, None))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(_parse, schema=PAGES_SCHEMA)


def warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (url, iso_ts, html) response records to WARC/1.0 bytes —
    the test-data writer (the reader above must round-trip it)."""
    out = bytearray()
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}"
        ).encode()
        out += hdr + _CRLF2 + http + b"\r\n\r\n"
    return bytes(out)
