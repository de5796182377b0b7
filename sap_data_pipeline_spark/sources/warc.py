"""WARC (Web ARChive) corpus source — the Common Crawl ingestion front
door.  A 100 TB pretraining corpus usually STARTS as .warc.gz files, so
reading them natively (no external warcio dependency — stdlib parsing)
is a first-class source, not a convenience.

Format (ISO 28500): each record is

    WARC/1.0\r\n
    <header>: <value>\r\n ...
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n

``response`` records carry an HTTP message as payload (status line +
headers + body).  Real crawls store each record as its OWN gzip member,
concatenated — a plain ``gzip.decompress`` stops after member one, so
the reader walks members via ``zlib`` with ``unused_data``.

Distribution model: WARC is not arbitrarily splittable (records are
length-prefixed, not line-delimited), so the split unit is the FILE —
exactly how Common Crawl ships (1 GB segment files).  The Spark shape is
``binaryFile`` scan → Arrow-batched ``mapInPandas`` record explosion;
payload bytes never shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("source_file", T.StringType(), True),
    T.StructField("record_type", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("body", T.StringType(), True),
    T.StructField("n_payload_bytes", T.LongType(), True),
])


def gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout:
    one member per record).  ``gzip.decompress`` handles multi-member
    streams since 3.8 but silently stops at trailing garbage; this walks
    explicitly so a truncated tail raises instead of vanishing."""
    import zlib

    out = []
    rest = bytes(payload)
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    return b"".join(out)


def parse_warc_records(payload: bytes) -> list[dict]:
    """Parse a (possibly gzipped) WARC byte stream into record dicts:
    {record_type, target_uri, http_status, content_type, body,
    n_payload_bytes}.  Record walking is Content-Length-driven (never
    pattern scanning — bodies may contain anything); only ``response``
    records get HTTP head/body splitting, others pass through with a
    raw body."""
    data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
    records = []
    pos = 0
    while pos < len(data):
        # skip inter-record CRLF padding
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC version marker at byte {pos}")
        head_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        raw = data[body_start: body_start + length]
        pos = body_start + length

        rec = {
            "record_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "body": None,
            "n_payload_bytes": length,
        }
        if rec["record_type"] == "response" and raw.startswith(b"HTTP/"):
            http_end = raw.index(b"\r\n\r\n")
            http_lines = raw[:http_end].decode("utf-8", errors="replace").split("\r\n")
            rec["http_status"] = int(http_lines[0].split(" ")[1])
            for line in http_lines[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    rec["content_type"] = v.strip()
            rec["body"] = raw[http_end + 4:].decode("utf-8", errors="replace")
        else:
            rec["body"] = raw.decode("utf-8", errors="replace")
        records.append(rec)
    return records


def parse_warc_frames(media: DataFrame, *, payload_col: str = "payload",
                      file_col: str = "source_file") -> DataFrame:
    """Arrow-batched 1→N record explosion over a binary WARC column —
    the same stage shape whether payloads come from ``binaryFile``
    scans or an upstream fetch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in WARC_RECORD_SCHEMA.fieldNames()}
            for src, payload in zip(pdf[file_col], pdf[payload_col]):
                for rec in parse_warc_records(payload):
                    out["source_file"].append(src)
                    for k, v in rec.items():
                        out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=WARC_RECORD_SCHEMA)


def read_warc_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of .warc / .warc.gz files: ``binaryFile`` scan
    (one task per file — WARC's split unit) → record explosion."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .selectExpr("path AS source_file", "content AS payload")
    )
    return parse_warc_frames(files)


def build_warc_bytes(records: list[tuple[str, str]], *, gzip_members: bool = False) -> bytes:
    """Assemble a WARC byte stream from (uri, body_text) pairs — one
    ``response`` record each (plus a leading ``warcinfo`` record, which
    readers must skip).  ``gzip_members=True`` compresses each record as
    its own gzip member (the .warc.gz layout)."""
    import gzip

    def one(head: str, payload: bytes) -> bytes:
        rec = (
            head + f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload + b"\r\n\r\n"
        return gzip.compress(rec) if gzip_members else rec

    out = [one(
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n",
        b"software: sap-data-pipeline-spark synth\r\n",
    )]
    for uri, text in records:
        body = text.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"
            + body
        )
        out.append(one(
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http; msgtype=response\r\n",
            http,
        ))
    return b"".join(out)
