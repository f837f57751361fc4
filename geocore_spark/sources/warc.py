"""WARC source: raw crawl archives -> the pages table.

Common-Crawl-style corpora arrive as WARC files (ISO 28500): a stream of
records, each a ``WARC/1.0`` header block (CRLF-separated headers, ended
by a blank line) followed by ``Content-Length`` bytes of payload. This
reader turns 'response' records into rows of the engine's pages shape
(url, warc_ts, html) — the ingestion edge for BASELINE's input_hint.

Execution shape: ``spark.read.format("binaryFile")`` gives one row per
archive file (path, content); records are parsed per file inside
``mapInPandas``. WARC files are NOT splittable mid-stream, so the file
is the parallelism unit — exactly how Common Crawl segments are
processed in practice (tens of thousands of ~1 GB files; one task each).
Uncompressed and whole-file-gzip archives are handled; per-record gzip
members (the CC wire format) would use the same record parser behind a
streaming gunzip — noted, not needed for the synthetic corpus.

The parser is a faithful subset of the spec: multi-record streams,
CRLF framing, Content-Length payloads, HTTP response header stripping.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, warc_type string"


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one WARC stream: [{url, warc_ts, html, warc_type}].

    Malformed tails are dropped, not raised — a truncated archive yields
    its complete prefix records (crawl reality).
    """
    if data[:2] == b"\x1f\x8b":
        # gzip: whole-file OR concatenated per-record members (the
        # Common Crawl wire format — one gzip member per record).
        # zlib's unused_data walks member boundaries; the decompressed
        # concatenation parses identically either way.
        import zlib

        parts = []
        while data[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=47)
            try:
                parts.append(d.decompress(data))
                parts.append(d.flush())
            except zlib.error:
                break  # truncated trailing member: keep complete prefix
            data = d.unused_data
        data = b"".join(parts)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            # a negative Content-Length (corrupt/malicious) would move
            # pos BACKWARDS — re-parsing the same record forever and
            # growing `out` unboundedly (executor hang then OOM)
            break
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        if len(body) < length:
            break  # truncated record
        wtype = headers.get("warc-type", "")
        html = body
        if wtype == "response" and body.startswith(b"HTTP/"):
            # strip the HTTP response header block
            he = body.find(b"\r\n\r\n")
            if he >= 0:
                html = body[he + 4 :]
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_ts": pd.to_datetime(
                    headers.get("warc-date"), utc=True, errors="coerce"
                ),
                "html": html,
                "warc_type": wtype,
            }
        )
        pos = body_start + length
    return out


def read_warc(spark: SparkSession, path_glob: str, responses_only: bool = True) -> DataFrame:
    """WARC archives -> pages DataFrame. One task per archive file."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one yield PER ARCHIVE, not per Arrow batch: binaryFile
            # packs many small archives into one partition, and
            # accumulating them all before yielding multiplies peak
            # task memory by the archive count
            for content in pdf["content"]:
                rows = parse_warc_bytes(bytes(content))
                out = pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "warc_type"]
                )
                if len(out):
                    out["warc_ts"] = pd.to_datetime(out["warc_ts"]).dt.tz_localize(None)
                yield out

    df = files.mapInPandas(_parse, PAGES_SCHEMA)
    if responses_only:
        df = df.filter(df["warc_type"] == "response").drop("warc_type")
    return df


def write_warc(records: list[tuple[str, str, bytes]], path: str, compress: bool = False) -> None:
    """Serialize (url, iso_ts, html) response records as a WARC file —
    the test/fixture writer (round-trips through parse_warc_bytes)."""
    chunks = []
    for url, ts, html in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\nContent-Length: {len(http)}\r\n"
        ).encode()
        chunks.append(head + b"\r\n" + http + b"\r\n\r\n")
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)


# --- WET / WAT: the Common Crawl derived formats --------------------------
# WET = extracted plain text (WARC-Type: conversion, UTF-8 payload),
# WAT = per-page metadata (WARC-Type: metadata, JSON payload). Both reuse
# the WARC record framing above; the only difference is record type and
# payload decoding — which stays JVM-side (F.decode), no extra Python.

def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET (extracted-text) archives -> documents-shaped DataFrame
    (url, warc_ts, text). 'conversion' records only; the warcinfo header
    record every CC segment starts with is dropped by the type filter.
    Feed straight into the text operators (dedup, lang, quality)."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path_glob, responses_only=False)
    return (
        df.filter(df["warc_type"] == "conversion")
        .select("url", "warc_ts", F.decode("html", "UTF-8").alias("text"))
    )


def read_wat(spark: SparkSession, path_glob: str) -> DataFrame:
    """WAT (metadata) archives -> (url, warc_ts, meta) with ``meta`` the
    raw JSON envelope string — pair with get_json_object /
    from_json (the json_extract query's machinery) to project fields."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path_glob, responses_only=False)
    return (
        df.filter(df["warc_type"] == "metadata")
        .select("url", "warc_ts", F.decode("html", "UTF-8").alias("meta"))
    )


def _write_derived(
    records: list[tuple[str, str, str]],
    path: str,
    warc_type: str,
    content_type: str,
    compress: bool = False,
) -> None:
    chunks = []
    for url, ts, text in records:
        payload = text.encode("utf-8")
        head = (
            f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n"
        ).encode()
        chunks.append(head + b"\r\n" + payload + b"\r\n\r\n")
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)


def write_wet(
    records: list[tuple[str, str, str]], path: str, compress: bool = False
) -> None:
    """(url, iso_ts, text) -> WET file (fixture writer, round-trips
    through read_wet)."""
    _write_derived(records, path, "conversion", "text/plain", compress)


def write_wat(
    records: list[tuple[str, str, str]], path: str, compress: bool = False
) -> None:
    """(url, iso_ts, json_str) -> WAT file (fixture writer)."""
    _write_derived(
        records, path, "metadata", "application/json", compress
    )
