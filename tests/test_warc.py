"""WARC source connector: parse + Spark read + pipeline composition."""

import gzip

from pyspark.sql import functions as F

from geocore_spark.functions import text as tx
from geocore_spark.sources import warc

RECS = [
    (
        "https://a.example/p/1",
        "2025-03-01T12:00:00Z",
        b'<html><meta name="geo.position" content="40.7128;-74.0060"/>x</html>',
    ),
    ("https://b.example/p/2", "2025-03-01T12:05:00Z", b"<html>no geo</html>"),
    ("https://c.example/p/3", "2025-03-02T00:00:00Z", b"<html>\xe6\x97\xa5</html>"),
]


def test_parse_roundtrip(tmp_path):
    p = str(tmp_path / "a.warc")
    warc.write_warc(RECS, p)
    got = warc.parse_warc_bytes(open(p, "rb").read())
    assert [r["url"] for r in got] == [u for u, _, _ in RECS]
    assert all(r["warc_type"] == "response" for r in got)
    assert got[0]["html"] == RECS[0][2]  # HTTP headers stripped exactly
    assert got[2]["html"] == RECS[2][2]  # binary-safe


def test_parse_gzip_and_truncation(tmp_path):
    p = str(tmp_path / "a.warc.gz")
    warc.write_warc(RECS, p, compress=True)
    got = warc.parse_warc_bytes(open(p, "rb").read())
    assert len(got) == 3
    # truncated archive: complete prefix records survive
    raw = gzip.decompress(open(p, "rb").read())
    assert len(warc.parse_warc_bytes(raw[: len(raw) - 40])) == 2


def test_read_warc_spark(spark, tmp_path):
    warc.write_warc(RECS[:2], str(tmp_path / "s1.warc"))
    warc.write_warc(RECS[2:], str(tmp_path / "s2.warc.gz"), compress=True)
    df = warc.read_warc(spark, str(tmp_path / "*.warc*"))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    assert rows["https://a.example/p/1"]["warc_ts"].isoformat() == "2025-03-01T12:00:00"
    # composes with the geotag pipeline
    tagged = df.select(
        "url", tx.geo_latlon(F.decode("html", "UTF-8")).alias("g")
    ).filter(F.col("g.lat").isNotNull())
    got = tagged.collect()
    assert len(got) == 1 and got[0]["g"]["lat"] == 40.7128


def test_per_record_gzip_members(tmp_path):
    """Common Crawl wire format: one gzip member per record, concatenated."""
    members = []
    for rec in RECS:
        warc.write_warc([rec], str(tmp_path / "tmp.warc"))
        members.append(gzip.compress(open(str(tmp_path / "tmp.warc"), "rb").read()))
    blob = b"".join(members)
    got = warc.parse_warc_bytes(blob)
    assert [r["url"] for r in got] == [u for u, _, _ in RECS]
    assert got[0]["html"] == RECS[0][2]


WET_RECS = [
    ("https://a.example/p/1", "2025-03-01T12:00:00Z", "hello extracted text"),
    ("https://b.example/p/2", "2025-03-01T12:05:00Z", "unicode 日本語 body"),
]


def test_wet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "seg.warc.wet")
    warc.write_wet(WET_RECS, p)
    # a real WET segment starts with a warcinfo record — the reader must
    # drop it via the type filter
    info = 'software: test\r\n'.encode("utf-8")
    head = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        f"WARC-Date: 2025-03-01T00:00:00Z\r\nContent-Length: {len(info)}\r\n"
    ).encode()
    with open(p, "rb") as f:
        body = f.read()
    with open(p, "wb") as f:
        f.write(head + b"\r\n" + info + b"\r\n\r\n" + body)
    got = {r["url"]: r for r in warc.read_wet(spark, p).collect()}
    assert set(got) == {u for u, _, _ in WET_RECS}
    assert got["https://b.example/p/2"]["text"] == "unicode 日本語 body"
    assert got["https://a.example/p/1"]["warc_ts"] is not None


def test_wet_gzip(spark, tmp_path):
    p = str(tmp_path / "seg.warc.wet.gz")
    warc.write_wet(WET_RECS, p, compress=True)
    assert warc.read_wet(spark, p).count() == 2


def test_wat_json_extraction(spark, tmp_path):
    p = str(tmp_path / "seg.warc.wat")
    warc.write_wat(
        [
            ("https://a.example/p/1", "2025-03-01T12:00:00Z",
             '{"Envelope": {"status": 200, "links": 3}}'),
        ],
        p,
    )
    df = warc.read_wat(spark, p)
    row = df.select(
        "url", F.get_json_object("meta", "$.Envelope.status").alias("status")
    ).collect()[0]
    assert row["status"] == "200"


def test_parse_negative_content_length_terminates(tmp_path):
    # a Content-Length of minus the record's own header size lands pos
    # back at the record start — unguarded, the parser loops forever
    evil = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -54\r\n\r\n"
    assert warc.parse_warc_bytes(evil) == []
    # a good record FOLLOWED by a negative-length one keeps the prefix
    p = str(tmp_path / "g.warc")
    warc.write_warc(RECS[:1], p)
    blob = open(p, "rb").read() + evil
    got = warc.parse_warc_bytes(blob)
    assert len(got) == 1 and got[0]["url"] == RECS[0][0]


def test_parse_never_raises_on_truncation(tmp_path):
    """Crash-safety contract: ANY byte-level truncation of a valid
    archive parses to a prefix of the full record list (never raises) —
    both plain and gzip framings."""
    p = str(tmp_path / "t.warc")
    warc.write_warc(RECS, p)
    blob = open(p, "rb").read()
    full = [r["url"] for r in warc.parse_warc_bytes(blob)]
    for cut in range(0, len(blob), 7):
        got = [r["url"] for r in warc.parse_warc_bytes(blob[:cut])]
        assert got == full[: len(got)]  # always a prefix
    gz = str(tmp_path / "t.warc.gz")
    warc.write_warc(RECS, gz, compress=True)
    gblob = open(gz, "rb").read()
    for cut in range(0, len(gblob), 5):
        got = [r["url"] for r in warc.parse_warc_bytes(gblob[:cut])]
        assert got == full[: len(got)]
