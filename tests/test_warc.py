"""WARC source/sink (sources/warc.py): record rendering, gzip-per-record
member splitting, the tolerant parser, and the distributed scan/sink pair.

The WARC lane is north_rule surface (Common-Crawl-style input), not
reference parity — the reference ingests shapefile/KML only."""

import os
import zlib

import pytest
from pyspark.sql import functions as F

from geokitten_spark.sources.warc import (
    encode_warc,
    parse_warc_bytes,
    read_warc_dir,
    record_id_for,
    render_warc_record,
    render_warcinfo,
    split_gzip_members,
    write_warc_files,
)

from tests.conftest import SF_SMOKE

ROWS = [
    ("https://host1.example/en/page-0000001", "2025-01-01T00:02:17Z",
     b"<html><head><title>Doc 1</title></head><body><p>hello &amp; bye</p></body></html>"),
    # body containing the header terminator bytes and non-ASCII UTF-8
    ("https://host2.example/es/page-0000002", "2025-03-31T23:59:59Z",
     b"<html><body>\xc3\xa9\r\n\r\ntrailer</body></html>"),
    ("https://host3.example/de/page-0000003", "2025-12-31T01:00:00Z", b""),
]


# ---------------------------------------------------------------------------
# pure renderer / parser
# ---------------------------------------------------------------------------

def test_render_is_deterministic_and_spec_shaped():
    a = render_warc_record(*ROWS[0])
    b = render_warc_record(*ROWS[0])
    assert a == b
    assert a.startswith(b"WARC/1.0\r\n")
    assert a.endswith(b"\r\n\r\n")
    assert b"WARC-Target-URI: " + ROWS[0][0].encode() + b"\r\n" in a
    # Content-Length counts the full HTTP envelope, exactly
    hdr_end = a.find(b"\r\n\r\n")
    clen = int([l for l in a[:hdr_end].split(b"\r\n")
                if l.lower().startswith(b"content-length")][0].split(b":")[1])
    assert a[hdr_end + 4:] == a[hdr_end + 4:hdr_end + 4 + clen] + b"\r\n\r\n"


def test_record_id_is_stable_uuid_urn():
    rid = record_id_for(ROWS[0][0], ROWS[0][1])
    assert rid == record_id_for(ROWS[0][0], ROWS[0][1])
    assert rid.startswith("<urn:uuid:") and rid.endswith(">")
    body = rid[10:-1]
    assert [len(p) for p in body.split("-")] == [8, 4, 4, 4, 12]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = encode_warc(ROWS, gzip_per_record=gz)
        recs = parse_warc_bytes(data)
        assert [r["rec_type"] for r in recs] == ["warcinfo"] + ["response"] * 3
        resp = [r for r in recs if r["rec_type"] == "response"]
        for r, (u, d, h) in zip(resp, ROWS):
            assert r["url"] == u
            assert r["date"] == d
            assert r["html"] == h  # byte-identical through the container
            assert r["http_status"] == 200
            assert r["record_id"] == record_id_for(u, d)


def test_gzip_members_split_one_per_record_and_decompress_independently():
    data = encode_warc(ROWS, gzip_per_record=True)
    members = split_gzip_members(data)
    assert len(members) == 1 + len(ROWS)  # warcinfo + one member per record
    assert members[0][0] == 0
    assert sum(l for _, l in members) == len(data)
    # the offset-splittability contract: each member parses alone
    for (off, length), expect in zip(members[1:], ROWS):
        chunk = zlib.decompress(data[off:off + length], 31)
        (rec,) = parse_warc_bytes(chunk)
        assert rec["url"] == expect[0] and rec["html"] == expect[2]


def test_parser_rejects_truncation():
    data = encode_warc(ROWS, gzip_per_record=True)
    with pytest.raises((ValueError, zlib.error)):
        parse_warc_bytes(data[:-10])
    plain = encode_warc(ROWS, gzip_per_record=False)
    with pytest.raises(ValueError):
        parse_warc_bytes(plain[: len(plain) - 6])


def test_warcinfo_header_fields():
    rec = parse_warc_bytes(render_warcinfo("f.warc.gz"))[0]
    assert rec["rec_type"] == "warcinfo"
    assert rec["html"] is None and rec["http_status"] is None


# ---------------------------------------------------------------------------
# distributed scan / sink
# ---------------------------------------------------------------------------

def test_scan_reads_written_files_byte_exact(spark, tmp_path):
    d = str(tmp_path / "warc")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(encode_warc(ROWS[:2], gzip_per_record=True))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(encode_warc(ROWS[2:], gzip_per_record=False))
    with open(os.path.join(d, "junk.warc"), "wb") as f:
        f.write(b"not a warc file at all")  # bad-file skip
    got = {
        r["url"]: r
        for r in read_warc_dir(spark, d).collect()
    }
    assert len(got) == 3
    for u, dt, h in ROWS:
        assert bytes(got[u]["html"]) == h
        assert got[u]["http_status"] == 200
        assert got[u]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == dt


def test_sink_scan_roundtrip_on_webdocs(spark):
    from geokitten_spark.fixtures import web_documents

    docs = (
        web_documents(spark, SF_SMOKE)
        .select("url", "warc_ts", "html")
        .repartition(4, "url")
        .limit(200)
    )
    import tempfile, shutil, uuid

    d = os.path.join(tempfile.gettempdir(), f"gk_warc_test_{uuid.uuid4().hex}")
    try:
        manifest = write_warc_files(docs, d).collect()
        assert sum(m["n_records"] for m in manifest) == 200
        assert all(m["n_bytes"] > 0 and os.path.exists(m["path"]) for m in manifest)
        back = read_warc_dir(spark, d)
        orig = docs.select(
            "url", F.md5("html").alias("m"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("dt"),
        )
        reread = back.select(
            "url", F.md5("html").alias("m"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("dt"),
        )
        assert reread.count() == 200
        assert orig.exceptAll(reread).count() == 0
        assert reread.exceptAll(orig).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_http_gzip_and_chunked_envelopes_decode_to_logical_bytes():
    """Real captures store the server's bytes verbatim; the parser must
    undo gzip content-coding and RFC 9112 chunked transfer-coding."""
    for kwargs in (
        {"content_encoding": "gzip"},
        {"chunked": True},
        {"content_encoding": "gzip", "chunked": True},
    ):
        data = encode_warc(ROWS, gzip_per_record=True, **kwargs)
        resp = [r for r in parse_warc_bytes(data) if r["rec_type"] == "response"]
        for r, (u, d, h) in zip(resp, ROWS):
            assert r["html"] == h, kwargs
            assert r["http_status"] == 200
    # multi-chunk bodies reassemble exactly
    big = ("x" * 5000).encode()
    rec = encode_warc(
        [("https://h.example/big", "2025-01-01T00:00:00Z", big)],
        gzip_per_record=False, chunked=True,
    )
    (got,) = [r for r in parse_warc_bytes(rec) if r["rec_type"] == "response"]
    assert got["html"] == big


def test_chunked_corruption_raises():
    from geokitten_spark.sources.warc import _dechunk

    with pytest.raises(ValueError, match="CRLF|chunk"):
        _dechunk(b"10\r\nshort")
    with pytest.raises(ValueError, match="unterminated"):
        _dechunk(b"no-size-line-here")
