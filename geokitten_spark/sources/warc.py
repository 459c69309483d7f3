"""WARC (ISO 28500 / WARC-1.0) source & sink for Common-Crawl-style pages.

The engine's canonical input (BASELINE.json input_hint) is a table of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``. Real
Common Crawl ships that data as WARC: ~1 GiB ``.warc.gz`` files with one
gzip MEMBER per record, so readers can split a file at member boundaries.
This module gives the engine a native WARC lane:

* render/parse — a deterministic WARC/1.0 ``response`` record renderer
  (HTTP envelope included) and a tolerant record parser (plain or
  gzip-per-record input; ``warcinfo``/``request``/``metadata`` records are
  skipped by the scan).
* scan — ``spark.read.format('binaryFile')`` over ``*.warc`` /
  ``*.warc.gz`` + ``mapInPandas`` decode → ``(file_name, record_id, url,
  warc_ts, http_status, content_length, html)``. Parallelism = files:
  a monthly Common Crawl is ~64-90k WARC files for ~100 TiB, so a
  1000-executor cluster has dozens of input splits per executor without
  member-level splitting. For pathological single-file inputs,
  :func:`split_gzip_members` exposes exact per-member byte ranges that a
  custom split planner can fan out (each member decompresses
  independently).
* sink — :func:`write_warc_files`: executor-side ``mapInPandas`` writer
  (one ``.warc.gz`` per task batch) returning a ``(path, n_records,
  n_bytes)`` manifest — the same write-files-then-manifest contract as the
  snapshot sink (``plans/snapshot.py``), so a WARC export stage is
  checkpointable like any other.

Determinism: record-ids derive from ``md5(url | date)``; rendering the same
rows yields byte-identical records, which is what lets the driver query
``warc_roundtrip`` hash-compare the decoded content against a pure-SQL
DuckDB oracle (``oracles.warc_roundtrip_sql``).

Reference parity note: the reference ingests shapefile/KML only
(``gdf_standardization.py``, ``gdf_kml_converter.py``); WARC is north_rule
surface, not reference parity.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "record_id_for",
    "render_warc_record",
    "render_warcinfo",
    "encode_warc",
    "split_gzip_members",
    "parse_warc_bytes",
    "read_warc_dir",
    "write_warc_files",
]

_GZ_MAGIC = b"\x1f\x8b"
_CRLF = b"\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


# ---------------------------------------------------------------------------
# record rendering (deterministic)
# ---------------------------------------------------------------------------

def record_id_for(url: str, date_iso: str) -> str:
    """``<urn:uuid:...>`` derived from md5(url|date) — stable across runs
    and across engines (the oracle rebuilds it with SQL ``md5``)."""
    h = hashlib.md5(f"{url}|{date_iso}".encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _chunked(body: bytes, chunk: int = 1024) -> bytes:
    """RFC 9112 §7.1 chunked transfer coding of a body."""
    out = bytearray()
    for i in range(0, len(body), chunk):
        piece = body[i:i + chunk]
        out += f"{len(piece):x}\r\n".encode() + piece + _CRLF
    out += b"0\r\n\r\n"
    return bytes(out)


def render_warc_record(url: str, date_iso: str, html: bytes,
                       status: int = 200,
                       content_encoding: str | None = None,
                       chunked: bool = False) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 envelope.

    Layout per ISO 28500 §4: version line, named fields, CRLF, exactly
    ``Content-Length`` payload octets, two CRLFs. Real crawls store the
    server's bytes verbatim, so the envelope options mirror what servers
    actually send: ``content_encoding='gzip'`` (body gzip-compressed,
    ``Content-Encoding`` header) and ``chunked=True`` (RFC 9112 chunked
    transfer coding, ``Transfer-Encoding`` header) — the parser undoes
    both, so the scan always yields the logical html bytes."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    body = html
    extra = b""
    if content_encoding == "gzip":
        body = _gzip_member(body)
        extra += b"Content-Encoding: gzip\r\n"
    elif content_encoding is not None:
        raise ValueError(f"unsupported content_encoding {content_encoding!r}")
    if chunked:
        body = _chunked(body)
        extra += b"Transfer-Encoding: chunked\r\n"
        length_line = b""
    else:
        length_line = b"Content-Length: %d\r\n" % len(body)
    http = (
        b"HTTP/1.1 %d OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n" % status
    ) + extra + length_line + _CRLF + body
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + b"WARC-Record-ID: " + record_id_for(url, date_iso).encode() + _CRLF
        + b"WARC-Date: " + date_iso.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
    )
    return headers + _CRLF + http + _CRLF + _CRLF


def render_warcinfo(filename: str) -> bytes:
    """The leading ``warcinfo`` record every real WARC file starts with —
    the scan must prove it skips non-response records."""
    body = (
        b"software: geokitten_spark warc writer\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + b"WARC-Record-ID: " + record_id_for("warcinfo:" + filename, "").encode() + _CRLF
        + b"WARC-Filename: " + filename.encode() + _CRLF
        + b"Content-Type: application/warc-fields\r\n"
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
    )
    return headers + _CRLF + body + _CRLF + _CRLF


def _gzip_member(data: bytes) -> bytes:
    """One gzip member via zlib (wbits=31 → gzip wrapper with MTIME=0 —
    deterministic, unlike the ``gzip`` module which stamps wall-clock)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def encode_warc(rows: Sequence[Tuple[str, str, bytes]],
                gzip_per_record: bool = True,
                filename: str = "data.warc.gz",
                content_encoding: str | None = None,
                chunked: bool = False) -> bytes:
    """Render (url, date_iso, html) rows into one WARC file's bytes:
    a warcinfo record then one response record per row, each its own gzip
    member when ``gzip_per_record`` (the Common Crawl layout).
    ``content_encoding``/``chunked`` shape the stored HTTP envelopes."""
    records = [render_warcinfo(filename)]
    records.extend(
        render_warc_record(u, d, h, content_encoding=content_encoding,
                           chunked=chunked)
        for u, d, h in rows
    )
    if gzip_per_record:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def split_gzip_members(data: bytes) -> List[Tuple[int, int]]:
    """Exact (offset, length) of every gzip member in a multi-member stream.

    This is the property that makes ``.warc.gz`` offset-splittable at
    scale: any member can be decompressed without touching the others, so
    a split planner can hand byte ranges to different tasks."""
    out: List[Tuple[int, int]] = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        d.decompress(data[pos:])
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        end = n - len(d.unused_data)
        out.append((pos, end - pos))
        pos = end
    return out


def _parse_plain_records(data: bytes) -> List[dict]:
    """Walk concatenated uncompressed WARC records."""
    out: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding CRLFs
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block at {pos}")
        header_block = data[pos:hdr_end]
        lines = header_block.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"missing WARC version line at {pos}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower().decode("ascii")] = v.strip().decode("utf-8")
        clen = int(fields["content-length"])
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        if len(payload) != clen:
            raise ValueError(f"truncated payload at {pos}")
        pos = hdr_end + 4 + clen
        rec = {
            "rec_type": fields.get("warc-type", ""),
            "record_id": fields.get("warc-record-id", ""),
            "url": fields.get("warc-target-uri"),
            "date": fields.get("warc-date"),
            "content_length": clen,
            "http_status": None,
            "html": None,
        }
        if rec["rec_type"] == "response" and fields.get(
                "content-type", "").startswith("application/http"):
            body_at = payload.find(b"\r\n\r\n")
            head = payload[:body_at] if body_at >= 0 else payload
            status_line = head.split(_CRLF, 1)[0]
            parts = status_line.split(b" ")
            rec["http_status"] = int(parts[1]) if len(parts) > 1 else None
            body = payload[body_at + 4:] if body_at >= 0 else b""
            hf = {}
            for line in head.split(_CRLF)[1:]:
                k, _, v = line.partition(b":")
                hf[k.strip().lower()] = v.strip().lower()
            # undo the stored transfer/content codings (real captures keep
            # the server's bytes verbatim — RFC 9112 chunked, gzip body)
            if hf.get(b"transfer-encoding") == b"chunked":
                body = _dechunk(body)
            if hf.get(b"content-encoding") == b"gzip":
                body = zlib.decompress(body, 31)
            rec["html"] = body
        out.append(rec)
    return out


def _dechunk(body: bytes) -> bytes:
    """Undo RFC 9112 §7.1 chunked transfer coding."""
    out = bytearray()
    i = 0
    while True:
        j = body.find(_CRLF, i)
        if j < 0:
            raise ValueError("unterminated chunk-size line")
        size = int(body[i:j].split(b";")[0], 16)
        i = j + 2
        if size == 0:
            return bytes(out)
        out += body[i:i + size]
        if body[i + size:i + size + 2] != _CRLF:
            raise ValueError("chunk data not CRLF-terminated")
        i += size + 2


def parse_warc_bytes(data: bytes) -> List[dict]:
    """Parse one WARC file's bytes (plain or gzip-per-record) into record
    dicts. A gzip member may hold one record (Common Crawl) or several."""
    if data[:2] == _GZ_MAGIC:
        chunks = []
        for off, length in split_gzip_members(data):
            chunks.append(zlib.decompress(data[off:off + length], 31))
        data = b"".join(chunks)
    return _parse_plain_records(data)


# ---------------------------------------------------------------------------
# scan
# ---------------------------------------------------------------------------

_SCAN_SCHEMA = StructType([
    StructField("file_name", StringType()),
    StructField("record_id", StringType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("http_status", IntegerType()),
    StructField("content_length", LongType()),
    StructField("html", BinaryType()),
])


def read_warc_dir(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` splits by file, decode is one
    map-only Arrow stage, output lands columnar for the extract/geocode/PIP
    pipeline. Non-response records are skipped; unreadable files yield no
    rows (same bad-file contract as the KML/GeoJSON scans).

    Memory shape: one input file is one Arrow row; the decoder yields one
    output batch per file so a task never holds more than one file's
    decoded records alongside its compressed bytes."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(p)
                try:
                    recs = parse_warc_bytes(bytes(content))
                except (ValueError, KeyError, zlib.error):
                    continue  # bad-file skip
                rows = [
                    (
                        fname,
                        r["record_id"],
                        r["url"],
                        pd.to_datetime(r["date"], format=_DATE_FMT),
                        r["http_status"],
                        r["content_length"],
                        r["html"],
                    )
                    for r in recs
                    if r["rec_type"] == "response"
                ]
                out = pd.DataFrame(
                    rows,
                    columns=[
                        "file_name", "record_id", "url", "warc_ts",
                        "http_status", "content_length", "html",
                    ],
                )
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
                out["http_status"] = out["http_status"].astype("int32")
                out["content_length"] = out["content_length"].astype("int64")
                yield out

    return binary.mapInPandas(run, schema=_SCAN_SCHEMA)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("n_records", LongType()),
    StructField("n_bytes", LongType()),
])


def write_warc_files(df: DataFrame, out_dir: str,
                     gzip_per_record: bool = True,
                     content_encoding: str | None = None,
                     chunked: bool = False) -> DataFrame:
    """Executor-side WARC export of a (url, warc_ts, html) DataFrame.

    Each task batch renders one ``.warc.gz`` named by (partition, batch) —
    no driver materialization of page bytes, no single-writer bottleneck;
    the returned manifest is O(#files) control-plane rows. Pair with
    ``df.repartition(n)`` upstream to set the file count/size (Common
    Crawl targets ~1 GiB per file)."""
    os.makedirs(out_dir, exist_ok=True)
    src = df.select(
        F.col("url").cast("string").alias("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_dt"),
        F.col("html").cast("binary").alias("html"),
    )

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        for bidx, pdf in enumerate(batches):
            if len(pdf) == 0:
                continue
            fname = f"part-{pid:05d}-{bidx:03d}.warc.gz"
            data = encode_warc(
                list(zip(pdf["url"], pdf["warc_dt"],
                         (bytes(h) for h in pdf["html"]))),
                gzip_per_record=gzip_per_record,
                filename=fname,
                content_encoding=content_encoding,
                chunked=chunked,
            )
            full = os.path.join(out_dir, fname)
            with open(full, "wb") as f:
                f.write(data)
            yield pd.DataFrame(
                [(full, len(pdf), len(data))],
                columns=["path", "n_records", "n_bytes"],
            )

    return src.mapInPandas(write, schema=_MANIFEST_SCHEMA)
