"""WARC (ISO 28500) web-archive codec + CommonCrawl-style WET ingestion.

Training-data pipelines start from web archives: CommonCrawl publishes
WARC files (raw HTTP captures) and WET files (plain-text "conversion"
records). This module is the ingestion seam for that layout:

* ``build_warc`` writes spec-conformant WARC/1.0 records — ``warcinfo``,
  ``response`` (payload = full HTTP response), ``conversion`` (WET plain
  text with ``WARC-Refers-To``) — either as one plain stream or as one
  gzip member PER RECORD (the CommonCrawl layout; ISO 28500-2 allows
  member-per-record so readers can seek without decompressing the file).
* ``parse_warc`` walks the records back out of either layout (multi-member
  gzip is sniffed and decompressed member-by-member).
* ``split_warc`` is the Spark operator: one input row per archive blob →
  one output row per record, Arrow-batched over ``mapInPandas`` exactly
  like a production CommonCrawl ingest (one task per WARC shard; at
  100 TB the unit of parallelism IS the archive file, so no shuffle is
  needed — parsing is embarrassingly parallel).
* ``synthesize_warc`` builds fixtures THROUGH the real writer from
  closed-form formulas, so the driver gate's DuckDB oracle regenerates
  every record's uri/status/text (and its md5) in pure SQL.

Reference analog: NiFi 1.1.2 has no WARC processor; this lives under the
task brief's training-data-pipeline mandate (SURVEY.md §2.13). The
record-splitting contract (fragment ids, one row per record) mirrors
SplitContent/UnpackContent (`standard/UnpackContent.java:1-60`).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

CRLF = b"\r\n"
_VERSION = b"WARC/1.0"


def _record_id(payload: bytes, salt: bytes) -> str:
    """Deterministic RFC-4122-shaped id from the payload digest (the spec
    only requires global uniqueness; hash-derived ids keep fixtures and
    re-runs byte-identical, unlike uuid4)."""
    h = hashlib.md5(salt + payload).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>")


def build_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Write WARC/1.0. Each record dict: ``type`` (warcinfo | response |
    conversion | request | metadata), ``payload`` bytes, optional ``uri``,
    ``date`` (ISO-8601 Z), ``content_type``, ``refers_to``, ``headers``
    (extra name→value pairs)."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        rtype = rec["type"]
        hdrs: list[tuple[str, str]] = [
            ("WARC-Type", rtype),
            ("WARC-Record-ID", _record_id(payload, str(i).encode())),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
        ]
        if rec.get("uri"):
            hdrs.append(("WARC-Target-URI", rec["uri"]))
        if rec.get("refers_to"):
            hdrs.append(("WARC-Refers-To", rec["refers_to"]))
        default_ct = {"response": "application/http; msgtype=response",
                      "request": "application/http; msgtype=request",
                      "warcinfo": "application/warc-fields"}.get(
                          rtype, "text/plain")
        hdrs.append(("Content-Type", rec.get("content_type", default_ct)))
        for k, v in rec.get("headers", {}).items():
            hdrs.append((k, v))
        hdrs.append(("Content-Length", str(len(payload))))

        block = bytearray(_VERSION + CRLF)
        for k, v in hdrs:
            block += f"{k}: {v}".encode() + CRLF
        block += CRLF + payload + CRLF + CRLF
        if gzip_per_record:
            # mtime=0 => deterministic member bytes
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bytes(block))
            out += buf.getvalue()
        else:
            out += block
    return bytes(out)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (CommonCrawl layout)."""
    out = bytearray()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(blob[pos:])
        tail = d.unused_data
        pos = len(blob) - len(tail)
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
    return bytes(out)


def parse_warc(blob: bytes) -> list[dict]:
    """Parse a WARC blob (plain or member-per-record gzip) into records:
    ``{type, uri, record_id, date, content_type, headers, payload}``."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and blob[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        eol = blob.index(CRLF, pos)
        version = blob[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = blob.index(CRLF, pos)
            line = blob[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, _, value = line.partition(b":")
            headers[name.decode().strip()] = value.decode().strip()
        length = int(headers["Content-Length"])
        payload = blob[pos:pos + length]
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        pos += length
        records.append({
            "type": headers.get("WARC-Type", ""),
            "uri": headers.get("WARC-Target-URI"),
            "record_id": headers.get("WARC-Record-ID", ""),
            "date": headers.get("WARC-Date", ""),
            "content_type": headers.get("Content-Type", ""),
            "headers": headers,
            "payload": payload,
        })
    return records


def http_body(payload: bytes) -> tuple[int, bytes]:
    """Split an HTTP response payload into (status_code, body)."""
    head, _, body = payload.partition(b"\r\n\r\n")
    status_line = head.split(b"\r\n", 1)[0]
    parts = status_line.split(b" ")
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    return int(parts[1]), body


# ------------------------------------------------------------- Spark seam

_SPLIT_SCHEMA = ("id long, rec_idx int, rec_type string, target_uri string, "
                 "http_status int, payload_len int, payload_md5 string, "
                 "text string")


def split_warc(df: DataFrame, content_col: str = "payload",
               id_col: str = "id") -> DataFrame:
    """One row per WARC record. For ``response`` records the HTTP envelope
    is stripped and ``text``/``payload_md5``/``payload_len`` describe the
    BODY; for ``conversion`` (WET) and ``warcinfo`` they describe the
    record block itself. Arrow-batched; a bad archive yields a single
    ``rec_type='error'`` row instead of failing the task
    (quarantine-friendly, same contract as decode_media_stats)."""
    import pandas as pd

    cols = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(content_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf["id"], pdf["payload"]):
                rid = int(rid)
                try:
                    for i, rec in enumerate(parse_warc(bytes(blob))):
                        status = None
                        body = rec["payload"]
                        if rec["type"] == "response":
                            status, body = http_body(body)
                        try:
                            text = body.decode("utf-8")
                        except UnicodeDecodeError:
                            text = None
                        rows.append((rid, i, rec["type"], rec["uri"],
                                     status, len(body),
                                     hashlib.md5(body).hexdigest(), text))
                except Exception as e:  # noqa: BLE001 — quarantine row
                    rows.append((rid, -1, "error", None, None, None,
                                 None, str(e)))
            yield pd.DataFrame(rows, columns=[
                "id", "rec_idx", "rec_type", "target_uri", "http_status",
                "payload_len", "payload_md5", "text"])

    return cols.mapInPandas(run, schema=_SPLIT_SCHEMA)


def wet_documents(df: DataFrame, content_col: str = "payload",
                  id_col: str = "id") -> DataFrame:
    """CommonCrawl WET ingest: conversion records only, shaped like the
    ``documents`` table (doc_id, url, text) so every downstream datalib
    operator (dedup/quality/lang-id/scrub) composes directly. doc_id packs
    (archive id, record index) into one BIGINT — reproducible in SQL as
    ``id * 1000 + rec_idx``, and collision-free only while archives hold
    < 1000 records, so that bound is enforced IN-PLAN (ANSI assert_true):
    a >=1000-record archive throws instead of silently colliding."""
    recs = split_warc(df, content_col, id_col)
    doc_id = F.when(
        F.assert_true(
            F.col("rec_idx") < 1000,
            F.concat(F.lit("wet_documents: archive "),
                     F.col("id").cast("string"),
                     F.lit(" has >= 1000 records — doc_id packing would "
                           "collide"))).isNull(),
        F.col("id") * 1000 + F.col("rec_idx"))
    return (recs.where(F.col("rec_type") == "conversion")
            .select(doc_id.alias("doc_id"),
                    F.col("target_uri").alias("url"),
                    F.col("text")))


# ------------------------------------------------------------- fixtures

def _synth_text(i: int, j: int) -> str:
    """Closed-form WET text (SQL twin in the gate oracle):
    tokens 'w<(i*13 + j*29 + k*7) % 101>' for k in range(20 + (i+j) % 11)."""
    n = 20 + (i + j) % 11
    return " ".join(f"w{(i * 13 + j * 29 + k * 7) % 101}" for k in range(n))


def _synth_warc(i: int) -> bytes:
    k = 1 + i % 3
    records: list[dict] = [{
        "type": "warcinfo",
        "payload": (f"software: nifi_spark warc writer\r\n"
                    f"isPartOf: crawl-{i % 7}\r\n").encode(),
    }]
    for j in range(k):
        uri = f"https://site{(i * 7 + j) % 50}/page{j}"
        text = _synth_text(i, j)
        body = f"<html><body>{text}</body></html>".encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        records.append({"type": "response", "uri": uri, "payload": http})
    for j in range(k):
        uri = f"https://site{(i * 7 + j) % 50}/page{j}"
        records.append({"type": "conversion", "uri": uri,
                        "content_type": "text/plain",
                        "payload": _synth_text(i, j).encode(),
                        "refers_to": f"<urn:ref:{i}-{j}>"})
    return build_warc(records, gzip_per_record=i % 2 == 1)


def synthesize_warc(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: CommonCrawl-shaped archives through the REAL writer
    — warcinfo + K response + K conversion records per id (K = 1 + id%3),
    odd ids gzip member-per-record. Formula contract at _synth_warc /
    _synth_text; the gate oracle regenerates text via string_agg."""
    import pandas as pd

    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), _synth_warc(int(i))) for i in pdf["id"]],
                columns=["id", "payload"])

    return ids.mapInPandas(gen, schema="id long, payload binary")
