"""ListenHTTP / HandleHttpRequest analog — an HTTP/1.1 receiver
draining POSTed payloads to parquet spool.

NiFi ancestors: ListenHTTP (standard/servlets/ListenHTTPServlet.java —
POST /contentListener; Content-Types application/flowfile-v1/v2/v3
unpack to multiple FlowFiles, anything else lands raw; 200 on accept,
405 elsewhere) and HandleHttpRequest.java:96-105,521-585 (attribute
surface: method, request URI, query string, plus one attribute per
header under ``http.headers.*``).

The parser implements the HTTP/1.1 server subset a landing endpoint
needs: request line + headers, bodies by Content-Length or chunked
transfer-encoding (trailer-tolerant), keep-alive with Connection: close
honoring, 100-continue expectation acks, 413 over max_body, 405 for
non-POST. Transport = injectable (read(n) bytes, write(bytes)) like
every bridge here. Landed rows: method/uri/query/content_type, the
header map, body BINARY; flowfile-v* POSTs compose with
operators.flowfile_pack.unpack_flowfiles downstream — exactly the
servlet's unpackager split, but as a distributed scan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

_SPOOL_SCHEMA = ("batch_id bigint, msg_idx bigint, method string, "
                 "uri string, query_string string, "
                 "headers map<string,string>, content_type string, "
                 "body binary")

FLOWFILE_V3 = "application/flowfile-v3"


class HttpParseError(ValueError):
    pass


@dataclass
class HttpRequest:
    method: str
    uri: str
    query_string: str
    headers: dict[str, str]
    body: bytes

    @property
    def content_type(self) -> str:
        return self.headers.get("content-type", "")


class _LineReader:
    """read(n) adapter with buffered CRLF line reads."""

    def __init__(self, read):
        self._read = read
        self._buf = bytearray()

    def line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._read(4096)
            if not chunk:
                out = bytes(self._buf)
                self._buf.clear()
                return out
            self._buf.extend(chunk)
        i = self._buf.index(b"\r\n")
        out = bytes(self._buf[:i])
        del self._buf[:i + 2]
        return out

    def exactly(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._read(65536)
            if not chunk:
                raise HttpParseError("connection closed mid-body")
            self._buf.extend(chunk)
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def serve_http(read, write, *, max_body: int = 64 * 1024 * 1024
               ) -> list[HttpRequest]:
    """Serve ONE connection (keep-alive loop) until close/EOF. POSTs
    are accepted (200) and returned; other methods get 405 and are not
    landed; an oversized body gets 413 and closes the connection."""
    r = _LineReader(read)
    accepted: list[HttpRequest] = []

    def respond(status: str, body: bytes = b"",
                close: bool = False) -> None:
        head = (f"HTTP/1.1 {status}\r\n"
                f"Content-Length: {len(body)}\r\n"
                + ("Connection: close\r\n" if close else "")
                + "\r\n")
        write(head.encode() + body)

    while True:
        line = r.line()
        if not line:
            return accepted
        parts = line.decode("latin-1").split(" ")
        if len(parts) != 3 or not parts[2].startswith("HTTP/1."):
            respond("400 Bad Request", b"bad request line", close=True)
            return accepted
        method, target, _version = parts
        headers: dict[str, str] = {}
        while True:
            h = r.line()
            if h == b"":
                break
            if b":" not in h:
                respond("400 Bad Request", b"bad header", close=True)
                return accepted
            k, v = h.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
        if headers.get("expect", "").lower() == "100-continue":
            write(b"HTTP/1.1 100 Continue\r\n\r\n")
        # body framing
        body = b""
        if headers.get("transfer-encoding", "").lower() == "chunked":
            chunks = bytearray()
            while True:
                size_line = r.line().split(b";")[0].strip()
                size = int(size_line, 16)
                if size == 0:
                    while r.line() != b"":   # trailers
                        pass
                    break
                if len(chunks) + size > max_body:
                    respond("413 Payload Too Large", close=True)
                    return accepted
                chunks += r.exactly(size)
                r.exactly(2)                 # chunk CRLF
            body = bytes(chunks)
        elif "content-length" in headers:
            n = int(headers["content-length"])
            if n > max_body:
                respond("413 Payload Too Large", close=True)
                return accepted
            body = r.exactly(n)
        uri, _, query = target.partition("?")
        if method.upper() == "POST":
            accepted.append(HttpRequest(method.upper(), uri, query,
                                        headers, body))
            respond("200 OK", b"Accepted")
        elif method.upper() == "HEAD":
            respond("200 OK")
        else:
            # the servlet is POST-only (ListenHTTPServlet doPost)
            respond("405 Method Not Allowed", b"POST only")
        if headers.get("connection", "").lower() == "close":
            return accepted


def requests_feed(data: bytes):
    """Scripted raw-bytes client for tests: a read(n) over the blob."""
    view = memoryview(data)
    pos = 0

    def read(n: int) -> bytes:
        nonlocal pos
        out = bytes(view[pos:pos + n])
        pos += len(out)
        return out

    return read


class ListenHTTPSource:
    """Drain-to-spool bridge (listen.py pattern): one served connection
    → one spool file of accepted POSTs."""

    _MAX_PER_BATCH = 1_000_000

    def __init__(self, spool_dir: str, *,
                 max_body: int = 64 * 1024 * 1024):
        self.spool_dir = spool_dir
        self.max_body = max_body
        os.makedirs(spool_dir, exist_ok=True)
        pat = re.compile(r"batch_(\d{8})\.parquet$")
        ids = [int(m.group(1)) for f in os.listdir(spool_dir)
               if (m := pat.match(f))]
        self._next_batch = max(ids) + 1 if ids else 0

    def drain_connection(self, read, write) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        reqs = serve_http(read, write, max_body=self.max_body)
        if not reqs:
            return 0
        bid = self._next_batch
        table = pa.table({
            "batch_id": pa.array([bid] * len(reqs), pa.int64()),
            "msg_idx": pa.array(range(len(reqs)), pa.int64()),
            "method": pa.array([q.method for q in reqs], pa.string()),
            "uri": pa.array([q.uri for q in reqs], pa.string()),
            "query_string": pa.array([q.query_string for q in reqs],
                                     pa.string()),
            "headers": pa.array([list(q.headers.items()) for q in reqs],
                                pa.map_(pa.string(), pa.string())),
            "content_type": pa.array([q.content_type for q in reqs],
                                     pa.string()),
            "body": pa.array([q.body for q in reqs], pa.binary()),
        })
        final = os.path.join(self.spool_dir, f"batch_{bid:08d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.rename(tmp, final)
        self._next_batch = bid + 1
        return len(reqs)

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.schema(_SPOOL_SCHEMA).parquet(self.spool_dir)
        return df.withColumn(
            "msg_seq",
            F.col("batch_id") * self._MAX_PER_BATCH + F.col("msg_idx"))
