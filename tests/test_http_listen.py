"""ListenHTTP/HandleHttpRequest analog: request parsing (content-length
+ chunked + keep-alive + 100-continue), method/size guards, spool
landing, and the flowfile-v3 upload → unpack composition."""

from __future__ import annotations

import pytest

from nifi_spark.sources.http_listen import (HttpRequest, ListenHTTPSource,
                                            requests_feed, serve_http)


def _serve(raw: bytes, **kw):
    out: list[bytes] = []
    reqs = serve_http(requests_feed(raw), out.append, **kw)
    return reqs, b"".join(out).decode("latin-1")


def test_post_content_length_and_attributes():
    raw = (b"POST /contentListener?x=1&y=2 HTTP/1.1\r\n"
           b"Host: h\r\nContent-Type: text/plain\r\n"
           b"X-My-Header: abc\r\nContent-Length: 5\r\n\r\nhello"
           b"GET /status HTTP/1.1\r\nHost: h\r\n\r\n"
           b"POST /p HTTP/1.1\r\nContent-Length: 0\r\n"
           b"Connection: close\r\n\r\n")
    reqs, replies = _serve(raw)
    assert [r.method for r in reqs] == ["POST", "POST"]
    q = reqs[0]
    assert (q.uri, q.query_string) == ("/contentListener", "x=1&y=2")
    assert q.headers["x-my-header"] == "abc"
    assert q.body == b"hello"
    assert q.content_type == "text/plain"
    assert replies.count("200 OK") == 2
    assert "405 Method Not Allowed" in replies


def test_chunked_body_and_100_continue():
    raw = (b"POST /c HTTP/1.1\r\nExpect: 100-continue\r\n"
           b"Transfer-Encoding: chunked\r\n\r\n"
           b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
           b"POST /c2 HTTP/1.1\r\nTransfer-Encoding: chunked\r\n"
           b"Connection: close\r\n\r\n"
           b"3;ext=1\r\nabc\r\n0\r\nTrailer: t\r\n\r\n")
    reqs, replies = _serve(raw)
    assert reqs[0].body == b"Wikipedia"
    assert reqs[1].body == b"abc"
    assert "100 Continue" in replies


def test_size_guard_and_bad_request():
    raw = (b"POST /big HTTP/1.1\r\nContent-Length: 999\r\n\r\n")
    reqs, replies = _serve(raw, max_body=10)
    assert reqs == [] and "413" in replies
    reqs, replies = _serve(b"garbage\r\n\r\n")
    assert reqs == [] and "400" in replies


def test_spool_and_flowfile_v3_unpack(spark, tmp_path):
    from pyspark.sql import functions as F

    from nifi_spark.operators import package_flowfiles, unpack_flowfiles

    # build a real flowfile-v3 stream with two packaged rows
    src_df = spark.createDataFrame(
        [("a", "first payload"), ("b", "second payload")],
        "name string, data string")
    packed = package_flowfiles(
        src_df.select("name", F.col("data").cast("binary").alias("bin")),
        "bin", attr_cols=["name"], version=3,
        group_cols=[]).collect()
    stream = b"".join(bytes(r.package) for r in packed)

    raw = (b"POST /contentListener HTTP/1.1\r\n"
           b"Content-Type: application/flowfile-v3\r\n"
           + f"Content-Length: {len(stream)}\r\n\r\n".encode() + stream
           + b"POST /raw HTTP/1.1\r\nContent-Type: text/csv\r\n"
           b"Content-Length: 3\r\nConnection: close\r\n\r\na,b")
    src = ListenHTTPSource(str(tmp_path / "spool"))
    assert src.drain_connection(requests_feed(raw),
                                lambda b: None) == 2
    df = src.read(spark)
    rows = df.orderBy("msg_seq").collect()
    assert rows[0].content_type == "application/flowfile-v3"
    assert bytes(rows[1].body) == b"a,b"
    # the servlet's unpackager split, as a distributed op
    ff = df.filter(F.col("content_type") == "application/flowfile-v3")
    un = unpack_flowfiles(ff, "body", id_cols=["msg_seq"])
    got = sorted((r.attributes["name"], bytes(r.content).decode())
                 for r in un.collect())
    assert got == [("a", "first payload"), ("b", "second payload")]


# ------------------ HandleHttpRequest / HandleHttpResponse pairing


def _web_service(raw: bytes, ctx=None, **kw):
    from nifi_spark.sources.http_listen import (HttpContextMap,
                                                handle_http_requests)
    ctx = ctx or HttpContextMap()
    out: list[bytes] = []
    rows = handle_http_requests(requests_feed(raw), out.append,
                                ctx, **kw)
    return ctx, rows, out


def test_web_service_roundtrip():
    from nifi_spark.sources.http_listen import handle_http_response
    raw = (b"GET /api/a?q=1 HTTP/1.1\r\nHost: h\r\n\r\n"
           b"POST /api/b HTTP/1.1\r\nContent-Length: 3\r\n"
           b"Connection: close\r\n\r\nxyz")
    ctx, rows, out = _web_service(raw)
    # no response written yet (parked in the context map)
    assert b"".join(out) == b""
    assert ctx.outstanding() == 2
    assert rows[0]["http.method"] == "GET"
    assert rows[0]["http.request.uri"] == "/api/a"
    assert rows[0]["http.query.string"] == "q=1"
    assert rows[1]["content"] == b"xyz"
    res = handle_http_response(
        rows, ctx, status_code=200,
        body=lambda r: f"echo:{r['http.request.uri']}")
    assert [rel for _, rel in res] == ["success", "success"]
    reply = b"".join(out).decode("latin-1")
    assert "echo:/api/a" in reply and "echo:/api/b" in reply
    assert ctx.outstanding() == 0
    assert [c for _, c in ctx.completed] == [200, 200]


def test_web_service_failure_routes():
    from nifi_spark.sources.http_listen import (HttpContextMap,
                                                handle_http_response)
    ctx = HttpContextMap()
    rows = [{"content": b""},                                # no id
            {"http.context.identifier": "ctx-99999999"},     # unknown
            {"http.context.identifier": "x", "sc": "NaN"}]
    res = handle_http_response(rows[:2], ctx, status_code=200)
    assert [rel for _, rel in res] == ["failure", "failure"]
    res = handle_http_response(rows[2:], ctx,
                               status_code=lambda r: r["sc"])
    assert res[0][1] == "failure"


def test_web_service_backpressure_503():
    from nifi_spark.sources.http_listen import HttpContextMap
    ctx = HttpContextMap(max_outstanding=1)
    raw = (b"GET /a HTTP/1.1\r\nHost: h\r\n\r\n"
           b"GET /b HTTP/1.1\r\nHost: h\r\n\r\n")
    ctx, rows, out = _web_service(raw, ctx=ctx)
    assert len(rows) == 1
    assert b"503 Service Unavailable" in b"".join(out)
