"""ListenRELP analog: streaming frame decoder (awkward chunking),
open/syslog/close dialogue with acks, error paths, spool landing."""

from __future__ import annotations

import pytest

from nifi_spark.sources.relp import (ListenRELPSource, RelpDecoder,
                                     RelpError, bytes_feed, encode_frame,
                                     serve_relp)


def _session(events, *, skip_open=False, extra=b""):
    raw = b""
    txnr = 1
    if not skip_open:
        raw += encode_frame(txnr, "open",
                            b"relp_version=0\ncommands=syslog")
        txnr += 1
    for e in events:
        raw += encode_frame(txnr, "syslog", e)
        txnr += 1
    raw += extra
    raw += encode_frame(txnr, "close", b"")
    return raw


def test_decoder_across_chunk_boundaries():
    raw = _session([b"<13>Jan  1 00:00:01 h app: one",
                    b"two with spaces  and  more",
                    b""])  # zero-length syslog frame
    for chunk in (1, 2, 3, 7, 1000):
        dec = RelpDecoder()
        frames = []
        r = bytes_feed(raw, chunk=chunk)
        while c := r(4096):
            frames.append(dec.feed(c))
        flat = [f for fs in frames for f in fs]
        assert [f.command for f in flat] == \
            ["open", "syslog", "syslog", "syslog", "close"]
        assert flat[1].data == b"<13>Jan  1 00:00:01 h app: one"
        assert flat[3].data == b""
        assert [f.txnr for f in flat] == [1, 2, 3, 4, 5]


def test_serve_acks_and_close():
    raw = _session([b"event A", b"event B"])
    out: list[bytes] = []
    got = serve_relp(bytes_feed(raw), out.append, sender="10.2.3.4:601")
    assert [(t, d) for t, _, d in got] == [(2, b"event A"),
                                           (3, b"event B")]
    replies = b"".join(out).decode()
    assert "1 rsp" in replies and "200 OK" in replies
    assert "relp_version=0" in replies          # open echoes offers
    assert "serverclose" in replies
    # every syslog txnr individually acked
    assert "2 rsp 6 200 OK" in replies and "3 rsp 6 200 OK" in replies


def test_syslog_before_open_is_error():
    raw = encode_frame(7, "syslog", b"early") + encode_frame(8, "close", b"")
    out: list[bytes] = []
    got = serve_relp(bytes_feed(raw), out.append)
    assert got == []
    assert b"7 rsp 9 500 ERROR" in b"".join(out)


def test_unknown_command_and_bad_trailer():
    raw = (encode_frame(1, "open", b"relp_version=0")
           + encode_frame(2, "blurb", b"x")
           + encode_frame(3, "close", b""))
    out: list[bytes] = []
    serve_relp(bytes_feed(raw), out.append)
    assert b"2 rsp 9 500 ERROR" in b"".join(out)
    dec = RelpDecoder()
    with pytest.raises(RelpError, match="trailer"):
        dec.feed(b"1 syslog 2 xyZ")   # 'Z' where LF belongs


def test_spool_landing(spark, tmp_path):
    src = ListenRELPSource(str(tmp_path / "spool"))
    n = src.drain_connection(
        bytes_feed(_session([b"m1", b"m2", b"m3"])), lambda b: None,
        sender="10.0.0.1:601")
    assert n == 3
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [(r.txnr, r.raw) for r in rows] == \
        [(2, "m1"), (3, "m2"), (4, "m3")]
    assert {r.sender for r in rows} == {"10.0.0.1:601"}
