"""ListenLumberjack analog: frame codec (plain + compressed), window
acks, line/fields split, spool landing."""

from __future__ import annotations

import struct

import pytest

from nifi_spark.sources.lumberjack import (ListenLumberjackSource,
                                           LumberjackError,
                                           encode_compressed_frame,
                                           encode_data_frame,
                                           encode_window_frame,
                                           serve_lumberjack)


def _feed(data: bytes, chunk: int = 5):
    pos = 0

    def read(n: int) -> bytes:
        nonlocal pos
        out = data[pos:pos + min(n, chunk)]
        pos += len(out)
        return out

    return read


def test_data_frames_and_window_acks():
    raw = encode_window_frame(2)
    for i in range(1, 6):
        raw += encode_data_frame(i, {"line": f"event {i}",
                                     "host": f"h{i % 2}",
                                     "offset": str(i * 10)})
    out: list[bytes] = []
    events = serve_lumberjack(_feed(raw), out.append)
    assert [e.seq for e in events] == [1, 2, 3, 4, 5]
    assert events[0].line == "event 1"
    assert events[0].fields == {"host": "h1", "offset": "10"}
    acks = b"".join(out)
    # windows of 2: acks at seq 2, 4, and the EOF tail ack at 5
    assert acks == (b"1A" + struct.pack(">I", 2)
                    + b"1A" + struct.pack(">I", 4)
                    + b"1A" + struct.pack(">I", 5))


def test_compressed_frame_with_embedded_data_frames():
    inner = b"".join(encode_data_frame(i, {"line": f"c{i}"})
                     for i in range(1, 4))
    raw = encode_window_frame(10) + encode_compressed_frame(inner)
    out: list[bytes] = []
    events = serve_lumberjack(_feed(raw, chunk=3), out.append)
    assert [(e.seq, e.line) for e in events] == \
        [(1, "c1"), (2, "c2"), (3, "c3")]
    assert b"".join(out) == b"1A" + struct.pack(">I", 3)


def test_protocol_errors():
    with pytest.raises(LumberjackError, match="version"):
        serve_lumberjack(_feed(b"2D1234"), lambda b: None)
    with pytest.raises(LumberjackError, match="unknown frame"):
        serve_lumberjack(_feed(b"1Zxx"), lambda b: None)
    with pytest.raises(LumberjackError, match="mid-frame"):
        serve_lumberjack(_feed(b"1W\x00\x00"), lambda b: None)


def test_spool_landing(spark, tmp_path):
    src = ListenLumberjackSource(str(tmp_path / "spool"))
    raw = encode_window_frame(3)
    for i in range(1, 4):
        raw += encode_data_frame(i, {"line": f"log line {i}",
                                     "file": "/var/log/app.log"})
    assert src.drain_connection(_feed(raw), lambda b: None) == 3
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [r.line for r in rows] == ["log line 1", "log line 2",
                                      "log line 3"]
    assert rows[0].fields == {"file": "/var/log/app.log"}
    assert [r.seq for r in rows] == [1, 2, 3]
