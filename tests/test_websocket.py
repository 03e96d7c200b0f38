"""WebSocket (RFC 6455): accept-key vector, frame codec, masking
enforcement, fragmentation, ping/pong, close echo, spool landing."""

from __future__ import annotations

import io
import struct

import pytest

from nifi_spark.sources.websocket import (OP_BINARY, OP_TEXT, WsClient,
                                          WsError, ListenWebSocketSource,
                                          decode_frame, encode_frame,
                                          serve_websocket, ws_accept_key,
                                          ws_loopback)


def test_rfc6455_accept_key_vector():
    # the spec's own example (RFC 6455 §1.3)
    assert ws_accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def _reader(blob: bytes):
    bio = io.BytesIO(blob)
    return bio.read


@pytest.mark.parametrize("n", [0, 1, 125, 126, 65535, 65536, 70000])
def test_frame_codec_length_tiers(n):
    payload = bytes(i % 251 for i in range(n))
    # unmasked (server->client)
    fin, op, got = decode_frame(_reader(encode_frame(OP_BINARY, payload)))
    assert (fin, op, got) == (True, OP_BINARY, payload)
    # masked (client->server)
    frame = encode_frame(OP_TEXT, payload, mask=b"\xDE\xAD\xBE\xEF")
    fin, op, got = decode_frame(_reader(frame))
    assert got == payload
    if n:
        assert frame[-n:] != payload[-n:] or n == 0 or \
            all(b == 0 for b in payload)  # really masked on the wire


def test_loopback_messages_fragmentation_ping():
    read, write, join = ws_loopback()
    c = WsClient(read, write)
    c.send_text("hello")
    c.send_text("frag-mented message", fragment_at=5)
    c.send_binary(b"\x00\x01\x02", fragment_at=1)
    c.ping(b"tick")
    c.close()
    msgs = join()
    assert msgs == [(OP_TEXT, b"hello"),
                    (OP_TEXT, b"frag-mented message"),
                    (OP_BINARY, b"\x00\x01\x02")]


def test_unmasked_client_frame_is_protocol_error():
    read, write, join = ws_loopback()
    c = WsClient(read, write)
    write(encode_frame(OP_TEXT, b"illegal unmasked"))   # no mask
    # server sends a 1002 close before dying (read before join closes a)
    fin, op, payload = decode_frame(read)
    assert op == 0x8 and struct.unpack(">H", payload)[0] == 1002
    with pytest.raises(WsError, match="not masked"):
        join()


def test_handshake_rejections():
    read, write, join = ws_loopback(path="/only")
    with pytest.raises(WsError, match="rejected"):
        WsClient(read, write, path="/other")
    with pytest.raises(WsError, match="unknown path"):
        join()


def test_spool_landing(spark, tmp_path):
    import socket
    import threading
    src = ListenWebSocketSource(str(tmp_path / "spool"))
    a, b = socket.socketpair()
    n_landed = []

    def run():
        n_landed.append(src.drain_connection(b.recv, b.sendall))
        b.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    c = WsClient(a.recv, a.sendall)
    c.send_text("alpha")
    c.send_binary(b"\xCA\xFE")
    c.send_text("beta")
    c.close()
    t.join(20)
    a.close()
    assert n_landed == [3]
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [(r.kind, r.text) for r in rows] == \
        [("text", "alpha"), ("binary", None), ("text", "beta")]
    assert bytes(rows[1].data) == b"\xCA\xFE"
