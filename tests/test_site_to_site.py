"""Site-to-Site wire protocol: codec framing, reference-byte-parity
transaction sequences (the TestSocketClientTransaction pattern —
pre-staged server bytes, asserted client bytes), and full
client↔server loopback over a socketpair."""

from __future__ import annotations

import io
import struct
import zlib

import pytest

from nifi_spark.sources.site_to_site import (DataPacket, S2SClient,
                                             S2SPort, S2SProtocolError,
                                             S2STransaction,
                                             decode_packet, encode_packet,
                                             loopback_serve, read_response,
                                             read_utf, write_response,
                                             write_utf)


class _Out:
    def __init__(self):
        self.buf = io.BytesIO()

    def write(self, d):
        self.buf.write(d)

    def flush(self):
        pass

    def value(self):
        return self.buf.getvalue()


def test_java_utf_roundtrip():
    for s in ("SEND_FLOWFILES", "", "héllo", "a\x00b", "emoji \U0001F600"):
        out = _Out()
        write_utf(out, s)
        assert read_utf(io.BytesIO(out.value())) == s
    # plain-ASCII framing is 2-byte length + bytes (DataOutputStream)
    out = _Out()
    write_utf(out, "NiFi")
    assert out.value() == b"\x00\x04NiFi"
    # modified UTF-8: NUL encodes as C0 80, never a raw 0 byte
    out = _Out()
    write_utf(out, "\x00")
    assert out.value() == b"\x00\x02\xc0\x80"


def test_codec_roundtrip_and_limits():
    p = DataPacket({"path": "./", "uuid": "u-1"}, b"hello bytes")
    out = _Out()
    encode_packet(p, out)
    got = decode_packet(io.BytesIO(out.value()))
    assert got.attributes == p.attributes
    assert got.content == p.content
    assert decode_packet(io.BytesIO(b"")) is None      # EOF → None
    too_many = struct.pack(">i", 25001)
    with pytest.raises(S2SProtocolError, match="maximum number"):
        decode_packet(io.BytesIO(too_many))


def _packet_bytes(content: bytes, attrs=None) -> bytes:
    out = _Out()
    encode_packet(DataPacket(attrs or {}, content), out)
    return out.value()


def test_receive_one_flowfile_reference_bytes():
    """Byte-for-byte the reference's testReceiveOneFlowFile: server
    sends MORE_DATA, packet, FINISH_TRANSACTION, CONFIRM_TRANSACTION;
    client must send RECEIVE_FLOWFILES, CONFIRM_TRANSACTION(crc),
    TRANSACTION_FINISHED."""
    pkt = _packet_bytes(b"contents on server 1")
    server = _Out()
    write_response(server, "MORE_DATA")
    server.write(pkt)
    write_response(server, "FINISH_TRANSACTION")
    write_response(server, "CONFIRM_TRANSACTION",
                   "Checksum has been verified at server.")
    inp = io.BytesIO(server.value())
    out = _Out()
    tx = S2STransaction(inp, out, "receive")
    p = tx.receive()
    assert p.content == b"contents on server 1"
    assert tx.state == "DATA_EXCHANGED"
    assert tx.receive() is None
    tx.confirm()
    assert tx.state == "TRANSACTION_CONFIRMED"
    done = tx.complete()
    assert done == {"backoff": False, "packets": 1,
                    "bytes": len(b"contents on server 1")}
    sent = io.BytesIO(out.value())
    assert read_utf(sent) == "RECEIVE_FLOWFILES"
    code, crc = read_response(sent)
    assert code == "CONFIRM_TRANSACTION"
    assert crc == str(zlib.crc32(pkt))
    assert read_response(sent)[0] == "TRANSACTION_FINISHED"
    assert sent.read() == b""


def test_receive_zero_flowfiles_reference_bytes():
    server = _Out()
    write_response(server, "NO_MORE_DATA")
    out = _Out()
    tx = S2STransaction(io.BytesIO(server.value()), out, "receive")
    assert tx.receive() is None
    tx.confirm()
    done = tx.complete()
    assert done["packets"] == 0
    sent = io.BytesIO(out.value())
    assert read_utf(sent) == "RECEIVE_FLOWFILES"
    assert sent.read() == b""          # nothing more from client


def test_send_two_flowfiles_reference_bytes():
    """testSendTwoFlowFiles: client sends SEND_FLOWFILES, p1, CONTINUE,
    p2, FINISH, then on matching CRC echoes CONFIRM_TRANSACTION."""
    p1 = _packet_bytes(b"contents on client 1")
    p2 = _packet_bytes(b"contents on client 2")
    crc = zlib.crc32(p2, zlib.crc32(p1))
    server = _Out()
    write_response(server, "CONFIRM_TRANSACTION", str(crc))
    write_response(server, "TRANSACTION_FINISHED")
    out = _Out()
    tx = S2STransaction(io.BytesIO(server.value()), out, "send")
    tx.send(b"contents on client 1", {})
    tx.send(b"contents on client 2", {})
    tx.confirm()
    done = tx.complete()
    assert done == {"backoff": False, "packets": 2, "bytes": 40}
    sent = io.BytesIO(out.value())
    assert read_utf(sent) == "SEND_FLOWFILES"
    assert sent.read(len(p1)) == p1
    assert read_response(sent)[0] == "CONTINUE_TRANSACTION"
    assert sent.read(len(p2)) == p2
    assert read_response(sent)[0] == "FINISH_TRANSACTION"
    assert read_response(sent)[0] == "CONFIRM_TRANSACTION"


def test_send_bad_checksum_reference_bytes():
    server = _Out()
    write_response(server, "CONFIRM_TRANSACTION", "wrong-crc")
    out = _Out()
    tx = S2STransaction(io.BytesIO(server.value()), out, "send")
    tx.send(b"x", {})
    with pytest.raises(S2SProtocolError, match="CRC mismatch"):
        tx.confirm()
    assert tx.state == "ERROR"
    with pytest.raises(S2SProtocolError, match="cannot complete"):
        tx.complete()
    sent = io.BytesIO(out.value())
    read_utf(sent)
    sent.read(len(_packet_bytes(b"x")))
    assert read_response(sent)[0] == "FINISH_TRANSACTION"
    assert read_response(sent)[0] == "BAD_CHECKSUM"


def test_destination_full_sets_backoff():
    p = _packet_bytes(b"x")
    server = _Out()
    write_response(server, "CONFIRM_TRANSACTION", str(zlib.crc32(p)))
    write_response(server, "TRANSACTION_FINISHED_BUT_DESTINATION_FULL")
    tx = S2STransaction(io.BytesIO(server.value()), _Out(), "send")
    tx.send(b"x", {})
    tx.confirm()
    assert tx.complete()["backoff"] is True


# ------------------------------------------------- loopback sessions

def test_loopback_send_and_receive():
    port = S2SPort("port-1",
                   to_send=[DataPacket({"n": "1"}, b"from server A"),
                            DataPacket({"n": "2"}, b"from server B")])
    inp, out, join = loopback_serve({"port-1": port})
    client = S2SClient(inp, out, port_identifier="port-1")
    assert client.version == 5
    assert client.codec_version == 1

    tx = client.create_transaction("send")
    tx.send(b"payload-1", {"k": "a"})
    tx.send(b"payload-2", {"k": "b"})
    tx.confirm()
    assert tx.complete()["packets"] == 2

    rx = client.create_transaction("receive")
    got = []
    while (p := rx.receive()) is not None:
        got.append(p)
    rx.confirm()
    assert rx.complete()["packets"] == 2
    client.shutdown()
    join()
    assert [p.content for p in port.received] == [b"payload-1",
                                                  b"payload-2"]
    assert [p.attributes["k"] for p in port.received] == ["a", "b"]
    assert [p.content for p in got] == [b"from server A",
                                        b"from server B"]
    assert not port.to_send                      # drained


def test_loopback_version_negotiation_down():
    port = S2SPort("p")
    inp, out, join = loopback_serve({"p": port}, )
    client = S2SClient(inp, out, port_identifier="p")
    client.shutdown()
    join()
    assert client.version == 5


def test_loopback_unknown_port():
    inp, out, join = loopback_serve({"p": S2SPort("p")})
    with pytest.raises(Exception):
        S2SClient(inp, out, port_identifier="nope")
    with pytest.raises(S2SProtocolError, match="unknown port"):
        join()


def test_loopback_backpressure_backoff():
    """Back-pressure analog: the send lands, but the client gets
    backoff=True once the port's object threshold is crossed."""
    port = S2SPort("p", backpressure_object_threshold=2)
    inp, out, join = loopback_serve({"p": port})
    client = S2SClient(inp, out, port_identifier="p")
    tx = client.create_transaction("send")
    tx.send(b"a", {})
    tx.confirm()
    assert tx.complete()["backoff"] is False
    tx = client.create_transaction("send")
    tx.send(b"b", {})
    tx.send(b"c", {})
    tx.confirm()
    assert tx.complete()["backoff"] is True      # landed, but penalized
    client.shutdown()
    join()
    assert [p.content for p in port.received] == [b"a", b"b", b"c"]


def test_loopback_peer_list():
    port = S2SPort("p")
    inp, out, join = loopback_serve({"p": port})
    client = S2SClient(inp, out, port_identifier="p")
    tx = client.create_transaction("send")
    tx.send(b"x", {})
    tx.confirm()
    tx.complete()
    peers = client.request_peer_list()
    client.shutdown()
    join()
    assert peers == [{"hostname": "localhost", "port": 0,
                      "secure": False, "flowfile_count": 1}]


def test_loopback_cancel_lands_nothing():
    port = S2SPort("p")
    inp, out, join = loopback_serve({"p": port})
    client = S2SClient(inp, out, port_identifier="p")
    tx = client.create_transaction("send")
    tx.send(b"doomed", {})
    tx.cancel("changed my mind")
    client.shutdown()
    join()
    assert port.received == []
