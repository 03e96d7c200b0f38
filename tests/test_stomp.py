"""STOMP 1.2 / GetJMS analog (sources/stomp.py): frame codec + header
escaping, broker loopbacks (queue vs topic, ack modes, receipts),
spool bridge with the jms.<prop>/.type attribute surface."""

from __future__ import annotations

import io

import pytest

from nifi_spark.sources.stomp import (GetJMSSource, StompBroker,
                                      StompClient, StompError,
                                      encode_frame, put_jms, read_frame,
                                      stomp_loopback)


def _rd(buf: bytes):
    return io.BytesIO(buf).read


def test_frame_roundtrip_with_body_and_escaping():
    hdrs = {"destination": "/queue/a", "weird:key": "v\nwith\r:stuff\\x"}
    raw = encode_frame("SEND", hdrs, b"hello\x00world")
    cmd, got, body = read_frame(_rd(raw))
    assert cmd == "SEND" and body == b"hello\x00world"
    assert got["weird:key"] == "v\nwith\r:stuff\\x"
    assert got["content-length"] == "11"


def test_connect_frames_not_escaped():
    raw = encode_frame("CONNECT", {"accept-version": "1.2", "host": "/"})
    assert b"\\c" not in raw
    cmd, hdrs, _ = read_frame(_rd(raw))
    assert cmd == "CONNECT" and hdrs["accept-version"] == "1.2"


def test_first_duplicate_header_wins_and_heartbeats_skipped():
    raw = b"\n\n" + b"MESSAGE\nfoo:one\nfoo:two\n\n\x00"
    cmd, hdrs, body = read_frame(_rd(raw))
    assert cmd == "MESSAGE" and hdrs["foo"] == "one" and body == b""
    assert read_frame(_rd(b"")) is None           # clean EOF
    with pytest.raises(StompError):
        read_frame(_rd(b"SEND\nbad header line\n\n\x00"))


def test_queue_roundtrip_and_receipt_bound():
    broker = StompBroker()
    broker.pre_queue("/queue/work", [({"k": "v"}, b"pre")])
    read, write, join = stomp_loopback(broker)
    c = StompClient(read, write)
    assert c.version == "1.2"
    c.subscribe("/queue/work")
    got = c.drain()
    assert [(h["destination"], b) for h, b in got] == \
        [("/queue/work", b"pre")]
    assert got[0][0]["k"] == "v"
    # published after the subscribe: next drain
    c.send("/queue/work", b"x" * 70_000, {"app": "t"})
    got2 = c.drain()
    assert len(got2) == 1 and got2[0][1] == b"x" * 70_000
    assert got2[0][0]["app"] == "t"
    assert c.drain() == []
    c.disconnect()
    assert join() == 2


def test_topic_broadcast_vs_queue_once():
    broker = StompBroker()
    read, write, join = stomp_loopback(broker)
    c = StompClient(read, write)
    c.subscribe("/topic/news", sub_id="s1")
    c.subscribe("/topic/news", sub_id="s2")
    c.subscribe("/queue/jobs", sub_id="s3")
    c.send("/topic/news", b"n1")
    c.send("/queue/jobs", b"j1")
    got = c.drain()
    by_sub = sorted((h["subscription"], bytes(b)) for h, b in got)
    assert by_sub == [("s1", b"n1"), ("s2", b"n1"), ("s3", b"j1")]
    c.disconnect()
    join()


def test_client_ack_cumulative_vs_individual():
    broker = StompBroker()
    broker.pre_queue("/queue/q", [({}, b"a"), ({}, b"b"), ({}, b"c")])
    read, write, join = stomp_loopback(broker)
    c = StompClient(read, write)
    c.subscribe("/queue/q", ack="client")
    got = c.drain(ack=False)
    assert len(got) == 3
    # cumulative: acking the LAST id clears all three
    c.write(encode_frame("ACK", {"id": got[-1][0]["ack"],
                                 "receipt": "fin"}))
    fr = read_frame(c.read)
    assert fr[0] == "RECEIPT" and fr[1]["receipt-id"] == "fin"
    c.disconnect()
    join()
    assert broker.unacked == {}


def test_client_individual_ack_leaves_others():
    broker = StompBroker()
    broker.pre_queue("/queue/q", [({}, b"a"), ({}, b"b")])
    read, write, join = stomp_loopback(broker)
    c = StompClient(read, write)
    c.subscribe("/queue/q", ack="client-individual")
    got = c.drain(ack=False)
    c.write(encode_frame("ACK", {"id": got[1][0]["ack"],
                                 "receipt": "fin"}))
    fr = read_frame(c.read)
    assert fr[0] == "RECEIPT"
    c.disconnect()
    join()
    assert list(broker.unacked) == [int(got[0][0]["ack"])]


def test_login_required():
    broker = StompBroker(login="u", passcode="p")
    read, write, join = stomp_loopback(broker)
    with pytest.raises(StompError):
        StompClient(read, write, login="u", passcode="wrong")
    join()
    broker2 = StompBroker(login="u", passcode="p")
    read, write, join = stomp_loopback(broker2)
    c = StompClient(read, write, login="u", passcode="p")
    c.disconnect()
    join()


def test_get_jms_spool(spark, tmp_path):
    broker = StompBroker()
    broker.pre_queue("/queue/logs", [
        ({"priority": str(i % 3), "origin": f"host{i % 2}"},
         f"event {i}".encode())
        for i in range(6)])
    read, write, join = stomp_loopback(broker)
    c = StompClient(read, write)
    c.subscribe("/queue/logs")
    src = GetJMSSource(str(tmp_path / "spool"))
    assert src.drain(c) == 6
    # put_jms → second drain batch
    put_jms(c, "/queue/logs", [(b"late", {"origin": "put"})])
    assert src.drain(c) == 1
    assert src.drain(c) == 0
    c.disconnect()
    join()
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [bytes(r.payload) for r in rows] == \
        [f"event {i}".encode() for i in range(6)] + [b"late"]
    a3 = dict(rows[3].attributes)
    assert a3["jms.priority"] == "0" and a3["jms.priority.type"] == "String"
    assert dict(rows[6].attributes)["jms.origin"] == "put"
