"""MQTT 3.1.1 (sources/mqtt.py): varint codec, wildcard matching,
connect/publish/subscribe/drain loopbacks, QoS-1 PUBACK, spool."""

from __future__ import annotations

import io

import pytest

from nifi_spark.sources.mqtt import (ConsumeMQTTSource, MqttBroker,
                                     MqttClient, MqttError,
                                     encode_varint, mqtt_loopback,
                                     read_packet, topic_matches)


def test_varint_tiers():
    cases = {0: b"\x00", 127: b"\x7f", 128: b"\x80\x01",
             16383: b"\xff\x7f", 16384: b"\x80\x80\x01",
             268_435_455: b"\xff\xff\xff\x7f"}
    for n, want in cases.items():
        assert encode_varint(n) == want
    with pytest.raises(MqttError):
        encode_varint(268_435_456)
    # roundtrip through read_packet's varint reader
    blob = bytes([0xC0]) + encode_varint(0)     # PINGREQ, len 0
    assert read_packet(io.BytesIO(blob).read) == (12, 0, b"")


@pytest.mark.parametrize("filt,topic,want", [
    ("a/b/c", "a/b/c", True),
    ("a/+/c", "a/b/c", True),
    ("a/+/c", "a/b/d", False),
    ("a/#", "a/b/c/d", True),
    ("a/#", "a", True),     # §4.7.1.2: '#' includes the parent level
    ("a/#", "ab", False),
    ("#", "anything/at/all", True),
    ("+", "one", True),
    ("+", "one/two", False),
    ("a/+", "a/b/c", False),
])
def test_topic_wildcards(filt, topic, want):
    assert topic_matches(filt, topic) is want


def test_publish_qos0_and_qos1():
    broker = MqttBroker()
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write, client_id="tester")
    c.publish("sensors/temp", b"21.5")
    c.publish("sensors/hum", b"40", qos=1)       # waits for PUBACK
    c.publish("flags", b"x", retain=True)
    c.disconnect()
    assert join() == 3
    assert broker.received == [
        ("sensors/temp", b"21.5", 0, False, False),
        ("sensors/hum", b"40", 1, False, False),
        ("flags", b"x", 0, True, False)]


def test_subscribe_and_drain_with_wildcards():
    broker = MqttBroker(outbound=[
        ("a/b", b"one", 0, False),
        ("a/c/d", b"two", 1, False),
        ("other", b"ignored", 0, False)])
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write)
    assert c.subscribe("a/#", qos=1) == [1]
    got = c.drain()
    assert [(t, p, q) for t, p, q, _, _ in got] == \
        [("a/b", b"one", 0), ("a/c/d", b"two", 1)]
    c.disconnect()
    join()
    assert broker.outbound == [("other", b"ignored", 0, False)]


def test_consume_source_spool(spark, tmp_path):
    broker = MqttBroker(outbound=[
        (f"logs/app{i % 2}", f"m{i}".encode(), i % 2, i % 3 == 0)
        for i in range(6)])
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write)
    src = ConsumeMQTTSource(str(tmp_path / "spool"))
    assert src.drain(c, "logs/+") == 6
    c.disconnect()
    join()
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [bytes(r.payload) for r in rows] == \
        [f"m{i}".encode() for i in range(6)]
    assert rows[0].retained is True and rows[1].retained is False
    assert {r.topic for r in rows} == {"logs/app0", "logs/app1"}
    assert [r.qos for r in rows] == [0, 1, 0, 1, 0, 1]


def test_publish_qos2_exactly_once():
    broker = MqttBroker()
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write, client_id="q2")
    c.publish("exact/once", b"payload", qos=2)   # full 4-way handshake
    c.publish("exact/two", b"p2", qos=2)
    c.disconnect()
    assert join() == 2
    assert broker.received == [
        ("exact/once", b"payload", 2, False, False),
        ("exact/two", b"p2", 2, False, False)]


def test_qos2_dup_republish_not_duplicated():
    """A DUP re-PUBLISH with the same packet id before PUBREL must land
    exactly once (§4.3.3: the stash overwrites)."""
    import struct as _s
    from nifi_spark.sources.mqtt import (PUBCOMP, PUBREC, PUBREL,
                                         encode_publish, read_packet)
    broker = MqttBroker()
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write, client_id="dup")
    pid = 7
    write(encode_publish("t", b"v", qos=2, packet_id=pid))
    assert read_packet(read)[0] == PUBREC
    write(encode_publish("t", b"v", qos=2, dup=True, packet_id=pid))
    assert read_packet(read)[0] == PUBREC        # re-acknowledged
    write(bytes([(PUBREL << 4) | 0x02, 2]) + _s.pack(">H", pid))
    assert read_packet(read)[0] == PUBCOMP
    c.disconnect()
    assert join() == 1                           # exactly once
    assert broker.received == [("t", b"v", 2, False, True)]


def test_qos2_broker_to_client_delivery_across_drains():
    broker = MqttBroker(outbound=[("q2/x", b"exactly", 2, False)])
    read, write, join = mqtt_loopback(broker)
    c = MqttClient(read, write)
    assert c.subscribe("q2/#", qos=2) == [2]
    first = c.drain()        # PUBLISH arrives, PUBREC sent, not yet out
    second = c.drain()       # PUBREL arrives → released + PUBCOMP
    assert first == []
    assert [(t, p, q) for t, p, q, _, _ in second] == \
        [("q2/x", b"exactly", 2)]
    c.disconnect()
    join()
