"""Kafka 0.8 wire protocol (sources/kafka_wire.py): message/set codec
with CRC + gzip wrappers, Metadata/Produce/Fetch v0 loopbacks,
mid-wrapper fetch replay, max_bytes truncation, ledgered spool bridge."""

from __future__ import annotations

import pytest

from nifi_spark.sources.kafka_wire import (ConsumeKafkaWireSource,
                                           KafkaBroker, KafkaWireClient,
                                           KafkaWireError,
                                           decode_message_set,
                                           encode_message,
                                           encode_message_set, gzip_wrap,
                                           kafka_loopback,
                                           partition_for_key)


def test_message_set_roundtrip_and_crc():
    entries = [(0, encode_message(b"k0", b"v0")),
               (1, encode_message(None, b"v1"))]
    got = decode_message_set(encode_message_set(entries))
    assert [(o, k, v) for o, _a, k, v in got] == \
        [(0, b"k0", b"v0"), (1, None, b"v1")]
    # corrupt one payload byte → CRC failure
    raw = bytearray(encode_message_set(entries))
    raw[-1] ^= 0xFF
    with pytest.raises(KafkaWireError, match="CRC"):
        decode_message_set(bytes(raw))


def test_gzip_wrapper_expands_with_inner_offsets():
    entries = [(7, encode_message(b"a", b"1")),
               (8, encode_message(b"b", b"2"))]
    wrapped = gzip_wrap(entries)
    got = decode_message_set(wrapped)
    assert [(o, k) for o, _a, k, _v in got] == [(7, b"a"), (8, b"b")]


def test_produce_fetch_roundtrip():
    broker = KafkaBroker()
    broker.create_topic("t", partitions=2)
    read, write, join = kafka_loopback(broker)
    c = KafkaWireClient(read, write)
    assert c.metadata(["t"]) == {"t": [0, 1]}
    assert c.metadata(["nope"]) == {}
    base = c.produce("t", 0, [(b"k", b"v0"), (None, b"v1")])
    assert base == 0
    assert c.produce("t", 0, [(b"k2", b"v2")]) == 2
    hw, msgs = c.fetch("t", 0, 0)
    assert hw == 3
    assert [(o, k, v) for o, k, v in msgs] == \
        [(0, b"k", b"v0"), (1, None, b"v1"), (2, b"k2", b"v2")]
    hw, msgs = c.fetch("t", 0, 2)
    assert [o for o, _k, _v in msgs] == [2]
    assert c.fetch("t", 1, 0) == (0, [])
    with pytest.raises(KafkaWireError, match="out of range"):
        c.fetch("t", 0, 99)
    join()


def test_compressed_produce_and_midwrapper_fetch():
    """gzip produce → broker recompresses with absolute offsets; a
    fetch landing mid-wrapper re-serves the wrapper and the client
    discards below-offset inner messages (the v0 consumer contract)."""
    broker = KafkaBroker()
    broker.create_topic("t")
    read, write, join = kafka_loopback(broker)
    c = KafkaWireClient(read, write)
    c.produce("t", 0, [(None, f"m{i}".encode()) for i in range(5)],
              compress=True)
    hw, msgs = c.fetch("t", 0, 3)
    assert hw == 5
    assert [(o, v) for o, _k, v in msgs] == [(3, b"m3"), (4, b"m4")]
    # the stored log entry is ONE wrapper covering offsets 0-4
    assert len(broker.logs[("t", 0)]) == 1
    assert broker.logs[("t", 0)][0][0] == 4      # wrapper offset = last
    join()


def test_fetch_max_bytes_truncation():
    broker = KafkaBroker()
    broker.create_topic("t")
    read, write, join = kafka_loopback(broker)
    c = KafkaWireClient(read, write)
    c.produce("t", 0, [(None, b"x" * 400), (None, b"y" * 400)])
    hw, msgs = c.fetch("t", 0, 0, max_bytes=450)   # fits exactly one
    assert [v for _o, _k, v in msgs] == [b"x" * 400]
    with pytest.raises(KafkaWireError, match="increase"):
        c.fetch("t", 0, 0, max_bytes=64)           # none fits
    join()


def test_partition_for_key_deterministic():
    assert partition_for_key(b"user-42", 8) == partition_for_key(
        b"user-42", 8)
    assert 0 <= partition_for_key(b"user-42", 8) < 8
    assert len({partition_for_key(f"k{i}".encode(), 8)
                for i in range(100)}) > 1


def test_consume_spool_bridge(spark, tmp_path):
    broker = KafkaBroker()
    broker.create_topic("logs", partitions=2)
    read, write, join = kafka_loopback(broker)
    c = KafkaWireClient(read, write)
    for i in range(10):
        p = partition_for_key(f"k{i}".encode(), 2)
        c.produce("logs", p, [(f"k{i}".encode(), f"v{i}".encode())])
    src = ConsumeKafkaWireSource(str(tmp_path / "spool"))
    assert src.drain(c, "logs") == 10
    assert src.drain(c, "logs") == 0          # offsets committed
    c.produce("logs", 0, [(b"late", b"late-v")], compress=True)
    assert src.drain(c, "logs") == 1
    join()
    df = src.read(spark)
    rows = df.orderBy("kafka_partition", "kafka_offset").collect()
    assert len(rows) == 11
    assert {bytes(r.payload) for r in rows} == \
        {f"v{i}".encode() for i in range(10)} | {b"late-v"}
    # offsets dense per partition from 0
    for p in (0, 1):
        offs = [r.kafka_offset for r in rows if r.kafka_partition == p]
        assert offs == list(range(len(offs)))
    # a FRESH source over the same spool dir resumes the ledger
    src2 = ConsumeKafkaWireSource(str(tmp_path / "spool"))
    read2, write2, join2 = kafka_loopback(broker)
    assert src2.drain(KafkaWireClient(read2, write2), "logs") == 0
    join2()


def test_snappy_lz4_wrappers_expand_with_inner_offsets():
    from nifi_spark.sources.kafka_wire import lz4_wrap, snappy_wrap
    entries = [(7, encode_message(b"a", b"payload " * 50)),
               (8, encode_message(b"b", b"2"))]
    for wrap in (snappy_wrap, lz4_wrap):
        wrapped = wrap(entries)
        got = decode_message_set(wrapped)
        assert [(o, k) for o, _a, k, _v in got] == [(7, b"a"), (8, b"b")]
        assert got[0][3] == b"payload " * 50


def test_lz4_wrapper_accepts_kafka3160_legacy_header_checksum():
    """Old Kafka v0 producers hashed magic+descriptor when writing the
    frame HC byte (KAFKA-3160); the decoder must accept that form."""
    import struct
    from nifi_spark.functions.lz4_codec import (lz4_frame_compress,
                                                lz4_frame_decompress,
                                                xxh32)
    data = b"inner message set bytes " * 20
    blob = bytearray(lz4_frame_compress(data))
    # rewrite HC the broken way: xxh32 over magic+FLG+BD
    blob[6] = (xxh32(bytes(blob[0:6])) >> 8) & 0xFF
    assert lz4_frame_decompress(bytes(blob)) == data


def test_broker_roundtrips_compressed_producer_sets():
    broker = KafkaBroker()
    broker.create_topic("t", partitions=1)
    read, write, join = kafka_loopback(broker)
    c = KafkaWireClient(read, write)
    assert c.produce("t", 0, [(None, b"s0"), (None, b"s1")],
                     compress="snappy") == 0
    assert c.produce("t", 0, [(b"k", b"l0")], compress="lz4") == 2
    hw, msgs = c.fetch("t", 0, 0)
    assert hw == 3
    assert [(o, k, v) for o, k, v in msgs] == \
        [(0, None, b"s0"), (1, None, b"s1"), (2, b"k", b"l0")]
    join()
