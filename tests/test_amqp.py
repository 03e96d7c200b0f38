"""AMQP 0-9-1 (sources/amqp.py): frame/table/property codecs, topic
matching, connection dance + publish/get loopbacks, ack bookkeeping,
spool bridge."""

from __future__ import annotations

import io

import pytest

from nifi_spark.sources.amqp import (AmqpBroker, AmqpClient, AmqpError,
                                     ConsumeAMQPSource, amqp_loopback,
                                     decode_properties, decode_table,
                                     encode_properties, encode_table,
                                     publish_amqp, read_frame,
                                     topic_matches)


def test_field_table_roundtrip():
    t = {"product": "nifi-spark", "retries": 3, "big": 2 ** 40,
         "on": True, "off": False, "nothing": None,
         "nested": {"a": "b", "n": -7}}
    got, end = decode_table(encode_table(t), 0)
    assert got == t
    assert end == len(encode_table(t))


def test_properties_roundtrip_all_fields():
    props = {"content_type": "text/plain", "content_encoding": "utf-8",
             "headers": {"k": "v", "n": 2}, "delivery_mode": 2,
             "priority": 5, "correlation_id": "c1", "reply_to": "q.r",
             "expiration": "60000", "message_id": "m-9",
             "timestamp": 1_700_000_000, "type": "event",
             "user_id": "guest", "app_id": "app", "cluster_id": "cl"}
    buf = encode_properties(props)
    got, _ = decode_properties(buf, 0)
    assert got == props
    # sparse flags: only some fields present
    sparse = {"delivery_mode": 1, "app_id": "x"}
    got2, _ = decode_properties(encode_properties(sparse), 0)
    assert got2 == sparse


def test_frame_end_enforced():
    bad = b"\x01\x00\x01\x00\x00\x00\x04abcd\x00"   # wrong end octet
    with pytest.raises(AmqpError):
        read_frame(io.BytesIO(bad).read)


@pytest.mark.parametrize("pattern,key,want", [
    ("a.b.c", "a.b.c", True),
    ("a.*.c", "a.b.c", True),
    ("a.*.c", "a.b.d", False),
    ("a.*", "a.b.c", False),           # '*' is exactly one word
    ("a.#", "a.b.c.d", True),
    ("a.#", "a", True),                # '#' matches zero words
    ("#", "anything.at.all", True),
    ("#.end", "end", True),
    ("#.end", "x.y.end", True),
    ("#.end", "x.y.endz", False),
    ("*.stock.#", "usd.stock", True),  # the spec's own example
    ("*.stock.#", "eur.stock.db", True),
    ("*.stock.#", "stock.nasdaq", False),
])
def test_topic_matching(pattern, key, want):
    assert topic_matches(pattern, key) is want


def test_publish_get_roundtrip_default_exchange():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("work")
    c.basic_publish("", "work", b"hello",
                    {"content_type": "text/plain", "app_id": "t"})
    c.basic_publish("", "work", b"x" * 300_000)     # multi-frame body
    got1 = c.basic_get("work")
    assert got1 is not None
    props, body, ex, key, remaining = got1
    assert (body, ex, key, remaining) == (b"hello", "", "work", 1)
    assert props["content_type"] == "text/plain"
    props2, body2, *_ = c.basic_get("work")
    assert body2 == b"x" * 300_000 and props2 == {}
    assert c.basic_get("work") is None              # get-empty
    c.close()
    assert join() == 2


def test_topic_exchange_routing_and_bindings():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.exchange_declare("events", "topic")
    c.queue_declare("stocks")
    c.queue_declare("all")
    c.queue_bind("stocks", "events", "*.stock.#")
    c.queue_bind("all", "events", "#")
    c.basic_publish("events", "usd.stock", b"1")
    c.basic_publish("events", "eur.stock.db", b"2")
    c.basic_publish("events", "weather.eu", b"3")
    assert [c.basic_get("stocks")[1] for _ in range(2)] == [b"1", b"2"]
    assert c.basic_get("stocks") is None
    assert [c.basic_get("all")[1] for _ in range(3)] == \
        [b"1", b"2", b"3"]
    c.close()
    join()


def test_ack_bookkeeping():
    broker = AmqpBroker()
    broker.pre_queue("q", [({}, b"a", "", "q"), ({}, b"b", "", "q")])
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.basic_get("q", no_ack=False)
    c.basic_get("q", no_ack=False)
    c.close()
    join()
    assert broker.unacked == {}        # both acked by the client


def test_consume_source_spool(spark, tmp_path):
    broker = AmqpBroker()
    broker.pre_queue("logs", [
        ({"content_type": "text/plain", "delivery_mode": 1 + i % 2,
          "priority": i % 5, "app_id": f"app{i % 3}",
          "headers": {"h": i}},
         f"payload {i}".encode(), "ex", f"rk.{i % 4}")
        for i in range(8)])
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    src = ConsumeAMQPSource(str(tmp_path / "spool"))
    assert src.drain(c, "logs") == 8
    assert src.drain(c, "logs") == 0      # second drain: empty queue
    c.close()
    join()
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [bytes(r.payload) for r in rows] == \
        [f"payload {i}".encode() for i in range(8)]
    assert rows[3].routing_key == "rk.3" and rows[3].app_id == "app0"
    assert rows[0].headers == "h=0"
    assert [r.delivery_mode for r in rows] == [1, 2] * 4


def test_publish_amqp_rows_helper():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.exchange_declare("out", "direct")
    c.queue_declare("sink")
    c.queue_bind("sink", "out", "k")
    rows = [{"routing_key": "k", "payload": f"r{i}",
             "mid": f"m{i}"} for i in range(3)]
    n = publish_amqp(rows, c, exchange="out",
                     props_cols={"message_id": "mid"})
    assert n == 3
    got = [c.basic_get("sink") for _ in range(3)]
    assert [g[1] for g in got] == [b"r0", b"r1", b"r2"]
    assert [g[0]["message_id"] for g in got] == ["m0", "m1", "m2"]
    c.close()
    join()


def test_basic_consume_push_delivery():
    """basic.consume → consume-ok, then the broker pushes
    basic.deliver streams; the heartbeat-bounded drain collects them
    (including messages published AFTER the consume)."""
    broker = AmqpBroker()
    broker.pre_queue("q", [({}, b"pre0", "", "q"), ({}, b"pre1", "", "q")])
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    tag = c.basic_consume("q")
    assert tag.startswith("ctag-")
    got = c.drain()
    assert [(b, k) for _p, b, _e, k, _t in got] == \
        [(b"pre0", "q"), (b"pre1", "q")]
    assert all(t == tag for *_x, t in got)
    # published after the consume: delivered on the next drain
    c.basic_publish("", "q", b"late" * 50_000,
                    {"app_id": "push"})      # multi-frame body
    got2 = c.drain()
    assert len(got2) == 1
    props2, body2, *_ = got2[0]
    assert body2 == b"late" * 50_000 and props2["app_id"] == "push"
    assert c.drain() == []                   # empty queue → just echo
    c.close()
    join()


def test_basic_consume_ack_mode():
    """no_ack=False consume: broker tracks unacked tags, the drain's
    acks clear them."""
    broker = AmqpBroker()
    broker.pre_queue("q", [({}, b"a", "", "q"), ({}, b"b", "", "q")])
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.basic_consume("q", no_ack=False, consumer_tag="mine")
    got = c.drain(no_ack=False)
    assert [t for *_x, t in got] == ["mine", "mine"]
    c.close()
    join()
    assert broker.unacked == {}


# --------------------------------------- publisher confirms + tx class


def test_publisher_confirms_ack_every_publish():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.confirm_select()
    seqs = [c.basic_publish("", "q", f"m{i}".encode()) for i in range(5)]
    assert seqs == [1, 2, 3, 4, 5]
    assert c.wait_for_confirms() == [1, 2, 3, 4, 5]
    assert c.wait_for_confirms() == []               # nothing outstanding
    c.close()
    assert join() == 5


def test_tx_rollback_discards_commit_routes():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.tx_select()
    for i in range(3):
        c.basic_publish("", "q", f"lost{i}".encode())
    c.tx_rollback()
    assert c.basic_get("q") is None                  # nothing routed
    c.basic_publish("", "q", b"kept0")
    c.basic_publish("", "q", b"kept1")
    c.tx_commit()
    assert c.basic_get("q")[1] == b"kept0"
    assert c.basic_get("q")[1] == b"kept1"
    assert c.basic_get("q") is None
    c.close()
    assert join() == 2                               # only committed count


def test_tx_staged_invisible_until_commit():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.tx_select()
    c.basic_publish("", "q", b"staged")
    assert c.basic_get("q") is None                  # not yet routed
    c.tx_commit()
    assert c.basic_get("q")[1] == b"staged"
    c.close()
    join()


def test_confirm_and_tx_mutually_exclusive():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.tx_select()
    with pytest.raises((AmqpError, OSError)):
        c.confirm_select()
    with pytest.raises(AmqpError):
        join()


# ------------------------------------------- nack / reject / recover


def test_reject_requeue_sets_redelivered():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.basic_publish("", "q", b"m0")
    got = c.basic_get("q", no_ack=False, auto_ack=False)
    assert got[1] == b"m0" and c.last_redelivered is False
    c.basic_reject(c.last_delivery_tag, requeue=True)
    got2 = c.basic_get("q", no_ack=False, auto_ack=False)
    assert got2[1] == b"m0" and c.last_redelivered is True
    c.close()
    join()


def test_reject_drop_discards():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.basic_publish("", "q", b"dead")
    c.basic_get("q", no_ack=False, auto_ack=False)
    c.basic_reject(c.last_delivery_tag, requeue=False)
    assert c.basic_get("q") is None
    c.close()
    join()
    assert broker.unacked == {}


def test_nack_multiple_requeues_in_original_order():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    for i in range(3):
        c.basic_publish("", "q", f"m{i}".encode())
    tags = []
    for _ in range(3):
        c.basic_get("q", no_ack=False, auto_ack=False)
        tags.append(c.last_delivery_tag)
    c.basic_nack(tags[-1], multiple=True, requeue=True)
    seen = [c.basic_get("q", no_ack=True)[1] for _ in range(3)]
    assert seen == [b"m0", b"m1", b"m2"]     # original order preserved
    c.close()
    join()


def test_recover_requeues_all_unacked():
    broker = AmqpBroker()
    read, write, join = amqp_loopback(broker)
    c = AmqpClient(read, write)
    c.queue_declare("q")
    c.basic_publish("", "q", b"a")
    c.basic_publish("", "q", b"b")
    c.basic_get("q", no_ack=False, auto_ack=False)
    c.basic_get("q", no_ack=False, auto_ack=False)
    assert c.basic_get("q") is None
    c.basic_recover()
    assert c.basic_get("q")[1] == b"a"
    assert c.last_redelivered is True
    c.close()
    join()
