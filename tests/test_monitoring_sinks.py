"""Riemann / Slack / Couchbase / Ignite connector analogs:
protobuf codec roundtrip + TCP ack framing, the payload= webhook form,
the memcached binary KV wire, and data-streamer override semantics."""

from __future__ import annotations

import struct

import pytest

from nifi_spark.sources.couchbase import (STATUS_KEY_EEXISTS,
                                          CouchbaseBucket,
                                          CouchbaseClient,
                                          CouchbaseError,
                                          couchbase_loopback,
                                          get_couchbase_key,
                                          put_couchbase_key)
from nifi_spark.sources.ignite import (IgniteCache, get_ignite_cache,
                                       put_ignite_cache)
from nifi_spark.sources.riemann import (RiemannServer, decode_event,
                                        decode_msg, encode_event,
                                        encode_msg, put_riemann,
                                        riemann_loopback, row_to_event)
from nifi_spark.sources.slack import (SlackWebhookServer, build_payload,
                                      put_slack, validate_channel,
                                      validate_emoji)


# ---------------------------------------------------------- riemann

def test_event_codec_roundtrip():
    ev = {"time": 1700000000, "state": "ok", "service": "ftp",
          "host": "app1", "description": "file fetched",
          "tags": ["a", "b"], "ttl": 5.0, "metric_f": 1.25,
          "attributes": {"color": "red"}}
    got = decode_event(encode_event(ev))
    assert got == ev


def test_metric_sint64_zigzag():
    for n in (0, 1, -1, 300, -300, 2**40, -2**40):
        got = decode_event(encode_event({"metric_sint64": n}))
        assert got["metric_sint64"] == n


def test_msg_roundtrip_and_ok():
    msg = decode_msg(encode_msg([{"service": "s"}], ok=True))
    assert msg["ok"] is True and msg["events"][0]["service"] == "s"


def test_row_to_event_reference_mapping():
    ev = row_to_event({"service": "svc", "metric": "0.5",
                       "time": "1700000001", "ttl": "9.5",
                       "tags": " a , b ,c", "state": "",
                       "custom1": "v1", "blank": "  "},
                      custom_keys=["custom1", "blank"])
    assert ev["metric_f"] == 0.5 and ev["time"] == 1700000001
    assert ev["tags"] == ["a", "b", "c"]
    assert "state" not in ev
    assert ev["attributes"] == {"custom1": "v1"}


def test_put_riemann_tcp_acks_and_batches():
    srv = RiemannServer()
    inp, out, join = riemann_loopback(srv)
    rows = [{"service": f"s{i}", "metric": str(i), "host": "h"}
            for i in range(7)]
    n = put_riemann(rows, inp, out, batch_size=3)
    out.sock.close()
    join()
    assert n == 7 and len(srv.events) == 7
    assert srv.events[3]["metric_f"] == 3.0


def test_put_riemann_bad_metric_raises():
    srv = RiemannServer()
    inp, out, join = riemann_loopback(srv)
    with pytest.raises(ValueError):
        put_riemann([{"service": "s", "metric": "not-a-float"}],
                    inp, out)
    out.sock.close()
    join()


# ------------------------------------------------------------ slack

def test_slack_payload_rules():
    assert build_payload({"text": ""}) is None
    assert build_payload({"text": "hi", "channel": "general"}) is None
    assert build_payload({"text": "hi", "channel": "#g"}) == \
        {"text": "hi", "channel": "#g"}
    assert validate_channel("@user") is None
    assert validate_channel("#") is not None
    assert validate_emoji(":ghost:") and not validate_emoji(":x")


def test_put_slack_posts_payload_form():
    srv = SlackWebhookServer()
    ok, failed = put_slack(
        [{"text": "deploy done", "channel": "#ops",
          "username": "bot", "icon_emoji": ":ghost:"},
         {"text": ""},
         {"text": "x", "channel": "nochannel"}],
        srv.transport, webhook_url="https://hooks/services/hook")
    assert len(ok) == 1 and len(failed) == 2
    assert srv.posts == [{"channel": "#ops", "icon_emoji": ":ghost:",
                          "text": "deploy done", "username": "bot"}]


def test_put_slack_http_error_routes_failure():
    srv = SlackWebhookServer()
    ok, failed = put_slack([{"text": "hi"}], srv.transport,
                           webhook_url="https://hooks/wrong")
    assert not ok and len(failed) == 1


# -------------------------------------------------------- couchbase

def test_couchbase_kv_wire_roundtrip():
    bucket = CouchbaseBucket()
    inp, out, join = couchbase_loopback(bucket)
    c = CouchbaseClient(inp, out)
    cas1 = c.set(b"k1", b'{"a":1}', flags=0x02000000)
    doc = c.get(b"k1")
    assert doc["value"] == b'{"a":1}' and doc["cas"] == cas1
    assert doc["flags"] == 0x02000000
    with pytest.raises(CouchbaseError):
        c.get(b"missing")
    # CAS mismatch → KEY_EEXISTS
    with pytest.raises(CouchbaseError) as ei:
        c.set(b"k1", b"x", cas=999)
    assert ei.value.status == STATUS_KEY_EEXISTS
    c.set(b"k1", b"x", cas=cas1)      # correct CAS wins
    assert c.get(b"k1")["value"] == b"x"
    c.delete(b"k1")
    with pytest.raises(CouchbaseError):
        c.get(b"k1")
    inp.sock.close()
    join()


def test_get_put_couchbase_key_routing():
    bucket = CouchbaseBucket()
    bucket.tmpfail_keys.add(b"busy")
    inp, out, join = couchbase_loopback(bucket)
    c = CouchbaseClient(inp, out)
    stored, retries = put_couchbase_key(
        [{"doc_id": f"d{i}", "content": f"c{i}"} for i in range(3)], c)
    assert len(stored) == 3 and not retries
    fetched, failures, retry = get_couchbase_key(
        [{"doc_id": "d1"}, {"doc_id": "nope"}, {"doc_id": "busy"}], c)
    assert fetched[0]["content"] == "c1"
    assert fetched[0]["couchbase.doc.id"] == "d1"
    assert failures[0]["couchbase.exception"] == \
        "DocumentDoesNotExistException"
    assert len(retry) == 1
    inp.sock.close()
    join()


# ----------------------------------------------------------- ignite

def test_put_ignite_override_semantics():
    cache = IgniteCache()
    rows = [{"key": "k", "content": "first"},
            {"key": "k", "content": "second"}]
    ok, failed = put_ignite_cache(rows, cache)
    assert len(ok) == 2 and not failed
    assert cache.get("k") == b"first"        # allowOverride=false
    put_ignite_cache(rows, cache, allow_override=True)
    assert cache.get("k") == b"second"


def test_put_ignite_empty_key_or_content_fails():
    cache = IgniteCache()
    ok, failed = put_ignite_cache(
        [{"key": "", "content": "x"}, {"key": "k2", "content": ""},
         {"key": "k3", "content": "y"}], cache)
    assert len(ok) == 1 and len(failed) == 2
    assert failed[0]["ignite.cache.batch.flow.file.total.count"] == "3"
    assert ok[0]["ignite.cache.batch.flow.file.failed.count"] == "2"


def test_get_ignite_cache():
    cache = IgniteCache()
    cache.stream([("a", b"va")], False)
    hits, failed = get_ignite_cache(
        [{"key": "a"}, {"key": "b"}, {"key": None}], cache)
    assert hits == [{"key": "a", "content": "va"}]
    assert len(failed) == 2
