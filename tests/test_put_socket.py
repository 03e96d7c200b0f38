"""PutTCP/PutUDP/PutSyslog analogs (sources/put_socket.py) + the S2S
weighted peer selector (PeerSelector.createDestinationList parity)."""

from __future__ import annotations

from collections import Counter

from nifi_spark.sources.put_socket import (build_syslog_message,
                                           put_syslog, put_tcp, put_udp,
                                           sent_feed, syslog_is_valid)
from nifi_spark.sources.site_to_site import weighted_peer_destinations


def test_build_message_matches_reference_builder():
    # version present -> "<pri>v timestamp host body"
    assert build_syslog_message(34, "Oct 12 10:00:01", "h1", "hi", 1) \
        == "<34>1 Oct 12 10:00:01 h1 hi"
    # version absent -> no version token at all
    assert build_syslog_message(34, "Oct 12 10:00:01", "h1", "hi") \
        == "<34>Oct 12 10:00:01 h1 hi"


def test_syslog_validation_both_specs():
    assert syslog_is_valid("<34>Oct  5 22:14:15 mymachine su: fail")
    assert syslog_is_valid(
        "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su body")
    assert not syslog_is_valid("no priority at all")
    assert not syslog_is_valid("<34>not-a-stamp host body")


def test_put_syslog_validates_before_tcp_newline():
    sends: list[bytes] = []
    rows = [
        {"priority": 13, "timestamp": "Oct 12 10:00:01",
         "hostname": "h1", "body": "ok 1"},
        {"priority": 13, "timestamp": "BADSTAMP",
         "hostname": "h1", "body": "never sent"},
    ]
    n, invalid = put_syslog(rows, sends.append, protocol="TCP")
    assert n == 1 and len(invalid) == 1
    assert sends == [b"<13>Oct 12 10:00:01 h1 ok 1\n"]
    assert "never sent" in invalid[0]
    # UDP: no trailing newline
    sends.clear()
    put_syslog(rows[:1], sends.append, protocol="UDP")
    assert sends == [b"<13>Oct 12 10:00:01 h1 ok 1"]


def test_put_tcp_roundtrip_into_listen_source(spark, tmp_path):
    from nifi_spark.sources import ListenTCPSource
    sends: list[bytes] = []
    put_tcp([f"line {i}" for i in range(50)], sends.append)
    src = ListenTCPSource(str(tmp_path / "spool"))
    src.drain_all(sent_feed(sends, chop=23))   # TCP reassembly
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [r.raw for r in rows] == [f"line {i}" for i in range(50)]


def test_put_udp_datagrams(spark, tmp_path):
    from nifi_spark.sources import ListenUDPSource
    sends: list[bytes] = []
    put_udp([f"d{i}" for i in range(10)], sends.append)
    src = ListenUDPSource(str(tmp_path / "spool"))
    src.drain_all(sent_feed(sends))
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [r.raw for r in rows] == [f"d{i}" for i in range(10)]


def test_weighted_peer_destinations_reference_math():
    ring = weighted_peer_destinations([("a", 100), ("b", 300),
                                       ("c", 600)])
    c = Counter(ring)
    # weight = 1 - min(.8, share): a .9 -> 115, b .7 -> 89, c .4 -> 51
    assert (c["a"], c["b"], c["c"]) == (115, 89, 51)
    assert None not in ring
    # RECEIVE direction inverts the preference
    r = Counter(weighted_peer_destinations(
        [("a", 100), ("b", 300), ("c", 600)], direction="receive"))
    assert r["c"] > r["b"] > r["a"]
    # zero queue depth: the Java NaN path -> one entry each
    assert Counter(weighted_peer_destinations([("a", 0), ("b", 0)])) \
        == {"a": 1, "b": 1}
    # 80% cap keeps a fully-loaded peer at >= 20% of slots on SEND
    c3 = Counter(weighted_peer_destinations([("hog", 10_000),
                                             ("idle", 0)]))
    assert c3["hog"] >= int(128 * 0.2)
