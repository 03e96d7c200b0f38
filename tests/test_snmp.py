"""SNMP v2c (sources/snmp.py): BER codec vectors, GET/GETNEXT/SET
against the loopback agent, walk subtree semantics."""

from __future__ import annotations

import pytest

from nifi_spark.sources.snmp import (COUNTER32, SnmpAgent, SnmpError,
                                     ber_int, ber_oid, decode_message,
                                     encode_message, snmp_get, snmp_set,
                                     snmp_walk)


def test_ber_vectors():
    # classic OID encoding vector: 1.3.6.1.2.1 -> 2B 06 01 02 01
    assert ber_oid("1.3.6.1.2.1") == b"\x06\x05\x2b\x06\x01\x02\x01"
    # multi-byte arc: 1.3.6.1.4.1.8072 (8072 = 0xBF 0x08)
    assert ber_oid("1.3.6.1.4.1.8072").endswith(b"\xbf\x08")
    assert ber_int(0) == b"\x02\x01\x00"
    assert ber_int(127) == b"\x02\x02\x00\x7f" or \
        ber_int(127)[-1] == 0x7F            # sign-safe encoding
    assert ber_int(-1)[-1] == 0xFF


def test_message_roundtrip():
    msg = encode_message("public", 0xA0, 42,
                         [("1.3.6.1.2.1.1.1.0", None),
                          ("1.3.6.1.2.1.1.3.0", 123),
                          ("1.3.6.1.2.1.1.5.0", "sysname")])
    d = decode_message(msg)
    assert d["community"] == "public"
    assert d["request_id"] == 42
    assert d["snmp_version"] == 1            # v2c
    assert d["varbinds"] == [("1.3.6.1.2.1.1.1.0", None),
                             ("1.3.6.1.2.1.1.3.0", 123),
                             ("1.3.6.1.2.1.1.5.0", "sysname")]


_MIB = {
    "1.3.6.1.2.1.1.1.0": "engine host",
    "1.3.6.1.2.1.1.3.0": (COUNTER32, 98765),
    "1.3.6.1.2.1.1.5.0": "node-7",
    "1.3.6.1.2.1.2.2.1.10.1": (COUNTER32, 1000),
    "1.3.6.1.2.1.2.2.1.10.2": (COUNTER32, 2000),
    "1.3.6.1.4.1.9.1.0": 5,
}


def test_get_and_errors():
    agent = SnmpAgent(mib=dict(_MIB))
    r = snmp_get(agent.transport, ["1.3.6.1.2.1.1.5.0",
                                   "1.3.6.1.2.1.1.3.0"])
    assert r["snmp$errorStatus"] == 0
    assert r["varbinds"] == [("1.3.6.1.2.1.1.5.0", "node-7"),
                             ("1.3.6.1.2.1.1.3.0", 98765)]
    r = snmp_get(agent.transport, ["1.9.9.9.0"])
    assert r["snmp$errorStatus"] == 2 and r["snmp$errorIndex"] == 1
    r = snmp_get(agent.transport, ["1.3.6.1.2.1.1.5.0"],
                 community="WRONG")
    assert r["snmp$errorStatus"] == 16


def test_walk_subtree():
    agent = SnmpAgent(mib=dict(_MIB))
    got = snmp_walk(agent.transport, "1.3.6.1.2.1.2")
    assert got == [("1.3.6.1.2.1.2.2.1.10.1", 1000),
                   ("1.3.6.1.2.1.2.2.1.10.2", 2000)]
    # whole-mib walk terminates at endOfMibView
    assert len(snmp_walk(agent.transport, "1.3")) == len(_MIB)
    assert snmp_walk(agent.transport, "1.7") == []


def test_set_then_get():
    agent = SnmpAgent(mib=dict(_MIB))
    r = snmp_set(agent.transport, [("1.3.6.1.4.1.9.1.0", 17),
                                   ("1.3.6.1.4.1.9.2.0", "added")])
    assert r["snmp$errorStatus"] == 0
    got = snmp_get(agent.transport, ["1.3.6.1.4.1.9.1.0",
                                     "1.3.6.1.4.1.9.2.0"])
    assert got["varbinds"] == [("1.3.6.1.4.1.9.1.0", 17),
                               ("1.3.6.1.4.1.9.2.0", "added")]


def test_bad_oid():
    with pytest.raises(SnmpError, match="too short"):
        ber_oid("1")
