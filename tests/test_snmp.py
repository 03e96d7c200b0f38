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


def test_v3_key_localization_rfc3414_vectors():
    """RFC 3414 A.3.1/A.3.2 published test vectors (maplesyrup)."""
    from nifi_spark.sources.snmp import localize_key, password_to_key
    eid = bytes.fromhex("000000000000000000000002")
    ku = password_to_key("maplesyrup", "md5")
    assert ku.hex() == "9faf3283884e92834ebc9847d8edd963"
    assert localize_key(ku, eid, "md5").hex() == \
        "526f5eed9fcce26f8964c2930787d82b"
    ku = password_to_key("maplesyrup", "sha")
    assert ku.hex() == "9fb5cc0381497b3793528939ff788d5d79145211"
    assert localize_key(ku, eid, "sha").hex() == \
        "6695febc9288e36282235fc7151f128497b38f3f"


def test_v3_discovery_and_authenticated_session():
    from nifi_spark.sources.snmp import (COUNTER32, SnmpV3Agent,
                                         SnmpV3Session, snmp_v3_discover)
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "host1",
                             "1.3.6.1.2.1.2.2.1.10.1": (COUNTER32, 500)},
                        users={"admin": ("sha", "s3cr3tpass")})
    eid, boots, etime = snmp_v3_discover(agent.transport)
    assert eid == agent.engine_id and boots == 1
    s = SnmpV3Session(agent.transport, "admin",
                      auth_password="s3cr3tpass")
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == \
        [("1.3.6.1.2.1.1.5.0", "host1")]
    assert [v for _o, v in s.walk("1.3.6.1.2.1")] == ["host1", 500]
    s.set([("1.3.6.1.2.1.1.5.0", "host2")])
    assert agent.mib["1.3.6.1.2.1.1.5.0"] == "host2"


def test_v3_wrong_password_and_unauth_rejected():
    import pytest
    from nifi_spark.sources.snmp import (SnmpError, SnmpV3Agent,
                                         SnmpV3Session)
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "h"},
                        users={"admin": ("md5", "rightpass"),
                               "guest": None})
    bad = SnmpV3Session(agent.transport, "admin", auth_password="wrong",
                        proto="md5")
    with pytest.raises(SnmpError, match=r"15\.1\.1\.5"):
        bad.get(["1.3.6.1.2.1.1.5.0"])
    assert agent.wrong_digests == 1
    # an auth-required user sending noAuth is also refused
    unauth = SnmpV3Session(agent.transport, "admin")
    with pytest.raises(SnmpError, match=r"15\.1\.1\.5"):
        unauth.get(["1.3.6.1.2.1.1.5.0"])
    # unknown user -> usmStatsUnknownUserNames
    ghost = SnmpV3Session(agent.transport, "nobody")
    with pytest.raises(SnmpError, match=r"15\.1\.1\.3"):
        ghost.get(["1.3.6.1.2.1.1.5.0"])
    # noAuthNoPriv user works
    g = SnmpV3Session(agent.transport, "guest")
    assert g.get(["1.3.6.1.2.1.1.5.0"])["varbinds"][0][1] == "h"
