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


# ----------------------------------------------------- authPriv (r4)


def test_blockcipher_published_vectors():
    """Pin DES to the FIPS 46-3 worked example and AES-128 to
    FIPS-197 appendix B — if either table/schedule drifts, this
    catches it before any protocol test does."""
    from nifi_spark.functions.blockciphers import (aes128_encrypt_block,
                                                   aes128_key_schedule,
                                                   des_block,
                                                   des_key_schedule)
    key = bytes.fromhex("133457799BBCDFF1")
    ct = des_block(bytes.fromhex("0123456789ABCDEF"),
                   des_key_schedule(key))
    assert ct.hex().upper() == "85E813540F0AB405"
    assert des_block(ct, des_key_schedule(key)[::-1]).hex().upper() == \
        "0123456789ABCDEF"
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    out = aes128_encrypt_block(
        bytes.fromhex("3243f6a8885a308d313198a2e0370734"),
        aes128_key_schedule(k))
    assert out.hex() == "3925841d02dc09fbdc118597196a0b32"


def test_blockcipher_mode_roundtrips():
    from nifi_spark.functions.blockciphers import (aes128_cfb_decrypt,
                                                   aes128_cfb_encrypt,
                                                   des_cbc_decrypt,
                                                   des_cbc_encrypt)
    key8, iv8 = b"01234567", bytes(range(8))
    data = b"snmpv3 des cbc roundtrip" * 3        # multiple of 8
    assert des_cbc_decrypt(key8, iv8,
                           des_cbc_encrypt(key8, iv8, data)) == data
    key16, iv16 = b"0123456789abcdef", bytes(range(16))
    odd = b"cfb has no padding requirement" * 3 + b"+tail"
    assert aes128_cfb_decrypt(key16, iv16,
                              aes128_cfb_encrypt(key16, iv16, odd)) == odd


def test_v3_authpriv_des_and_aes_roundtrip():
    from nifi_spark.sources.snmp import (COUNTER32, SnmpV3Agent,
                                         SnmpV3Session)
    mib = {"1.3.6.1.2.1.1.1.0": "sysDescr",
           "1.3.6.1.2.1.2.2.1.10.1": (COUNTER32, 987)}
    for pp in ("des", "aes"):
        agent = SnmpV3Agent(
            mib=dict(mib),
            users={"ops": ("sha", "authpass123", pp, "privpass456")})
        s = SnmpV3Session(agent.transport, "ops",
                          auth_password="authpass123", proto="sha",
                          priv_password="privpass456", priv_proto=pp)
        assert s.get(["1.3.6.1.2.1.1.1.0"])["varbinds"][0][1] == \
            "sysDescr"
        assert [v for _o, v in s.walk("1.3.6.1.2.1")] == ["sysDescr", 987]
        s.set([("1.3.6.1.2.1.1.1.0", "renamed")])
        assert agent.mib["1.3.6.1.2.1.1.1.0"] == "renamed"
        # the wire really is encrypted: the plaintext value never
        # appears in a captured response
        captured = agent.transport(_capture_get(agent, s))
        assert b"renamed" not in captured


def _capture_get(agent, sess):
    """Encode one more GET through the session's keys so we can
    inspect the raw response bytes."""
    from nifi_spark.sources.snmp import GET_REQUEST, encode_v3_message
    sess._mid += 1
    sess._salt += 1
    return encode_v3_message(
        sess._mid, GET_REQUEST, sess._mid,
        [("1.3.6.1.2.1.1.1.0", None)], engine_id=sess.engine_id,
        boots=sess.boots, etime=sess.etime, user=sess.user,
        auth_key=sess.kul, proto=sess.proto, priv_key=sess.priv_kul,
        priv_proto=sess.priv_proto, priv_salt=sess._salt)


def test_v3_wrong_priv_key_reports_decryption_error():
    import pytest
    from nifi_spark.sources.snmp import (SnmpError, SnmpV3Agent,
                                         SnmpV3Session)
    agent = SnmpV3Agent(
        mib={"1.3.6.1.2.1.1.1.0": "x"},
        users={"ops": ("sha", "authpass123", "aes", "privpass456")})
    bad = SnmpV3Session(agent.transport, "ops",
                        auth_password="authpass123", proto="sha",
                        priv_password="WRONG", priv_proto="aes")
    with pytest.raises(SnmpError, match=r"15\.1\.1\.6"):
        bad.get(["1.3.6.1.2.1.1.1.0"])
    assert agent.decrypt_errors == 1
    # auth itself was fine — no wrong-digest increment
    assert agent.wrong_digests == 0


def test_v3_priv_requires_auth():
    import pytest
    from nifi_spark.sources.snmp import (SnmpError, SnmpV3Agent,
                                         SnmpV3Session, encode_v3_message)
    with pytest.raises(SnmpError, match="priv requires auth"):
        encode_v3_message(1, 0xA0, 1, [], priv_key=b"k" * 16)
    agent = SnmpV3Agent(mib={}, users={"ops": ("sha", "authpass123")})
    with pytest.raises(SnmpError, match="priv requires auth"):
        SnmpV3Session(agent.transport, "ops",
                      priv_password="privonly", priv_proto="aes")


def test_v3_timeliness_window_and_resync():
    from nifi_spark.sources.snmp import (SnmpV3Agent, SnmpV3Session)
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "h"},
                        users={"admin": ("sha", "authpass123")})
    s = SnmpV3Session(agent.transport, "admin",
                      auth_password="authpass123")
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == [("1.3.6.1.2.1.1.5.0", "h")]
    assert agent.not_in_window == 0
    # clock drift beyond the ±150 s window -> authenticated
    # notInTimeWindow report -> client resyncs and retries
    agent.etime += 500
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == [("1.3.6.1.2.1.1.5.0", "h")]
    assert agent.not_in_window == 1
    assert s.etime == agent.etime
    # engine reboot (boots bump) resyncs the same way
    agent.boots += 1
    agent.etime = 7
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == [("1.3.6.1.2.1.1.5.0", "h")]
    assert agent.not_in_window == 2
    assert (s.boots, s.etime) == (agent.boots, agent.etime)


def test_v3_small_drift_within_window_ok():
    from nifi_spark.sources.snmp import SnmpV3Agent, SnmpV3Session
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "h"},
                        users={"admin": ("md5", "authpass123")})
    s = SnmpV3Session(agent.transport, "admin",
                      auth_password="authpass123", proto="md5")
    agent.etime += 150          # exactly at the boundary: still valid
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == [("1.3.6.1.2.1.1.5.0", "h")]
    assert agent.not_in_window == 0


def test_v3_maxed_boots_never_validates():
    import pytest as _pytest
    from nifi_spark.sources.snmp import (SnmpError, SnmpV3Agent,
                                         SnmpV3Session)
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "h"},
                        users={"admin": ("sha", "authpass123")},
                        boots=2 ** 31 - 1)
    s = SnmpV3Session(agent.transport, "admin",
                      auth_password="authpass123")
    # resync once, retry, still rejected -> surfaced as a report error
    with _pytest.raises(SnmpError, match="report"):
        s.get(["1.3.6.1.2.1.1.5.0"])
    assert agent.not_in_window == 2


def test_v3_noauth_skips_timeliness():
    from nifi_spark.sources.snmp import SnmpV3Agent, SnmpV3Session
    agent = SnmpV3Agent(mib={"1.3.6.1.2.1.1.5.0": "h"},
                        users={"guest": None})
    s = SnmpV3Session(agent.transport, "guest")
    agent.etime += 10_000
    assert s.get(["1.3.6.1.2.1.1.5.0"])["varbinds"] == [("1.3.6.1.2.1.1.5.0", "h")]
    assert agent.not_in_window == 0
