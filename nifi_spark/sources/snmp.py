"""GetSNMP / SetSNMP analogs — SNMP v2c over a real BER codec, with an
in-process agent for loopback.

NiFi ancestors: nifi-snmp-bundle GetSNMP.java (strategies GET and WALK
— walk = repeated GETNEXT until the subtree ends), SetSNMP.java, and
SNMPUtils.java:62-67 (the ``snmp$``-prefixed attribute surface:
requestID / errorStatus / errorIndex / variableBindings). The
reference rides snmp4j; here the wire format itself is implemented:
ASN.1 BER (definite lengths) for INTEGER / OCTET STRING / NULL /
OBJECT IDENTIFIER / SEQUENCE plus the SNMP application types
(IpAddress, Counter32, Gauge32, TimeTicks), and the v2c message
``SEQUENCE(version, community, PDU(request-id, error-status,
error-index, varbind-list))`` with GetRequest/GetNextRequest/
GetResponse/SetRequest PDUs.

SNMPv3 USM (RFC 3412/3414) is implemented for noAuthNoPriv and
authNoPriv — the v3 message envelope (msgGlobalData, the
securityParameters octet-string wrapping the USM sequence, scoped
PDUs), engine discovery (empty-engine-ID probe → Report PDU carrying
usmStatsUnknownEngineIDs + the agent's engineID/boots/time, exactly
the snmp4j dance the reference triggers via its SNMPv3 properties),
RFC 3414 A.2 password-to-key (1 MB repetition) with key localization
H(Ku||engineID||Ku), and HMAC-MD5-96 / HMAC-SHA-96 authentication
(digest computed over the whole message with zeroed msgAuthParams,
wrong digests answered with usmStatsWrongDigests).

authPriv is implemented too: CBC-DES privacy per RFC 3414 §8 (DES key
= first 8 bytes of the localized priv key, pre-IV = next 8, salt =
engineBoots ++ local counter, IV = salt XOR pre-IV, zero padding — BER
lengths delimit the plaintext) and CFB128-AES-128 per RFC 3826 (key =
first 16 localized bytes, IV = boots ++ time ++ 64-bit salt carried in
msgPrivacyParameters, no padding). The block ciphers themselves are
pure-stdlib FIPS implementations in functions/blockciphers.py, pinned
to the published known-answer vectors. Garbled ciphertext answers
with usmStatsDecryptionErrors; priv-without-auth answers with
usmStatsUnsupportedSecLevels. Timeliness (RFC 3414 §3.2(7)) is
enforced on the authoritative side for authenticated requests —
boots must match exactly, time within ±150 s, boots 2^31-1 never
validates — answered with an AUTHENTICATED usmStatsNotInTimeWindow
report (§3.2(7)b securityLevel rule), from which the session
resynchronizes per §2.3: trust the report's boots/time only after
its HMAC verifies, update, retry once. The agent's clock is a plain
mutable field, so tests drive drift/reboot scenarios directly.

Transport = one injectable request/response callable
``transport(request_bytes) -> response_bytes`` (SNMP is datagram
request/response — no session state to thread); `SnmpAgent.transport`
is the loopback, production wraps a UDP socket.
"""

from __future__ import annotations

from dataclasses import dataclass, field

INTEGER, OCTET_STRING, NULL, OID, SEQUENCE = 0x02, 0x04, 0x05, 0x06, 0x30
IPADDRESS, COUNTER32, GAUGE32, TIMETICKS = 0x40, 0x41, 0x42, 0x43
GET_REQUEST, GETNEXT_REQUEST, GET_RESPONSE, SET_REQUEST = \
    0xA0, 0xA1, 0xA2, 0xA3
NO_SUCH_NAME = 2
END_OF_MIB = "endOfMibView"


class SnmpError(ValueError):
    pass


# --------------------------------------------------------------- BER


def _ber_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def ber(tag: int, body: bytes) -> bytes:
    return bytes([tag]) + _ber_len(len(body)) + body


def ber_int(v: int, tag: int = INTEGER) -> bytes:
    if v == 0:
        return ber(tag, b"\x00")
    n = (v.bit_length() + 8) // 8          # room for the sign bit
    return ber(tag, v.to_bytes(n, "big", signed=True))


def ber_oid(oid: str) -> bytes:
    arcs = [int(a) for a in oid.strip(".").split(".")]
    if len(arcs) < 2:
        raise SnmpError(f"oid too short: {oid}")
    body = bytearray([40 * arcs[0] + arcs[1]])
    for a in arcs[2:]:
        chunk = bytearray()
        chunk.append(a & 0x7F)
        a >>= 7
        while a:
            chunk.append(0x80 | (a & 0x7F))
            a >>= 7
        body += bytes(reversed(chunk))
    return ber(OID, bytes(body))


def _parse_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    tag = buf[pos]
    ln = buf[pos + 1]
    pos += 2
    if ln & 0x80:
        nb = ln & 0x7F
        ln = int.from_bytes(buf[pos:pos + nb], "big")
        pos += nb
    return tag, buf[pos:pos + ln], pos + ln


def _parse_int(body: bytes) -> int:
    return int.from_bytes(body, "big", signed=True)


def _parse_oid(body: bytes) -> str:
    arcs = [body[0] // 40, body[0] % 40]
    a = 0
    for b in body[1:]:
        a = (a << 7) | (b & 0x7F)
        if not b & 0x80:
            arcs.append(a)
            a = 0
    return ".".join(map(str, arcs))


def _decode_value(tag: int, body: bytes):
    if tag == INTEGER:
        return _parse_int(body)
    if tag in (COUNTER32, GAUGE32, TIMETICKS):
        return int.from_bytes(body, "big")
    if tag == OCTET_STRING:
        return body.decode("utf-8", errors="replace")
    if tag == IPADDRESS:
        return ".".join(str(b) for b in body)
    if tag == NULL:
        return None
    if tag == OID:
        return _parse_oid(body)
    raise SnmpError(f"unsupported value tag {tag:#04x}")


def _encode_value(v) -> bytes:
    if v is None:
        return ber(NULL, b"")
    if isinstance(v, tuple):                # (tag, raw int) app types
        tag, n = v
        return ber(tag, n.to_bytes(max(1, (n.bit_length() + 7) // 8),
                                   "big"))
    if isinstance(v, int):
        return ber_int(v)
    if isinstance(v, str):
        return ber(OCTET_STRING, v.encode())
    raise SnmpError(f"unsupported python value {type(v).__name__}")


def encode_message(community: str, pdu_type: int, request_id: int,
                   varbinds: list[tuple[str, object]],
                   error_status: int = 0, error_index: int = 0) -> bytes:
    vb = b"".join(ber(SEQUENCE, ber_oid(oid) + _encode_value(val))
                  for oid, val in varbinds)
    pdu = ber(pdu_type, ber_int(request_id) + ber_int(error_status)
              + ber_int(error_index) + ber(SEQUENCE, vb))
    return ber(SEQUENCE, ber_int(1)            # version = v2c
               + ber(OCTET_STRING, community.encode()) + pdu)


def decode_message(blob: bytes) -> dict:
    tag, body, _ = _parse_tlv(blob, 0)
    if tag != SEQUENCE:
        raise SnmpError("message is not a SEQUENCE")
    pos = 0
    tag, vbody, pos = _parse_tlv(body, pos)
    version = _parse_int(vbody)
    tag, cbody, pos = _parse_tlv(body, pos)
    community = cbody.decode()
    pdu_type, pdu, _ = _parse_tlv(body, pos)
    pos = 0
    _, rid, pos = _parse_tlv(pdu, pos)
    _, est, pos = _parse_tlv(pdu, pos)
    _, eix, pos = _parse_tlv(pdu, pos)
    _, vbl, pos = _parse_tlv(pdu, pos)
    varbinds = []
    p = 0
    while p < len(vbl):
        _, one, p = _parse_tlv(vbl, p)
        q = 0
        otag, obody, q = _parse_tlv(one, q)
        vtag, vbody2, q = _parse_tlv(one, q)
        varbinds.append((_parse_oid(obody),
                         _decode_value(vtag, vbody2)))
    return {"community": community, "pdu_type": pdu_type,
            "request_id": _parse_int(rid),
            "error_status": _parse_int(est),
            "error_index": _parse_int(eix),
            "varbinds": varbinds,
            "snmp_version": version}


# --------------------------------------------------------------- agent


def _oid_key(oid: str) -> tuple[int, ...]:
    return tuple(int(a) for a in oid.strip(".").split("."))


@dataclass
class SnmpAgent:
    """In-process v2c agent: GET / GETNEXT (lexicographic) / SET over
    a MIB dict {oid: value}. `community` is checked like the
    reference's community-string property."""

    mib: dict[str, object] = field(default_factory=dict)
    community: str = "public"

    def transport(self, request: bytes) -> bytes:
        msg = decode_message(request)
        rid = msg["request_id"]
        if msg["community"] != self.community:
            return encode_message(self.community, GET_RESPONSE, rid,
                                  msg["varbinds"], error_status=16)
        out: list[tuple[str, object]] = []
        err, eix = 0, 0
        if msg["pdu_type"] == GET_REQUEST:
            for i, (oid, _v) in enumerate(msg["varbinds"], start=1):
                if oid in self.mib:
                    out.append((oid, self.mib[oid]))
                else:
                    out.append((oid, None))
                    err, eix = NO_SUCH_NAME, i
        elif msg["pdu_type"] == GETNEXT_REQUEST:
            ordered = sorted(self.mib, key=_oid_key)
            for oid, _v in msg["varbinds"]:
                key = _oid_key(oid)
                nxt = next((o for o in ordered if _oid_key(o) > key),
                           None)
                if nxt is None:
                    out.append((oid, END_OF_MIB))
                else:
                    out.append((nxt, self.mib[nxt]))
        elif msg["pdu_type"] == SET_REQUEST:
            for oid, val in msg["varbinds"]:
                self.mib[oid] = val
                out.append((oid, val))
        else:
            err = 5                            # genErr
            out = msg["varbinds"]
        return encode_message(self.community, GET_RESPONSE, rid, out,
                              error_status=err, error_index=eix)


# -------------------------------------------------------------- client


def snmp_get(transport, oids: list[str], *,
             community: str = "public", request_id: int = 1) -> dict:
    """GetSNMP strategy=GET: one GetRequest; returns the reference's
    attribute surface (snmp$requestID/errorStatus/errorIndex +
    varbinds)."""
    resp = decode_message(transport(encode_message(
        community, GET_REQUEST, request_id,
        [(o, None) for o in oids])))
    if resp["pdu_type"] != GET_RESPONSE:
        raise SnmpError(f"expected GetResponse, got "
                        f"{resp['pdu_type']:#x}")
    return {"snmp$requestID": resp["request_id"],
            "snmp$errorStatus": resp["error_status"],
            "snmp$errorIndex": resp["error_index"],
            "varbinds": resp["varbinds"]}


def snmp_walk(transport, root: str, *, community: str = "public",
              max_steps: int = 100000) -> list[tuple[str, object]]:
    """GetSNMP strategy=WALK: GETNEXT loop until the subtree ends."""
    rootk = _oid_key(root)
    cur = root
    out: list[tuple[str, object]] = []
    for rid in range(1, max_steps + 1):
        resp = decode_message(transport(encode_message(
            community, GETNEXT_REQUEST, rid, [(cur, None)])))
        oid, val = resp["varbinds"][0]
        if val == END_OF_MIB or _oid_key(oid)[:len(rootk)] != rootk:
            return out
        out.append((oid, val))
        cur = oid
    raise SnmpError("walk did not terminate")


def snmp_set(transport, varbinds: list[tuple[str, object]], *,
             community: str = "public", request_id: int = 1) -> dict:
    """SetSNMP: one SetRequest."""
    resp = decode_message(transport(encode_message(
        community, SET_REQUEST, request_id, varbinds)))
    return {"snmp$errorStatus": resp["error_status"],
            "varbinds": resp["varbinds"]}


# ----------------------------------------------------------- SNMPv3


REPORT = 0xA8
USM_STATS_UNKNOWN_ENGINE = "1.3.6.1.6.3.15.1.1.4.0"
USM_STATS_WRONG_DIGESTS = "1.3.6.1.6.3.15.1.1.5.0"
USM_STATS_UNKNOWN_USER = "1.3.6.1.6.3.15.1.1.3.0"
USM_STATS_UNSUPPORTED_LEVELS = "1.3.6.1.6.3.15.1.1.1.0"
USM_STATS_DECRYPT_ERRORS = "1.3.6.1.6.3.15.1.1.6.0"
USM_STATS_NOT_IN_WINDOW = "1.3.6.1.6.3.15.1.1.2.0"
TIME_WINDOW = 150                    # RFC 3414 §2.2.3 seconds
_AUTH_LEN = 12                      # HMAC-96 truncation, both protocols


def password_to_key(password: str, proto: str = "sha") -> bytes:
    """RFC 3414 A.2: hash 1 MB of the repeated password -> Ku."""
    import hashlib
    h = hashlib.new("md5" if proto == "md5" else "sha1")
    pw = password.encode()
    reps, rem = divmod(1_048_576, len(pw))
    h.update(pw * reps + pw[:rem])
    return h.digest()


def localize_key(ku: bytes, engine_id: bytes, proto: str = "sha") -> bytes:
    """Kul = H(Ku || engineID || Ku) — RFC 3414 §2.6."""
    import hashlib
    h = hashlib.new("md5" if proto == "md5" else "sha1")
    h.update(ku + engine_id + ku)
    return h.digest()


def _auth_hmac(kul: bytes, message: bytes, proto: str) -> bytes:
    import hmac
    return hmac.new(kul, message,
                    "md5" if proto == "md5" else "sha1"
                    ).digest()[:_AUTH_LEN]


def _usm_params(engine_id: bytes, boots: int, etime: int, user: str,
                auth_params: bytes, priv_params: bytes = b"") -> bytes:
    return ber(OCTET_STRING, ber(SEQUENCE,
               ber(OCTET_STRING, engine_id)
               + ber_int(boots) + ber_int(etime)
               + ber(OCTET_STRING, user.encode())
               + ber(OCTET_STRING, auth_params)
               + ber(OCTET_STRING, priv_params)))


def priv_encrypt(kul: bytes, priv_proto: str, boots: int, etime: int,
                 salt_int: int, plaintext: bytes) -> tuple[bytes, bytes]:
    """Encrypt a scoped PDU; returns (ciphertext, msgPrivacyParameters).
    `kul` is the LOCALIZED priv key (RFC 3414 §2.6, derived with the
    user's AUTH hash). DES: RFC 3414 §8.1.1.1. AES: RFC 3826 §3.1."""
    from ..functions import blockciphers as bc
    if priv_proto == "des":
        salt = ((boots & 0xFFFFFFFF).to_bytes(4, "big")
                + (salt_int & 0xFFFFFFFF).to_bytes(4, "big"))
        iv = bytes(a ^ b for a, b in zip(salt, kul[8:16]))
        pad = (-len(plaintext)) % 8
        return bc.des_cbc_encrypt(kul[:8], iv,
                                  plaintext + b"\x00" * pad), salt
    if priv_proto == "aes":
        salt = (salt_int & (2 ** 64 - 1)).to_bytes(8, "big")
        iv = ((boots & 0xFFFFFFFF).to_bytes(4, "big")
              + (etime & 0xFFFFFFFF).to_bytes(4, "big") + salt)
        return bc.aes128_cfb_encrypt(kul[:16], iv, plaintext), salt
    raise SnmpError(f"unknown priv protocol {priv_proto!r}")


def priv_decrypt(kul: bytes, priv_proto: str, boots: int, etime: int,
                 priv_params: bytes, ciphertext: bytes) -> bytes:
    from ..functions import blockciphers as bc
    if priv_proto == "des":
        if len(priv_params) != 8 or len(ciphertext) % 8:
            raise SnmpError("malformed DES priv parameters")
        iv = bytes(a ^ b for a, b in zip(priv_params, kul[8:16]))
        return bc.des_cbc_decrypt(kul[:8], iv, ciphertext)
    if priv_proto == "aes":
        if len(priv_params) != 8:
            raise SnmpError("malformed AES priv parameters")
        iv = ((boots & 0xFFFFFFFF).to_bytes(4, "big")
              + (etime & 0xFFFFFFFF).to_bytes(4, "big") + priv_params)
        return bc.aes128_cfb_decrypt(kul[:16], iv, ciphertext)
    raise SnmpError(f"unknown priv protocol {priv_proto!r}")


def encode_v3_message(msg_id: int, pdu_type: int, request_id: int,
                      varbinds: list[tuple[str, object]], *,
                      engine_id: bytes = b"", boots: int = 0,
                      etime: int = 0, user: str = "",
                      auth_key: bytes | None = None, proto: str = "sha",
                      priv_key: bytes | None = None,
                      priv_proto: str = "aes", priv_salt: int = 0,
                      error_status: int = 0, error_index: int = 0,
                      reportable: bool = True) -> bytes:
    """RFC 3412 SNMPv3 envelope around a scoped PDU; `auth_key` is the
    LOCALIZED key (Kul). The digest is computed with msgAuthParams
    zeroed, then the message is rebuilt with the real digest (same
    lengths, so offsets are identical — RFC 3414 §6.3.1). With
    `priv_key` (also localized) the scoped PDU is encrypted FIRST and
    shipped as an OCTET STRING (RFC 3414 §3.1 step 8a), then
    authenticated — auth covers the ciphertext."""
    vb = b"".join(ber(SEQUENCE, ber_oid(oid) + _encode_value(val))
                  for oid, val in varbinds)
    pdu = ber(pdu_type, ber_int(request_id) + ber_int(error_status)
              + ber_int(error_index) + ber(SEQUENCE, vb))
    scoped = ber(SEQUENCE, ber(OCTET_STRING, engine_id)
                 + ber(OCTET_STRING, b"") + pdu)
    priv_params = b""
    if priv_key is not None:
        if auth_key is None:
            raise SnmpError("priv requires auth (no authNoPriv+priv level)")
        ct, priv_params = priv_encrypt(priv_key, priv_proto, boots,
                                       etime, priv_salt, scoped)
        scoped = ber(OCTET_STRING, ct)
    flags = ((0x04 if reportable else 0) | (0x01 if auth_key else 0)
             | (0x02 if priv_key else 0))
    global_data = ber(SEQUENCE, ber_int(msg_id) + ber_int(65507)
                      + ber(OCTET_STRING, bytes([flags])) + ber_int(3))

    def build(auth_params: bytes) -> bytes:
        return ber(SEQUENCE, ber_int(3) + global_data
                   + _usm_params(engine_id, boots, etime, user,
                                 auth_params, priv_params) + scoped)

    if auth_key is None:
        return build(b"")
    digest = _auth_hmac(auth_key, build(b"\x00" * _AUTH_LEN), proto)
    return build(digest)


def decode_v3_message(blob: bytes) -> dict:
    tag, body, _ = _parse_tlv(blob, 0)
    if tag != SEQUENCE:
        raise SnmpError("message is not a SEQUENCE")
    pos = 0
    _, vbody, pos = _parse_tlv(body, pos)
    if _parse_int(vbody) != 3:
        raise SnmpError("not an SNMPv3 message")
    _, gdata, pos = _parse_tlv(body, pos)
    g = 0
    _, mid, g = _parse_tlv(gdata, g)
    _, _msz, g = _parse_tlv(gdata, g)
    _, mflags, g = _parse_tlv(gdata, g)
    _, secp, pos = _parse_tlv(body, pos)
    s = 0
    _, usm, s = _parse_tlv(secp, s)
    u = 0
    _, eng, u = _parse_tlv(usm, u)
    _, bts, u = _parse_tlv(usm, u)
    _, tim, u = _parse_tlv(usm, u)
    _, usr, u = _parse_tlv(usm, u)
    auth_off = len(blob) - len(body) + pos - len(secp) + s - len(usm) + u
    _, aut, u = _parse_tlv(usm, u)
    auth_off += 2                        # past the authParams TL header
    _, prv, u = _parse_tlv(usm, u)
    stag, scoped, _ = _parse_tlv(body, pos)
    out = {"msg_id": _parse_int(mid), "flags": mflags[0],
           "engine_id": eng, "boots": _parse_int(bts),
           "time": _parse_int(tim), "user": usr.decode(),
           "auth_params": aut, "auth_offset": auth_off,
           "priv_params": prv, "encrypted": None,
           "pdu_type": None, "request_id": None,
           "error_status": None, "error_index": None, "varbinds": None}
    if stag == OCTET_STRING:                      # priv: ciphertext
        out["encrypted"] = scoped
        return out
    out.update(_parse_scoped(scoped))
    return out


def _parse_scoped(scoped: bytes) -> dict:
    """Parse a PLAINTEXT scoped-PDU body (contextEngineID,
    contextName, PDU) into the pdu fields of a decoded message."""
    sp = 0
    _, _ceid, sp = _parse_tlv(scoped, sp)
    _, _cnam, sp = _parse_tlv(scoped, sp)
    pdu_type, pdu, _ = _parse_tlv(scoped, sp)
    p = 0
    _, rid, p = _parse_tlv(pdu, p)
    _, est, p = _parse_tlv(pdu, p)
    _, eix, p = _parse_tlv(pdu, p)
    _, vbl, p = _parse_tlv(pdu, p)
    varbinds = []
    q = 0
    while q < len(vbl):
        _, one, q = _parse_tlv(vbl, q)
        r = 0
        _, obody, r = _parse_tlv(one, r)
        vtag, vbody2, r = _parse_tlv(one, r)
        varbinds.append((_parse_oid(obody), _decode_value(vtag, vbody2)))
    return {"pdu_type": pdu_type, "request_id": _parse_int(rid),
            "error_status": _parse_int(est),
            "error_index": _parse_int(eix), "varbinds": varbinds}


def decrypt_scoped(msg: dict, priv_key: bytes, priv_proto: str) -> dict:
    """Decrypt an authPriv message's scoped PDU in place (fills the
    pdu fields) and return it. Raises SnmpError on garbage — the BER
    walk fails, which is how decryption errors surface (there is no
    MAC inside the ciphertext; auth covered the ciphertext)."""
    plain = priv_decrypt(priv_key, priv_proto, msg["boots"],
                         msg["time"], msg["priv_params"],
                         msg["encrypted"])
    try:
        tag, scoped, _ = _parse_tlv(plain, 0)
        if tag != SEQUENCE:
            raise SnmpError("decrypted scoped PDU is not a SEQUENCE")
        msg.update(_parse_scoped(scoped))
    except (SnmpError, ValueError, IndexError) as exc:
        raise SnmpError(f"scoped-PDU decryption failed: {exc}") from exc
    msg["encrypted"] = None
    return msg


def _verify_v3_auth(blob: bytes, msg: dict, kul: bytes,
                    proto: str) -> bool:
    if len(msg["auth_params"]) != _AUTH_LEN:
        return False
    off = msg["auth_offset"]
    zeroed = blob[:off] + b"\x00" * _AUTH_LEN + blob[off + _AUTH_LEN:]
    import hmac
    return hmac.compare_digest(_auth_hmac(kul, zeroed, proto),
                               msg["auth_params"])


def _serve_pdu(mib: dict, pdu_type: int,
               varbinds: list[tuple[str, object]]):
    """Shared GET/GETNEXT/SET dispatch (v2c + v3 agents)."""
    out: list[tuple[str, object]] = []
    err, eix = 0, 0
    if pdu_type == GET_REQUEST:
        for i, (oid, _v) in enumerate(varbinds, start=1):
            if oid in mib:
                out.append((oid, mib[oid]))
            else:
                out.append((oid, None))
                err, eix = NO_SUCH_NAME, i
    elif pdu_type == GETNEXT_REQUEST:
        ordered = sorted(mib, key=_oid_key)
        for oid, _v in varbinds:
            key = _oid_key(oid)
            nxt = next((o for o in ordered if _oid_key(o) > key), None)
            if nxt is None:
                out.append((oid, END_OF_MIB))
            else:
                out.append((nxt, mib[nxt]))
    elif pdu_type == SET_REQUEST:
        for oid, val in varbinds:
            mib[oid] = val
            out.append((oid, val))
    else:
        err, out = 5, list(varbinds)           # genErr
    return out, err, eix


@dataclass
class SnmpV3Agent:
    """In-process SNMPv3/USM agent: engine discovery, per-user
    HMAC-96 auth (localized keys), then the same GET/GETNEXT/SET
    behavior as the v2c agent. `users` maps userName -> None for
    noAuthNoPriv, (auth_proto, auth_password) for authNoPriv, or
    (auth_proto, auth_password, priv_proto, priv_password) for
    authPriv."""

    mib: dict[str, object] = field(default_factory=dict)
    users: dict[str, "tuple | None"] = field(default_factory=dict)
    engine_id: bytes = b"\x80\x00\x1f\x88\x04nifi-spark"
    boots: int = 1
    etime: int = 100
    wrong_digests: int = 0
    decrypt_errors: int = 0
    not_in_window: int = 0
    _salt: int = 0x5A5A0000

    def _kul(self, user: str) -> "tuple[bytes, str] | None":
        cred = self.users.get(user)
        if cred is None:
            return None
        proto, password = cred[0], cred[1]
        return localize_key(password_to_key(password, proto),
                            self.engine_id, proto), proto

    def _priv(self, user: str) -> "tuple[bytes, str] | None":
        cred = self.users.get(user)
        if cred is None or len(cred) < 4:
            return None
        auth_proto, _, priv_proto, priv_password = cred
        # RFC 3414: the priv key is derived with the AUTH protocol's
        # hash, then localized the same way.
        return localize_key(password_to_key(priv_password, auth_proto),
                            self.engine_id, auth_proto), priv_proto

    def _report(self, msg: dict, oid: str, n: int,
                auth: "tuple[bytes, str] | None" = None) -> bytes:
        # request_id is None when the scoped PDU could not be read
        # (encrypted and undecryptable) — RFC 3414 reports use 0 then.
        # notInTimeWindow reports pass `auth`: RFC 3414 §3.2(7)b sends
        # them at the received securityLevel so the non-authoritative
        # engine can TRUST the boots/time it resynchronizes from.
        return encode_v3_message(
            msg["msg_id"], REPORT, msg["request_id"] or 0,
            [(oid, (COUNTER32, n))],
            engine_id=self.engine_id, boots=self.boots, etime=self.etime,
            user=msg["user"] if auth else "",
            auth_key=auth[0] if auth else None,
            proto=auth[1] if auth else "sha",
            reportable=False)

    def transport(self, request: bytes) -> bytes:
        msg = decode_v3_message(request)
        if msg["engine_id"] != self.engine_id:
            return self._report(msg, USM_STATS_UNKNOWN_ENGINE, 1)
        if msg["user"] not in self.users:
            return self._report(msg, USM_STATS_UNKNOWN_USER, 1)
        auth = self._kul(msg["user"])
        if msg["flags"] & 0x01:
            if auth is None or not _verify_v3_auth(request, msg, *auth):
                self.wrong_digests += 1
                return self._report(msg, USM_STATS_WRONG_DIGESTS,
                                    self.wrong_digests)
        elif auth is not None:
            # user requires auth but the request came unauthenticated
            return self._report(msg, USM_STATS_WRONG_DIGESTS,
                                self.wrong_digests + 1)
        if msg["flags"] & 0x01:
            # RFC 3414 §3.2(7)a timeliness, authoritative side: boots
            # must match exactly, time within ±150 s, and a maxed-out
            # boots counter (2^31-1) never validates
            if (msg["boots"] != self.boots
                    or self.boots == 2 ** 31 - 1
                    or abs(msg["time"] - self.etime) > TIME_WINDOW):
                self.not_in_window += 1
                return self._report(msg, USM_STATS_NOT_IN_WINDOW,
                                    self.not_in_window, auth=auth)
        priv = self._priv(msg["user"])
        if msg["flags"] & 0x02:
            if not msg["flags"] & 0x01 or priv is None:
                return self._report(msg, USM_STATS_UNSUPPORTED_LEVELS, 1)
            try:
                decrypt_scoped(msg, *priv)
            except SnmpError:
                self.decrypt_errors += 1
                return self._report(msg, USM_STATS_DECRYPT_ERRORS,
                                    self.decrypt_errors)
        out, err, eix = _serve_pdu(self.mib, msg["pdu_type"],
                                   msg["varbinds"])
        self._salt += 1
        return encode_v3_message(
            msg["msg_id"], GET_RESPONSE, msg["request_id"], out,
            engine_id=self.engine_id, boots=self.boots, etime=self.etime,
            user=msg["user"],
            auth_key=auth[0] if auth and msg["flags"] & 0x01 else None,
            proto=auth[1] if auth else "sha",
            priv_key=priv[0] if priv and msg["flags"] & 0x02 else None,
            priv_proto=priv[1] if priv else "aes", priv_salt=self._salt,
            error_status=err, error_index=eix, reportable=False)


def snmp_v3_discover(transport) -> tuple[bytes, int, int]:
    """Engine discovery: empty-engine-ID probe -> the agent's Report
    carries its engineID/boots/time (RFC 3414 §4)."""
    resp = decode_v3_message(transport(encode_v3_message(
        1, GET_REQUEST, 1, [])))
    if (resp["pdu_type"] != REPORT
            or resp["varbinds"][0][0] != USM_STATS_UNKNOWN_ENGINE):
        raise SnmpError(f"unexpected discovery response {resp}")
    return resp["engine_id"], resp["boots"], resp["time"]


class SnmpV3Session:
    """USM session: discovers the engine once, localizes the key, then
    offers the same get/walk/set surface as the v2c helpers."""

    def __init__(self, transport, user: str, *,
                 auth_password: str | None = None, proto: str = "sha",
                 priv_password: str | None = None,
                 priv_proto: str = "aes"):
        self.transport = transport
        self.user = user
        self.proto = proto
        self.priv_proto = priv_proto
        self.engine_id, self.boots, self.etime = \
            snmp_v3_discover(transport)
        self.kul = (localize_key(password_to_key(auth_password, proto),
                                 self.engine_id, proto)
                    if auth_password else None)
        if priv_password and not auth_password:
            raise SnmpError("priv requires auth")
        self.priv_kul = (localize_key(
            password_to_key(priv_password, proto),
            self.engine_id, proto) if priv_password else None)
        self._mid = 100
        self._salt = 0x00A50000

    def _rpc(self, pdu_type: int,
             varbinds: list[tuple[str, object]],
             _resynced: bool = False) -> dict:
        self._mid += 1
        self._salt += 1
        resp_blob = self.transport(encode_v3_message(
            self._mid, pdu_type, self._mid, varbinds,
            engine_id=self.engine_id, boots=self.boots,
            etime=self.etime, user=self.user, auth_key=self.kul,
            proto=self.proto, priv_key=self.priv_kul,
            priv_proto=self.priv_proto, priv_salt=self._salt))
        resp = decode_v3_message(resp_blob)
        if (resp["pdu_type"] == REPORT and resp["varbinds"]
                and resp["varbinds"][0][0] == USM_STATS_NOT_IN_WINDOW
                and not _resynced and self.kul is not None):
            # RFC 3414 §2.3 time synchronization: trust the report's
            # boots/time ONLY if its HMAC verifies, then retry once
            if not _verify_v3_auth(resp_blob, resp, self.kul,
                                   self.proto):
                raise SnmpError("unauthenticated notInTimeWindow "
                                "report — refusing to resync")
            self.boots, self.etime = resp["boots"], resp["time"]
            return self._rpc(pdu_type, varbinds, _resynced=True)
        if self.kul is not None and resp["encrypted"] is None \
                and resp["pdu_type"] == REPORT:
            raise SnmpError(f"agent report: {resp['varbinds']}")
        if self.kul is not None and not _verify_v3_auth(
                resp_blob, resp, self.kul, self.proto):
            raise SnmpError("response failed HMAC verification")
        if resp["encrypted"] is not None:
            if self.priv_kul is None:
                raise SnmpError("unexpected encrypted response")
            decrypt_scoped(resp, self.priv_kul, self.priv_proto)
        if resp["pdu_type"] == REPORT:
            raise SnmpError(f"agent report: {resp['varbinds']}")
        return resp

    def get(self, oids: list[str]) -> dict:
        resp = self._rpc(GET_REQUEST, [(o, None) for o in oids])
        return {"snmp$requestID": resp["request_id"],
                "snmp$errorStatus": resp["error_status"],
                "snmp$errorIndex": resp["error_index"],
                "varbinds": resp["varbinds"]}

    def walk(self, root: str,
             max_steps: int = 100000) -> list[tuple[str, object]]:
        rootk = _oid_key(root)
        cur = root
        out: list[tuple[str, object]] = []
        for _ in range(max_steps):
            resp = self._rpc(GETNEXT_REQUEST, [(cur, None)])
            oid, val = resp["varbinds"][0]
            if val == END_OF_MIB or _oid_key(oid)[:len(rootk)] != rootk:
                return out
            out.append((oid, val))
            cur = oid
        raise SnmpError("walk did not terminate")

    def set(self, varbinds: list[tuple[str, object]]) -> dict:
        resp = self._rpc(SET_REQUEST, varbinds)
        return {"snmp$errorStatus": resp["error_status"],
                "varbinds": resp["varbinds"]}
