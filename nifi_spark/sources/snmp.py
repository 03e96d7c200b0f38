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
GetResponse/SetRequest PDUs. SNMPv3 USM security is a declared
boundary (the reference defaults to v1/v2c community strings too).

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
