"""PutTCP / PutUDP / PutSyslog analogs — the socket-sink half of the
listener family.

NiFi ancestors: standard/PutTCP.java (FlowFile content + an Outgoing
Message Delimiter over one connection), standard/PutUDP.java (one
FlowFile = one datagram), standard/PutSyslog.java:330-360 (the message
builder ``<priority>[version ]timestamp hostname body``, validation
against SyslogParser.MESSAGE_PATTERNS before sending — invalid
messages route to 'invalid' WITHOUT being sent — and the TCP-only
trailing ``\\n`` appended AFTER validation).

The send side is an injectable ``send(bytes) -> None`` (production
wraps a connected TCP socket's sendall or a UDP socket's sendto),
mirroring every other transport seam in this repo. `sent_feed` turns
the captured sends into the ``recv()`` feed a `ListenSource` drains,
so tests and the gate prove the full put → listen → spool → parse
circle without a network.

SyslogParser's two validation regexes (RFC 5424 / RFC 3164) are
reproduced verbatim from
standard/syslog/SyslogParser.java:36-56 — Java and Python regex
semantics coincide for these (character classes, non-capturing
groups, greedy ``.*``).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

SYSLOG_MSG_RFC5424_0 = (
    r"(?:\<(\d{1,3})\>)"
    r"(?:(\d)?\s?)"
    r"(?:(\d{4}[-]\d{2}[-]\d{2}[T]\d{2}[:]\d{2}[:]\d{2}"
    r"(?:\.\d{1,6})?(?:[+-]\d{2}[:]\d{2}|Z)?)|-)"
    r"\s"
    r"(?:([\w][\w\d\.@\-]*)|-)"
    r"\s"
    r"(.*)$")

SYSLOG_MSG_RFC3164_0 = (
    r"(?:\<(\d{1,3})\>)"
    r"(?:(\d)?\s?)"
    r"([A-Z][a-z][a-z]\s{1,2}\d{1,2}\s\d{2}[:]\d{2}[:]\d{2})"
    r"\s"
    r"([\w][\w\d\.@-]*)"
    r"\s(.*)$")

MESSAGE_PATTERNS = (re.compile(SYSLOG_MSG_RFC5424_0),
                    re.compile(SYSLOG_MSG_RFC3164_0))


def syslog_is_valid(message: str) -> bool:
    """PutSyslog.isValid — matches either spec pattern."""
    return any(p.match(message) for p in MESSAGE_PATTERNS)


def put_tcp(messages: Iterable[bytes | str], send, *,
            demarcator: bytes = b"\n", charset: str = "utf-8") -> int:
    """PutTCP: each message's bytes followed by the outgoing message
    delimiter, all over one connection. Returns messages sent."""
    n = 0
    for m in messages:
        if isinstance(m, str):
            m = m.encode(charset)
        send(m + demarcator)
        n += 1
    return n


def put_udp(messages: Iterable[bytes | str], send, *,
            charset: str = "utf-8") -> int:
    """PutUDP: one message = one datagram, no delimiter."""
    n = 0
    for m in messages:
        if isinstance(m, str):
            m = m.encode(charset)
        send(m)
        n += 1
    return n


def build_syslog_message(priority: int | str, timestamp: str,
                         hostname: str, body: str,
                         version: "int | str | None" = None) -> str:
    """PutSyslog.java's exact builder: ``<priority>`` then
    ``version + ' '`` only when version is set, then
    ``timestamp hostname body``."""
    out = f"<{priority}>"
    if version is not None and str(version) != "":
        out += f"{version} "
    return f"{out}{timestamp} {hostname} {body}"


def put_syslog(rows: Iterable[dict], send, *, protocol: str = "TCP",
               charset: str = "utf-8") -> tuple[int, list[str]]:
    """PutSyslog: build each row's message from priority / version /
    timestamp / hostname / body keys, validate BEFORE the TCP newline
    is appended (the reference's order), send valid ones, collect
    invalid ones unsent. Returns (n_sent, invalid_messages)."""
    sent = 0
    invalid: list[str] = []
    for row in rows:
        msg = build_syslog_message(
            row["priority"], row["timestamp"], row["hostname"],
            row["body"], row.get("version"))
        if not syslog_is_valid(msg):
            invalid.append(msg)
            continue
        wire = msg + ("\n" if protocol.upper() == "TCP" else "")
        send(wire.encode(charset))
        sent += 1
    return sent, invalid


def sent_feed(chunks: "list[bytes]", sender: str = "127.0.0.1",
              chop: "int | None" = None):
    """Turn captured send() payloads into a ListenSource recv() feed:
    (sender, payload) tuples, optionally re-chopped into `chop`-byte
    reads to exercise TCP reassembly."""
    if chop:
        stream = b"".join(chunks)
        chunks = [stream[p:p + chop] for p in range(0, len(stream), chop)]
    it = iter([(sender, c) for c in chunks])
    return lambda: next(it, None)
