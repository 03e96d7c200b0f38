"""Site-to-Site HTTP transport — the REST shape of the S2S protocol.

NiFi ancestors: nifi-site-to-site-client SiteToSiteRestApiClient.java
(initiateTransaction :351-400 — ``POST /data-transfer/{input-ports|
output-ports}/{portId}/transactions`` answered 201 with a Location
transaction URL, ``x-location-uri-intent: transaction-url``, the
confirmed ``x-nifi-site-to-site-protocol-version`` and the server TTL
header; openConnectionForSend :642 — ``POST {txUrl}/flow-files`` with
an application/octet-stream body of codec-encoded DataPackets,
answered 202 whose text/plain body is the server's CRC32 checksum;
openConnectionForReceive :580 — ``GET {txUrl}/flow-files`` returning
200 when there is no data and 202 + the packet stream otherwise;
commitTransferFlowFiles :1295 / commitReceivingFlowFiles :1258 —
``DELETE {txUrl}?responseCode=N[&checksum=C]`` answered with a
TransactionResultEntity JSON; extendTransaction :906 — ``PUT
{txUrl}``), HttpClientTransaction.java (the same
StandardFlowFileCodec + CRC32 two-phase commit as the socket
transport, with the HTTP requests standing in for the response-code
exchanges), and HttpHeaders.java (the exact header names).

Both halves ride one injectable seam:
``http(method, path, headers, body) -> (status, headers, body)`` —
`S2SHttpServer.handle` IS that callable for loopback, production
wraps it in any HTTP server (the `http_listen` machinery serves) or
points the client at urllib. Packet framing + CRC reuse
`site_to_site`'s codec, so socket and HTTP transports are
byte-compatible at the stream level exactly like the reference.

Response codes mirror ResponseCode.java: CONFIRM_TRANSACTION=12,
TRANSACTION_FINISHED=13, CANCEL_TRANSACTION=15, BAD_CHECKSUM=19.
"""

from __future__ import annotations

import io
import json
import zlib
from dataclasses import dataclass, field

from nifi_spark.sources.site_to_site import (DataPacket, S2SProtocolError,
                                             decode_packet, encode_packet)

PROTOCOL_VERSION_HEADER = "x-nifi-site-to-site-protocol-version"
SERVER_TTL_HEADER = "x-nifi-site-to-site-server-transaction-ttl"
LOCATION_INTENT_HEADER = "x-location-uri-intent"
LOCATION_INTENT_VALUE = "transaction-url"

CONFIRM_TRANSACTION = 12
TRANSACTION_FINISHED = 13
CANCEL_TRANSACTION = 15
BAD_CHECKSUM = 19


def encode_packets(packets: "list[DataPacket]") -> tuple[bytes, str]:
    """Codec-encode a packet list; → (stream bytes, CRC32 checksum
    string) — the CheckedOutputStream the socket transport uses."""
    buf = io.BytesIO()
    for p in packets:
        encode_packet(p, buf)
    blob = buf.getvalue()
    return blob, str(zlib.crc32(blob))


def decode_packets(blob: bytes) -> tuple["list[DataPacket]", str]:
    inp = io.BytesIO(blob)
    out: list[DataPacket] = []
    while True:
        p = decode_packet(inp)
        if p is None:
            break
        out.append(p)
    return out, str(zlib.crc32(blob))


@dataclass
class _HttpTx:
    port_id: str
    direction: str                        # 'send' | 'receive'
    packets: "list[DataPacket]" = field(default_factory=list)
    checksum: str = ""
    data_sent: bool = False


@dataclass
class S2SHttpServer:
    """The server half: input/output ports are message queues;
    `handle` is the injectable HTTP seam. Transactions live until
    their commit DELETE (or cancel)."""

    input_ports: "dict[str, list[DataPacket]]" = field(
        default_factory=dict)
    output_ports: "dict[str, list[DataPacket]]" = field(
        default_factory=dict)
    ttl_seconds: int = 30
    protocol_version: int = 5
    batch_count: int = 100
    _txs: "dict[str, _HttpTx]" = field(default_factory=dict)
    _next_tx: int = 1

    def handle(self, method: str, path: str, headers: dict,
               body: bytes) -> tuple[int, dict, bytes]:
        path, _, query = path.partition("?")
        params = dict(kv.split("=", 1) for kv in query.split("&") if kv)
        parts = [p for p in path.split("/") if p]
        if parts == ["site-to-site"]:
            ports = ([{"id": i, "name": i, "type": "INPUT_PORT"}
                      for i in self.input_ports]
                     + [{"id": o, "name": o, "type": "OUTPUT_PORT"}
                        for o in self.output_ports])
            return 200, {}, json.dumps(
                {"controller": {"ports": ports}}).encode()
        if parts == ["site-to-site", "peers"]:
            depth = sum(len(q) for q in self.input_ports.values())
            return 200, {}, json.dumps({"peers": [
                {"hostname": "localhost", "port": 8080, "secure": False,
                 "flowFileCount": depth}]}).encode()
        if (len(parts) == 4 and parts[0] == "data-transfer"
                and parts[3] == "transactions" and method == "POST"):
            port_type, port_id = parts[1], parts[2]
            registry = (self.input_ports if port_type == "input-ports"
                        else self.output_ports)
            if port_id not in registry:
                return 404, {}, b"no such port"
            tx_id = f"tx-{self._next_tx}"
            self._next_tx += 1
            self._txs[tx_id] = _HttpTx(
                port_id, "send" if port_type == "input-ports"
                else "receive")
            loc = (f"/data-transfer/{port_type}/{port_id}"
                   f"/transactions/{tx_id}")
            client_ver = int(headers.get(PROTOCOL_VERSION_HEADER, "1"))
            return 201, {
                "Location": loc,
                LOCATION_INTENT_HEADER: LOCATION_INTENT_VALUE,
                PROTOCOL_VERSION_HEADER:
                    str(min(client_ver, self.protocol_version)),
                SERVER_TTL_HEADER: str(self.ttl_seconds),
            }, b""
        if len(parts) >= 5 and parts[0] == "data-transfer":
            port_type, port_id, tx_id = parts[1], parts[2], parts[4]
            tx = self._txs.get(tx_id)
            if tx is None or tx.port_id != port_id:
                return 404, {}, b"no such transaction"
            tail = parts[5] if len(parts) > 5 else None
            if tail == "flow-files" and method == "POST":
                tx.packets, tx.checksum = decode_packets(body)
                tx.data_sent = True
                return 202, {"Content-Type": "text/plain"}, \
                    tx.checksum.encode()
            if tail == "flow-files" and method == "GET":
                queue = self.output_ports[port_id]
                if not queue:
                    return 200, {}, b""
                batch, queue[:] = (queue[:self.batch_count],
                                   queue[self.batch_count:])
                tx.packets = batch
                blob, tx.checksum = encode_packets(batch)
                tx.data_sent = True
                return 202, {"Content-Type":
                             "application/octet-stream"}, blob
            if tail is None and method == "PUT":     # TTL extension
                return 200, {}, json.dumps(
                    {"responseCode": CONFIRM_TRANSACTION,
                     "message": "Extended TTL."}).encode()
            if tail is None and method == "DELETE":
                code = int(params.get("responseCode", "0"))
                del self._txs[tx_id]
                if code == CANCEL_TRANSACTION:
                    return 200, {}, json.dumps(
                        {"responseCode": CANCEL_TRANSACTION,
                         "flowFileSent": 0,
                         "message": "canceled"}).encode()
                if code != CONFIRM_TRANSACTION:
                    return 400, {}, json.dumps(
                        {"responseCode": code,
                         "message": "unexpected response code"}).encode()
                if tx.direction == "send":
                    self.input_ports[port_id].extend(tx.packets)
                    return 200, {}, json.dumps(
                        {"responseCode": TRANSACTION_FINISHED,
                         "flowFileSent": len(tx.packets),
                         "message": "ok"}).encode()
                # receive commit: verify the client's checksum
                if params.get("checksum") != tx.checksum:
                    # put the batch back — the client must not lose it
                    self.output_ports[port_id][:0] = tx.packets
                    return 400, {}, json.dumps(
                        {"responseCode": BAD_CHECKSUM,
                         "flowFileSent": 0,
                         "message": "CRC32 mismatch"}).encode()
                return 200, {}, json.dumps(
                    {"responseCode": CONFIRM_TRANSACTION,
                     "flowFileSent": len(tx.packets),
                     "message": "ok"}).encode()
        return 404, {}, b"not found"


class S2SHttpClient:
    """The client half of the REST dance (SiteToSiteRestApiClient's
    shape): port/peer discovery, then send/receive transactions with
    the CRC32 confirm leg."""

    def __init__(self, http, *, protocol_version: int = 5):
        self.http = http
        self.version = protocol_version

    def _req(self, method: str, path: str, body: bytes = b"",
             headers: "dict | None" = None):
        h = {PROTOCOL_VERSION_HEADER: str(self.version)}
        h.update(headers or {})
        return self.http(method, path, h, body)

    def ports(self) -> "list[dict]":
        status, _h, body = self._req("GET", "/site-to-site")
        if status != 200:
            raise S2SProtocolError(f"site-to-site returned {status}")
        return json.loads(body)["controller"]["ports"]

    def peers(self) -> "list[dict]":
        status, _h, body = self._req("GET", "/site-to-site/peers")
        if status != 200:
            raise S2SProtocolError(f"peers returned {status}")
        return json.loads(body)["peers"]

    def _initiate(self, port_type: str, port_id: str) -> str:
        status, h, _b = self._req(
            "POST", f"/data-transfer/{port_type}/{port_id}/transactions")
        if status != 201:
            raise S2SProtocolError(f"initiate returned {status}")
        if h.get(LOCATION_INTENT_HEADER) != LOCATION_INTENT_VALUE:
            raise S2SProtocolError("missing transaction-url intent")
        self.version = int(h[PROTOCOL_VERSION_HEADER])
        self.server_ttl = int(h[SERVER_TTL_HEADER])
        return h["Location"]

    def send(self, port_id: str,
             packets: "list[DataPacket]") -> dict:
        """Full transfer transaction: initiate → POST the packet
        stream → verify the server's checksum against ours → DELETE
        CONFIRM_TRANSACTION."""
        tx_url = self._initiate("input-ports", port_id)
        blob, local_crc = encode_packets(packets)
        status, _h, body = self._req(
            "POST", f"{tx_url}/flow-files", blob,
            {"Content-Type": "application/octet-stream",
             "Accept": "text/plain"})
        if status != 202:
            raise S2SProtocolError(f"flow-files POST returned {status}")
        server_crc = body.decode()
        if server_crc != local_crc:
            self._req("DELETE",
                      f"{tx_url}?responseCode={CANCEL_TRANSACTION}")
            raise S2SProtocolError(
                f"checksum mismatch: sent {local_crc}, "
                f"server saw {server_crc}")
        status, _h, body = self._req(
            "DELETE", f"{tx_url}?responseCode={CONFIRM_TRANSACTION}")
        result = json.loads(body)
        if (status != 200
                or result["responseCode"] != TRANSACTION_FINISHED):
            raise S2SProtocolError(f"commit failed: {result}")
        return result

    def receive(self, port_id: str) -> "list[DataPacket]":
        """Full receive transaction: initiate → GET the packet stream
        (200 = no data) → DELETE CONFIRM_TRANSACTION with our CRC32."""
        tx_url = self._initiate("output-ports", port_id)
        status, _h, body = self._req(
            "GET", f"{tx_url}/flow-files")
        if status == 200:
            self._req("DELETE",
                      f"{tx_url}?responseCode={CANCEL_TRANSACTION}")
            return []
        if status != 202:
            raise S2SProtocolError(f"flow-files GET returned {status}")
        packets, crc = decode_packets(body)
        status, _h, rbody = self._req(
            "DELETE",
            f"{tx_url}?responseCode={CONFIRM_TRANSACTION}&checksum={crc}")
        result = json.loads(rbody)
        if status != 200 or result["responseCode"] == BAD_CHECKSUM:
            raise S2SProtocolError(f"receive commit failed: {result}")
        return packets
