"""Site-to-Site HTTP transport (sources/s2s_http.py): REST dance,
CRC32 confirm legs, bad-checksum repush, cancel."""

from __future__ import annotations

import json

import pytest

from nifi_spark.sources.s2s_http import (BAD_CHECKSUM,
                                         CONFIRM_TRANSACTION,
                                         LOCATION_INTENT_HEADER,
                                         PROTOCOL_VERSION_HEADER,
                                         SERVER_TTL_HEADER,
                                         S2SHttpClient, S2SHttpServer,
                                         S2SProtocolError,
                                         decode_packets, encode_packets)
from nifi_spark.sources.site_to_site import DataPacket


def _packets(n, tag="p"):
    return [DataPacket(attributes={"idx": str(i)},
                       content=f"{tag}{i}".encode()) for i in range(n)]


def test_initiate_headers_follow_reference():
    srv = S2SHttpServer(input_ports={"in1": []})
    status, h, _ = srv.handle(
        "POST", "/data-transfer/input-ports/in1/transactions",
        {PROTOCOL_VERSION_HEADER: "5"}, b"")
    assert status == 201
    assert h[LOCATION_INTENT_HEADER] == "transaction-url"
    assert h["Location"].startswith(
        "/data-transfer/input-ports/in1/transactions/tx-")
    assert h[PROTOCOL_VERSION_HEADER] == "5"
    assert int(h[SERVER_TTL_HEADER]) > 0
    # client version lower than server's wins the negotiation
    status, h2, _ = srv.handle(
        "POST", "/data-transfer/input-ports/in1/transactions",
        {PROTOCOL_VERSION_HEADER: "3"}, b"")
    assert h2[PROTOCOL_VERSION_HEADER] == "3"


def test_send_receive_roundtrip():
    srv = S2SHttpServer(input_ports={"in1": []},
                        output_ports={"out1": _packets(7, "o")})
    c = S2SHttpClient(srv.handle)
    r = c.send("in1", _packets(3))
    assert r["flowFileSent"] == 3
    assert [p.content for p in srv.input_ports["in1"]] == \
        [b"p0", b"p1", b"p2"]
    got = c.receive("out1")
    assert [p.attributes["idx"] for p in got] == [str(i) for i in
                                                  range(7)]
    assert c.receive("out1") == []


def test_bad_checksum_repushes_batch():
    srv = S2SHttpServer(output_ports={"out1": _packets(4)})
    c = S2SHttpClient(srv.handle)
    tx_url = c._initiate("output-ports", "out1")
    status, _h, body = c._req("GET", f"{tx_url}/flow-files")
    assert status == 202
    status, _h, rbody = c._req(
        "DELETE",
        f"{tx_url}?responseCode={CONFIRM_TRANSACTION}&checksum=999")
    assert status == 400
    assert json.loads(rbody)["responseCode"] == BAD_CHECKSUM
    # the un-acked batch is back on the queue, nothing lost
    assert len(srv.output_ports["out1"]) == 4
    assert [p.content for p in c.receive("out1")] == \
        [b"p0", b"p1", b"p2", b"p3"]


def test_cancel_discards_sent_data():
    srv = S2SHttpServer(input_ports={"in1": []})
    c = S2SHttpClient(srv.handle)
    tx_url = c._initiate("input-ports", "in1")
    blob, _crc = encode_packets(_packets(2))
    c._req("POST", f"{tx_url}/flow-files", blob)
    status, _h, body = c._req("DELETE", f"{tx_url}?responseCode=15")
    assert status == 200 and json.loads(body)["flowFileSent"] == 0
    assert srv.input_ports["in1"] == []


def test_codec_stream_is_socket_compatible():
    pk = _packets(3)
    blob, crc = encode_packets(pk)
    back, crc2 = decode_packets(blob)
    assert crc == crc2
    assert [(p.attributes, p.content) for p in back] == \
        [(p.attributes, p.content) for p in pk]


def test_unknown_port_and_tx_404():
    srv = S2SHttpServer(input_ports={"in1": []})
    assert srv.handle("POST",
                      "/data-transfer/input-ports/ghost/transactions",
                      {}, b"")[0] == 404
    assert srv.handle(
        "DELETE",
        "/data-transfer/input-ports/in1/transactions/tx-99", {},
        b"")[0] == 404
    c = S2SHttpClient(srv.handle)
    with pytest.raises(S2SProtocolError):
        c.send("ghost", _packets(1))
