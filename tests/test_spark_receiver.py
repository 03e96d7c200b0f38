"""NiFiReceiver/NiFiBolt analogs (sources/spark_receiver.py) over the
real S2S wire loopback."""

from __future__ import annotations

from nifi_spark.sources.site_to_site import (DataPacket, S2SClient,
                                             S2SPort, loopback_serve)
from nifi_spark.sources.spark_receiver import (nifi_send_batches,
                                               nifi_spark_receive)


def test_receive_drains_queued_packets(spark):
    port = S2SPort("out-port")
    port.to_send = [DataPacket({"k": str(i)}, f"data{i}".encode())
                    for i in range(5)]
    inp, out, join = loopback_serve({"out-port": port})
    client = S2SClient(inp, out, port_identifier="out-port")
    df = nifi_spark_receive(spark, client)
    client.shutdown()
    join()
    rows = sorted(df.collect(), key=lambda r: r["content"])
    assert [r["content"] for r in rows] == [f"data{i}" for i in range(5)]
    assert rows[2]["attributes"]["k"] == "2"


def test_receive_empty_port_returns_no_rows(spark):
    port = S2SPort("out-port")
    inp, out, join = loopback_serve({"out-port": port})
    client = S2SClient(inp, out, port_identifier="out-port")
    df = nifi_spark_receive(spark, client)
    client.shutdown()
    join()
    assert df.count() == 0


def test_bolt_send_batches_then_receive_roundtrip(spark):
    port = S2SPort("in-port")
    inp, out, join = loopback_serve({"in-port": port})
    client = S2SClient(inp, out, port_identifier="in-port")
    items = [(f"m{i}".encode(), {"i": str(i)}) for i in range(25)]
    n_tx = nifi_send_batches(client, items, batch_size=10)
    client.shutdown()
    join()
    assert n_tx == 3
    assert len(port.received) == 25
    assert port.received[7].attributes["i"] == "7"
