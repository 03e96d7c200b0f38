"""NiFiReceiver / NiFiSpout / NiFiBolt analogs (nifi-external) — the
reference's own Spark/Storm integration points, re-expressed over this
repo's real Site-to-Site wire client.

NiFi ancestors:
- nifi-external/nifi-spark-receiver NiFiReceiver.java:40-100 — a
  receiver thread loops RECEIVE transactions against an output port:
  drain packets until null, CONFIRM (CRC check) BEFORE store(), then
  complete; an empty transaction is confirmed+completed and the loop
  idles. The batch analog here drains until the first empty
  transaction and returns the packets as a DataFrame (`store()` →
  createDataFrame), preserving the confirm-before-store order so a
  CRC failure never exposes data downstream.
- NiFiDataPacket / StandardNiFiDataPacket — (content bytes,
  attributes map), this repo's DataPacket.
- nifi-external/nifi-storm-spout NiFiBolt.java — the send half:
  batches tuples and sends them in one transaction per flush (batch
  size / tick-seconds flush). `nifi_send_batches` reproduces the
  batching contract with a deterministic batch size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .site_to_site import DataPacket, S2SClient


def nifi_spark_receive(spark: SparkSession, client: S2SClient,
                       *, max_transactions: int = 1000) -> DataFrame:
    """Drain RECEIVE transactions until one returns no data; one row
    per NiFiDataPacket: (content string, attributes map, tx int)."""
    rows: list[tuple[str, dict, int]] = []
    for tx_i in range(max_transactions):
        tx = client.create_transaction("receive")
        got_any = False
        while True:
            packet = tx.receive()
            if packet is None:
                break
            got_any = True
            rows.append((packet.content.decode("utf-8",
                                               "surrogateescape"),
                         dict(packet.attributes), tx_i))
        tx.confirm()      # CRC verify BEFORE store (NiFiReceiver:92)
        tx.complete()
        if not got_any:
            break
    return spark.createDataFrame(
        rows, "content string, attributes map<string,string>, tx int")


def nifi_send_batches(client: S2SClient,
                      items: "list[tuple[bytes, dict]]",
                      *, batch_size: int = 100) -> int:
    """NiFiBolt's flush contract: one transaction per batch, every
    packet sent then confirm+complete. Returns transactions used."""
    n_tx = 0
    for start in range(0, len(items), batch_size):
        tx = client.create_transaction("send")
        for content, attrs in items[start:start + batch_size]:
            tx.send(content, attrs)
        tx.confirm()
        tx.complete()
        n_tx += 1
    return n_tx


__all__ = ["DataPacket", "nifi_send_batches", "nifi_spark_receive"]
