"""SiteToSiteProvenanceReportingTask analog — ship provenance events
over the implemented Site-to-Site wire protocol.

NiFi ancestor: nifi-site-to-site-reporting-bundle
SiteToSiteProvenanceReportingTask.java — onTrigger pages provenance
events from the repository starting at the state-managed
``last_event_id`` (StateManager LOCAL scope, :229-236), serializes
each batch as ONE JSON array (:196-201, serialize() :254-296 field
names), sends it as ONE S2S transaction carrying a
``reporting.task.transaction.id`` attribute (:212-219), and commits
the new last-event-id AFTER the transaction completes (:230) — so a
crash between send and commit re-sends the batch: at-least-once,
exactly the repo's ledger discipline (here via `KVState`).

The JSON field names follow the reference's serialize() for every
field this engine's provenance model carries (eventOrdinal,
eventType, timestampMillis, componentId, entitySize, platform,
application, actorHostname); the repo-specific aggregate fields
(batchId, stage, partitionId, lsnMin, lsnMax, rowCount) ride
alongside — the provenance model here is per-partition aggregates,
not per-FlowFile events (provenance.py design note).

Scale note: the shipped slice is the provenance table's NEW rows —
bounded per run by ``batch_size`` pages of per-partition aggregate
rows, so the driver-side collect is a bounded driver aggregate (the
repo's documented collect contract), not row data.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession, functions as F

from .ledger import KVState

LAST_EVENT_ID_KEY = "last_event_id"     # the reference's state key


class S2SProvenanceReportingTask:
    def __init__(self, state: KVState, *, key: str = "s2s_provenance",
                 batch_size: int = 1000,
                 instance_url: str = "nifi://localhost:8080",
                 platform: str = "nifi_spark",
                 application: str = "NiFi Flow"):
        self.state = state
        self.key = key
        self.batch_size = batch_size
        self.hostname = instance_url.split("://")[-1].split(":")[0]
        self.platform = platform
        self.application = application

    def _serialize(self, row) -> dict:
        # reference serialize() field names where the models overlap
        return {
            "eventOrdinal": row["event_id"],
            "eventType": row["event_type"],
            "timestampMillis": int(row["ts"].timestamp() * 1000)
            if row["ts"] is not None else None,
            "componentId": row["stage"],
            "entitySize": row["byte_count"],
            "actorHostname": self.hostname,
            "platform": self.platform,
            "application": self.application,
            # repo-model aggregate fields
            "batchId": row["batch_id"],
            "partitionId": row["partition_id"],
            "lsnMin": row["lsn_min"],
            "lsnMax": row["lsn_max"],
            "rowCount": row["row_count"],
        }

    def run(self, spark: SparkSession, provenance, client) -> dict:
        """One onTrigger: page NEW provenance rows (event_id >
        watermark) in event_id order, one S2S SEND transaction per
        page, watermark committed after each completed transaction.
        Returns {"events": n, "transactions": m}."""
        last = self.state.get(self.key).get(LAST_EVENT_ID_KEY, -1)
        prov = provenance.read(spark) if hasattr(provenance, "read") \
            else provenance
        fresh = (prov.filter(F.col("event_id") > F.lit(last))
                 .orderBy("event_id"))
        rows = fresh.collect()             # bounded: aggregate rows
        sent_events = sent_tx = 0
        for i in range(0, len(rows), self.batch_size):
            page = rows[i:i + self.batch_size]
            payload = json.dumps([self._serialize(r) for r in page],
                                 separators=(",", ":")).encode()
            tx_id = (f"tx-{page[0]['event_id']}"
                     f"-{page[-1]['event_id']}")
            tx = client.create_transaction("send")
            tx.send(payload,
                    {"reporting.task.transaction.id": tx_id,
                     "mime.type": "application/json"})
            tx.confirm()
            tx.complete()
            # commit AFTER complete — crash before this line re-sends
            self.state.put(self.key,
                           {LAST_EVENT_ID_KEY: page[-1]["event_id"]})
            sent_events += len(page)
            sent_tx += 1
        return {"events": sent_events, "transactions": sent_tx}
