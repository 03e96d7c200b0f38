"""SiteToSiteProvenanceReportingTask analog (reporting.py): watermark
paging, one S2S transaction per batch, at-least-once re-send on a
crash between send and state commit."""

from __future__ import annotations

import json

from nifi_spark.ledger import KVState
from nifi_spark.provenance import ProvenanceWriter
from nifi_spark.reporting import LAST_EVENT_ID_KEY, \
    S2SProvenanceReportingTask
from nifi_spark.sources.site_to_site import (S2SClient, S2SPort,
                                             loopback_serve)


def _seed_provenance(spark, tmp_path, n=12):
    prov = ProvenanceWriter(str(tmp_path / "prov"))
    for i in range(n):
        prov.emit_counts(spark, "RECEIVE" if i % 2 == 0 else "SEND",
                         batch_id=i // 4, stage="tail",
                         row_count=10 * i + 3)
    return prov


def test_reporting_batches_and_watermark(spark, tmp_path):
    prov = _seed_provenance(spark, tmp_path, 12)
    port = S2SPort("prov-in")
    inp, out, join = loopback_serve({"prov-in": port})
    client = S2SClient(inp, out, port_identifier="prov-in")
    state = KVState(str(tmp_path / "state"))
    task = S2SProvenanceReportingTask(state, batch_size=5)
    got = task.run(spark, prov, client)
    assert got == {"events": 12, "transactions": 3}   # 5+5+2
    client.shutdown()
    join()
    assert len(port.received) == 3
    events = [e for p in port.received
              for e in json.loads(p.content.decode())]
    assert len(events) == 12
    # reference serialize() field names present
    assert {"eventOrdinal", "eventType", "componentId",
            "timestampMillis", "platform"} <= set(events[0])
    assert [e["rowCount"] for e in events] == \
        [10 * i + 3 for i in range(12)]
    # transaction attribute present and distinct per batch
    tx_ids = {p.attributes["reporting.task.transaction.id"]
              for p in port.received}
    assert len(tx_ids) == 3
    # watermark advanced to the newest event id
    assert state.get("s2s_provenance")[LAST_EVENT_ID_KEY] == \
        max(e["eventOrdinal"] for e in events)


def test_reporting_incremental_and_nothing_new(spark, tmp_path):
    prov = _seed_provenance(spark, tmp_path, 4)
    state = KVState(str(tmp_path / "state"))
    task = S2SProvenanceReportingTask(state, batch_size=10)

    def run_once():
        port = S2SPort("p")
        inp, out, join = loopback_serve({"p": port})
        client = S2SClient(inp, out, port_identifier="p")
        r = task.run(spark, prov, client)
        client.shutdown()
        join()
        return r, port

    r1, _ = run_once()
    assert r1 == {"events": 4, "transactions": 1}
    r2, _ = run_once()
    assert r2 == {"events": 0, "transactions": 0}
    # four more events arrive -> only they ship
    for i in range(4):
        prov.emit_counts(spark, "DROP", batch_id=9, stage="dedup",
                         row_count=i)
    r3, port3 = run_once()
    assert r3 == {"events": 4, "transactions": 1}
    evs = json.loads(port3.received[0].content.decode())
    assert all(e["eventType"] == "DROP" for e in evs)


def test_reporting_crash_before_commit_resends(spark, tmp_path):
    """The reference commits last_event_id AFTER the transaction
    completes — simulate the crash by rolling the state back and
    re-running: the same batch ships again (at-least-once)."""
    prov = _seed_provenance(spark, tmp_path, 3)
    state = KVState(str(tmp_path / "state"))
    task = S2SProvenanceReportingTask(state, batch_size=10)
    port = S2SPort("p")
    inp, out, join = loopback_serve({"p": port})
    client = S2SClient(inp, out, port_identifier="p")
    assert task.run(spark, prov, client)["events"] == 3
    client.shutdown()
    join()
    state.put("s2s_provenance", {})        # crash lost the commit
    port2 = S2SPort("p")
    inp2, out2, join2 = loopback_serve({"p": port2})
    client2 = S2SClient(inp2, out2, port_identifier="p")
    assert task.run(spark, prov, client2)["events"] == 3
    client2.shutdown()
    join2()
    assert json.loads(port2.received[0].content.decode()) == \
        json.loads(port.received[0].content.decode())
