"""AmbariReportingTask / DataDogReportingTask analogs — flow-status
metrics derived from the provenance table, shipped in each service's
public JSON envelope.

NiFi ancestors:
- nifi-ambari-bundle AmbariReportingTask.java + MetricsService.java
  (:38-60) + MetricNames.java — the flow metrics are the reference's
  exact names (FlowFilesReceivedLast5Minutes, BytesReceivedLast5Minutes,
  FlowFilesSentLast5Minutes, BytesSentLast5Minutes, ...), POSTed to
  the Ambari Metrics Collector as a timeline envelope
  ``{"metrics": [{metricname, appid, instanceid, hostname, timestamp,
  starttime, metrics: {ms: value}}]}`` (MetricFields.java:21-27).
- nifi-datadog-bundle DataDogReportingTask — the same metric map
  shipped as the Datadog series shape
  ``{"series": [{metric, points: [[sec, value]], type: "gauge",
  host, tags}]}``.

Where the reference reads ProcessGroupStatus counters, this engine's
equivalent source of truth is the PROVENANCE table: RECEIVE/SEND
row_count/byte_count aggregates over the reported window — one Spark
aggregation, no driver loops. The window is [since_event_id, ∞) —
event-id-based like the S2S provenance task, so runs are
deterministic and replayable.

Transport = ``transport(url, body_bytes) -> (status, resp)``; the
in-process collector records envelopes for assertion.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession, functions as F

# MetricNames.java:25-32 — the flow half this engine can derive
FLOW_FILES_RECEIVED = "FlowFilesReceivedLast5Minutes"
BYTES_RECEIVED = "BytesReceivedLast5Minutes"
FLOW_FILES_SENT = "FlowFilesSentLast5Minutes"
BYTES_SENT = "BytesSentLast5Minutes"
FLOW_FILES_QUEUED = "FlowFilesQueued"
BYTES_QUEUED = "BytesQueued"


def flow_status_metrics(spark: SparkSession, provenance, *,
                        since_event_id: int = -1) -> dict[str, str]:
    """MetricsService.getMetrics analog: the reference's metric-name →
    stringified-value map, derived from provenance aggregates (one
    groupBy over the window; values are strings exactly like
    MetricsService.java:40-47)."""
    prov = provenance.read(spark) if hasattr(provenance, "read") \
        else provenance
    rows = (prov.filter(F.col("event_id") > F.lit(since_event_id))
            .groupBy("event_type")
            .agg(F.sum("row_count").alias("rows"),
                 F.sum("byte_count").alias("bytes"))
            .collect())
    by_type = {r["event_type"]: (int(r["rows"]), int(r["bytes"]))
               for r in rows}
    recv = by_type.get("RECEIVE", (0, 0))
    sent = by_type.get("SEND", (0, 0))
    queued = (recv[0] - sent[0], recv[1] - sent[1])
    return {
        FLOW_FILES_RECEIVED: str(recv[0]),
        BYTES_RECEIVED: str(recv[1]),
        FLOW_FILES_SENT: str(sent[0]),
        BYTES_SENT: str(sent[1]),
        FLOW_FILES_QUEUED: str(max(queued[0], 0)),
        BYTES_QUEUED: str(max(queued[1], 0)),
    }


class AmbariReportingTask:
    """POST the timeline envelope to the Metrics Collector URL
    (default path /ws/v1/timeline/metrics, AmbariReportingTask.java's
    METRICS_COLLECTOR_URL default)."""

    def __init__(self, transport, *, url: str, application_id: str,
                 hostname: str, instance_id: str = ""):
        self.transport = transport
        self.url = url
        self.application_id = application_id
        self.hostname = hostname
        self.instance_id = instance_id

    def report(self, metrics: dict[str, str], *,
               timestamp_ms: int) -> int:
        entries = [{
            "metricname": name,
            "appid": self.application_id,
            "instanceid": self.instance_id,
            "hostname": self.hostname,
            "timestamp": timestamp_ms,
            "starttime": timestamp_ms,
            "metrics": {str(timestamp_ms): value},
        } for name, value in sorted(metrics.items())]
        body = json.dumps({"metrics": entries},
                          separators=(",", ":")).encode()
        status, _resp = self.transport(self.url, body)
        if status != 200:
            raise IOError(f"Ambari collector returned {status}")
        return len(entries)


class DataDogReportingTask:
    """POST the Datadog series shape; every value ships as a gauge
    with the environment/prefix tags the reference's registry
    attaches."""

    def __init__(self, transport, *, url: str, host: str,
                 prefix: str = "nifi", environment: str = "dev"):
        self.transport = transport
        self.url = url
        self.host = host
        self.prefix = prefix
        self.tags = [f"env:{environment}", f"dataflow_id:{prefix}"]

    def report(self, metrics: dict[str, str], *,
               timestamp_ms: int) -> int:
        series = [{
            "metric": f"{self.prefix}.{name}",
            "points": [[timestamp_ms // 1000, float(value)]],
            "type": "gauge",
            "host": self.host,
            "tags": self.tags,
        } for name, value in sorted(metrics.items())]
        body = json.dumps({"series": series},
                          separators=(",", ":")).encode()
        status, _resp = self.transport(self.url, body)
        if status != 200:
            raise IOError(f"Datadog endpoint returned {status}")
        return len(series)


class MetricsCollectorServer:
    """In-process collector: records every envelope; rejects unknown
    paths with 404 (the Ambari collector's contract)."""

    def __init__(self, path: str = "/ws/v1/timeline/metrics"):
        self.path = path
        self.envelopes: list[dict] = []

    def transport(self, url: str, body: bytes):
        if not url.endswith(self.path):
            return 404, b"unknown endpoint"
        self.envelopes.append(json.loads(body.decode()))
        return 200, b"{}"
