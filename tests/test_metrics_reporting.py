"""Ambari/Datadog reporting-task analogs (metrics_reporting.py):
provenance-derived flow metrics with the reference metric names, the
timeline and series JSON envelopes, collector path contract."""

from __future__ import annotations

from nifi_spark.metrics_reporting import (AmbariReportingTask,
                                          DataDogReportingTask,
                                          MetricsCollectorServer,
                                          flow_status_metrics)
from nifi_spark.provenance import ProvenanceWriter


def _seed(spark, tmp_path):
    prov = ProvenanceWriter(str(tmp_path / "prov"))
    # 3 RECEIVE batches of (rows, bytes) and 2 SEND batches
    for i, (rows, size) in enumerate([(100, 5000), (200, 9000),
                                      (50, 1000)]):
        prov.emit_counts(spark, "RECEIVE", batch_id=i, stage="tail",
                         row_count=rows)
    for i, rows in enumerate([120, 80]):
        prov.emit_counts(spark, "SEND", batch_id=i, stage="sink",
                         row_count=rows)
    return prov


def test_flow_status_metrics_reference_names(spark, tmp_path):
    prov = _seed(spark, tmp_path)
    m = flow_status_metrics(spark, prov)
    assert m["FlowFilesReceivedLast5Minutes"] == "350"
    assert m["FlowFilesSentLast5Minutes"] == "200"
    assert m["FlowFilesQueued"] == "150"
    # values are STRINGS, like MetricsService.java:40-47
    assert all(isinstance(v, str) for v in m.values())


def test_ambari_envelope_shape(spark, tmp_path):
    prov = _seed(spark, tmp_path)
    srv = MetricsCollectorServer()
    task = AmbariReportingTask(
        srv.transport,
        url="http://collector:6188/ws/v1/timeline/metrics",
        application_id="nifi", hostname="host-a")
    n = task.report(flow_status_metrics(spark, prov),
                    timestamp_ms=1_700_000_000_000)
    assert n == 6 and len(srv.envelopes) == 1
    entries = srv.envelopes[0]["metrics"]
    names = [e["metricname"] for e in entries]
    assert names == sorted(names) and "BytesQueued" in names
    e0 = entries[0]
    # MetricFields.java:21-27 field names
    assert set(e0) == {"metricname", "appid", "instanceid", "hostname",
                       "timestamp", "starttime", "metrics"}
    assert e0["appid"] == "nifi" and e0["hostname"] == "host-a"
    assert e0["metrics"] == {"1700000000000": e0["metrics"][
        "1700000000000"]}


def test_ambari_wrong_path_404(spark, tmp_path):
    prov = _seed(spark, tmp_path)
    srv = MetricsCollectorServer()
    task = AmbariReportingTask(srv.transport,
                               url="http://collector:6188/nope",
                               application_id="nifi",
                               hostname="host-a")
    try:
        task.report(flow_status_metrics(spark, prov),
                    timestamp_ms=1)
        raise AssertionError("expected IOError")
    except IOError:
        pass
    assert not srv.envelopes


def test_datadog_series_shape(spark, tmp_path):
    prov = _seed(spark, tmp_path)
    srv = MetricsCollectorServer(path="/api/v1/series")
    task = DataDogReportingTask(srv.transport,
                                url="http://dd:8125/api/v1/series",
                                host="host-a", environment="prod")
    n = task.report(flow_status_metrics(spark, prov),
                    timestamp_ms=1_700_000_042_000)
    assert n == 6
    series = srv.envelopes[0]["series"]
    one = next(s for s in series
               if s["metric"] == "nifi.FlowFilesReceivedLast5Minutes")
    assert one["points"] == [[1_700_000_042, 350.0]]
    assert one["type"] == "gauge" and "env:prod" in one["tags"]
