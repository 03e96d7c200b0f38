"""PutKinesisStream / PutKinesisFirehose / PutLambda /
PutCloudWatchMetric analogs (nifi-aws-bundle) — the AWS JSON wire
protocols with SigV4, over the injectable transport / in-process
server seam shared with the SQS/S3/DynamoDB connectors.

NiFi ancestors:
- PutKinesisStream.java:40-120 — batch of FlowFiles → one PutRecords
  call; partition key from property/attribute (random fallback);
  per-record response entries route success vs failure with
  ``aws.kinesis.shard.id`` / ``aws.kinesis.sequence.number`` or
  ``aws.kinesis.error.code`` / ``aws.kinesis.error.message``.
- AbstractBaseKinesisProcessor.MAX_MESSAGE_SIZE = 1000 KB — oversized
  FlowFiles route to failure BEFORE the wire call
  (filterMessagesByMaxSize), with the error-message attribute.
- PutKinesisFirehose.java:28-75 — PutRecordBatch; per-record
  ``aws.kinesis.firehose.record.id`` on success, error code/message
  on failure.
- PutLambda.java — per-FlowFile RequestResponse Invoke with
  LogType=Tail; result status/payload/log attributes; a present
  X-Amz-Function-Error routes to failure with
  ``aws.lambda.result.function.error``; the 6 MB request guard.
- PutCloudWatchMetric.java — PutMetricData datum (namespace, metric
  name, double value, optional timestamp/unit), success/failure.

The in-process `KinesisServer` reproduces the REAL shard mapping:
a record lands on the shard whose hash-key range contains
MD5(partition_key) interpreted as a 128-bit integer, ranges being
equal slices of [0, 2^128) — the documented PutRecords contract.
Throttling is deterministic: shards listed in `throttled_shards`
answer per-record ProvisionedThroughputExceededException, exactly the
partial-failure shape PutRecords returns under capacity pressure.
"""

from __future__ import annotations

import base64
import hashlib
import json
import urllib.parse

from .sqs import SqsError, sigv4_sign, sigv4_verify

MAX_KINESIS_MESSAGE = 1000 * 1024       # AbstractBaseKinesisProcessor
MAX_LAMBDA_REQUEST = 6 * 1000 * 1000    # PutLambda.MAX_REQUEST_SIZE


def shard_for_key(partition_key: str, n_shards: int) -> int:
    """MD5(key) as a 128-bit int over equal hash-key ranges."""
    h = int.from_bytes(hashlib.md5(partition_key.encode()).digest(),
                       "big")
    return min(h * n_shards >> 128, n_shards - 1)


class KinesisServer:
    """Kinesis + Firehose + Lambda + CloudWatch behind one SigV4
    endpoint (dispatch on service scope / X-Amz-Target / path)."""

    def __init__(self, *, region: str = "us-east-1",
                 secrets: dict[str, str] | None = None):
        self.region = region
        self.secrets = secrets or {"AKID": "SECRET"}
        self.streams: dict[str, dict] = {}
        self.delivery_streams: dict[str, list] = {}
        self.functions: dict[str, object] = {}
        self.metrics: list[dict] = []
        self.throttled_shards: set[int] = set()
        self._record_seq = 0

    def create_stream(self, name: str, n_shards: int = 4) -> None:
        self.streams[name] = {"n": n_shards,
                              "shards": [[] for _ in range(n_shards)]}

    def create_delivery_stream(self, name: str) -> None:
        self.delivery_streams[name] = []

    def register_function(self, name: str, fn) -> None:
        """fn(payload_bytes) -> payload_bytes; raising routes the
        invocation to FunctionError."""
        self.functions[name] = fn

    def handle(self, url: str, method: str, headers: dict[str, str],
               body: bytes) -> tuple[int, bytes, dict[str, str]]:
        try:
            sigv4_verify(method, url, headers, body,
                         secrets=self.secrets)
        except SqsError as e:
            return 403, json.dumps(
                {"__type": "UnrecognizedClientException",
                 "message": str(e)}).encode(), {}
        hdrs = {k.lower(): v for k, v in headers.items()}
        target = hdrs.get("x-amz-target", "")
        path = urllib.parse.urlsplit(url).path
        if target.endswith("PutRecords"):
            return (200,
                    json.dumps(self._put_records(json.loads(body)))
                    .encode(), {})
        if target.endswith("PutRecordBatch"):
            return (200,
                    json.dumps(self._put_record_batch(json.loads(body)))
                    .encode(), {})
        if "/functions/" in path and path.endswith("/invocations"):
            name = path.split("/functions/")[1].split("/")[0]
            return self._invoke(name, body)
        if b"Action=PutMetricData" in body:
            return self._put_metric_data(body)
        return 400, json.dumps(
            {"__type": "UnknownOperationException"}).encode(), {}

    def transport(self, url: str, method: str, headers: dict[str, str],
                  body: bytes):
        return self.handle(url, method, headers, body)

    def _put_records(self, req: dict) -> dict:
        stream = self.streams[req["StreamName"]]
        entries, failed = [], 0
        for rec in req["Records"]:
            shard = shard_for_key(rec["PartitionKey"], stream["n"])
            if shard in self.throttled_shards:
                failed += 1
                entries.append({
                    "ErrorCode": "ProvisionedThroughputExceededException",
                    "ErrorMessage": f"Rate exceeded for shard "
                                    f"shardId-{shard:012d}"})
                continue
            data = base64.b64decode(rec["Data"])
            seq = len(stream["shards"][shard]) + 1
            stream["shards"][shard].append(data)
            entries.append({"ShardId": f"shardId-{shard:012d}",
                            "SequenceNumber": str(seq)})
        return {"FailedRecordCount": failed, "Records": entries}

    def _put_record_batch(self, req: dict) -> dict:
        dest = self.delivery_streams[req["DeliveryStreamName"]]
        entries, failed = [], 0
        for rec in req["Records"]:
            data = base64.b64decode(rec["Data"])
            self._record_seq += 1
            dest.append(data)
            entries.append({"RecordId": f"rec-{self._record_seq:08d}"})
        return {"FailedPutCount": failed, "RequestResponses": entries}

    def _invoke(self, name: str, payload: bytes):
        fn = self.functions[name]
        log = f"START invoke {name}\nEND invoke {name}"
        log_b64 = base64.b64encode(log.encode()).decode()
        try:
            result = fn(payload)
            return 200, result, {"x-amz-log-result": log_b64}
        except Exception as e:  # the Unhandled FunctionError shape
            err = json.dumps({"errorMessage": str(e),
                              "errorType": type(e).__name__}).encode()
            return 200, err, {"x-amz-function-error": "Unhandled",
                              "x-amz-log-result": log_b64}

    def _put_metric_data(self, body: bytes):
        params = dict(urllib.parse.parse_qsl(body.decode()))
        datum = {"namespace": params["Namespace"],
                 "name": params["MetricData.member.1.MetricName"],
                 "value": float(params["MetricData.member.1.Value"])}
        if "MetricData.member.1.Unit" in params:
            datum["unit"] = params["MetricData.member.1.Unit"]
        if "MetricData.member.1.Timestamp" in params:
            datum["timestamp"] = params["MetricData.member.1.Timestamp"]
        self.metrics.append(datum)
        return (200, b"<PutMetricDataResponse/>", {})


class AwsJsonClient:
    """Shared SigV4 JSON/REST client for the four services."""

    def __init__(self, transport, *, service: str,
                 endpoint: str = "https://aws.local/",
                 access_key: str = "AKID", secret_key: str = "SECRET",
                 region: str = "us-east-1",
                 amz_date: str = "20260101T000000Z"):
        self._t = transport
        self.service, self.endpoint = service, endpoint
        self.access_key, self.secret_key = access_key, secret_key
        self.region, self.amz_date = region, amz_date

    def call(self, *, target: str | None = None, path: str = "",
             body: bytes = b"",
             content_type: str = "application/x-amz-json-1.1"):
        url = self.endpoint.rstrip("/") + path if path else self.endpoint
        headers = {"content-type": content_type}
        if target:
            headers["x-amz-target"] = target
        headers = sigv4_sign("POST", url, headers, body,
                             access_key=self.access_key,
                             secret_key=self.secret_key,
                             region=self.region, service=self.service,
                             amz_date=self.amz_date)
        out = self._t(url, "POST", headers, body)
        status, resp = out[0], out[1]
        resp_headers = out[2] if len(out) > 2 else {}
        if status != 200:
            err = json.loads(resp)
            raise SqsError(f"{err.get('__type')}: {err.get('message')}")
        return resp, resp_headers


# ------------------------------------------------- processor analogs


def put_kinesis_stream(rows: list[dict], client: AwsJsonClient, *,
                       stream: str, batch_size: int = 250,
                       max_buffer_bytes: int = 1 << 20,
                       partition_key=lambda row: row.get(
                           "kinesis.partition.key", "")
                       ) -> list[tuple[dict, str, dict]]:
    """PutKinesisStream.java — rows are {'content': bytes|str, ...};
    returns (row, relationship, attributes)."""
    out: list[tuple[dict, str, dict]] = []
    batch: list[tuple[dict, bytes, str]] = []
    buffered = 0

    def flush():
        nonlocal buffered
        if not batch:
            return
        payload = json.dumps({
            "StreamName": stream,
            "Records": [{"Data": base64.b64encode(d).decode(),
                         "PartitionKey": pk}
                        for _, d, pk in batch]}).encode()
        resp, _ = client.call(target="Kinesis_20131202.PutRecords",
                              body=payload)
        for (row, _, _), entry in zip(batch,
                                      json.loads(resp)["Records"]):
            if entry.get("ErrorCode"):
                out.append((row, "failure", {
                    "aws.kinesis.error.code": entry["ErrorCode"],
                    "aws.kinesis.error.message": entry["ErrorMessage"]}))
            else:
                out.append((row, "success", {
                    "aws.kinesis.shard.id": entry["ShardId"],
                    "aws.kinesis.sequence.number":
                        entry["SequenceNumber"]}))
        batch.clear()
        buffered = 0

    for i, row in enumerate(rows):
        data = row["content"]
        if isinstance(data, str):
            data = data.encode()
        if len(data) > MAX_KINESIS_MESSAGE:
            out.append((row, "failure", {
                "aws.kinesis.error.message":
                    f"record too big {len(data)} max allowed "
                    f"{MAX_KINESIS_MESSAGE}"}))
            continue
        pk = partition_key(row) or str(i)   # deterministic fallback
        batch.append((row, data, pk))
        buffered += len(data)
        if len(batch) >= batch_size or buffered >= max_buffer_bytes:
            flush()
    flush()
    return out


def put_kinesis_firehose(rows: list[dict], client: AwsJsonClient, *,
                         delivery_stream: str, batch_size: int = 250,
                         max_buffer_bytes: int = 1 << 20
                         ) -> list[tuple[dict, str, dict]]:
    """PutKinesisFirehose.java — PutRecordBatch with per-record ids."""
    out: list[tuple[dict, str, dict]] = []
    batch: list[tuple[dict, bytes]] = []
    buffered = 0

    def flush():
        nonlocal buffered
        if not batch:
            return
        payload = json.dumps({
            "DeliveryStreamName": delivery_stream,
            "Records": [{"Data": base64.b64encode(d).decode()}
                        for _, d in batch]}).encode()
        resp, _ = client.call(
            target="Firehose_20150804.PutRecordBatch", body=payload)
        for (row, _), entry in zip(
                batch, json.loads(resp)["RequestResponses"]):
            attrs = {"aws.kinesis.firehose.record.id":
                     entry.get("RecordId", "")}
            if entry.get("ErrorCode"):
                attrs["aws.kinesis.firehose.error.code"] = \
                    entry["ErrorCode"]
                attrs["aws.kinesis.firehose.error.message"] = \
                    entry["ErrorMessage"]
                out.append((row, "failure", attrs))
            else:
                out.append((row, "success", attrs))
        batch.clear()
        buffered = 0

    for row in rows:
        data = row["content"]
        if isinstance(data, str):
            data = data.encode()
        if len(data) > MAX_KINESIS_MESSAGE:
            out.append((row, "failure", {
                "aws.kinesis.firehose.error.message":
                    f"record too big {len(data)} max allowed "
                    f"{MAX_KINESIS_MESSAGE}"}))
            continue
        batch.append((row, data))
        buffered += len(data)
        if len(batch) >= batch_size or buffered >= max_buffer_bytes:
            flush()
    flush()
    return out


def put_lambda(rows: list[dict], client: AwsJsonClient, *,
               function_name: str) -> list[tuple[dict, str, dict]]:
    """PutLambda.java — per-row RequestResponse invoke; FunctionError
    → failure with the reference attribute surface."""
    out: list[tuple[dict, str, dict]] = []
    for row in rows:
        data = row["content"]
        if isinstance(data, str):
            data = data.encode()
        if len(data) > MAX_LAMBDA_REQUEST:
            out.append((row, "failure", {
                "aws.lambda.exception.message":
                    f"Max size for request body is 6mb but was "
                    f"{len(data)}"}))
            continue
        resp, hdrs = client.call(
            path=f"/2015-03-31/functions/{function_name}/invocations",
            body=data, content_type="application/json")
        attrs = {"aws.lambda.result.status.code": "200",
                 "aws.lambda.result.payload":
                     resp.decode("utf-8", "replace")}
        log_b64 = hdrs.get("x-amz-log-result", "")
        if log_b64:
            attrs["aws.lambda.result.log"] = \
                base64.b64decode(log_b64).decode()
        fn_err = hdrs.get("x-amz-function-error", "")
        if fn_err:
            attrs["aws.lambda.result.function.error"] = fn_err
            out.append((row, "failure", attrs))
        else:
            out.append((row, "success", attrs))
    return out


def put_cloudwatch_metric(rows: list[dict], client: AwsJsonClient, *,
                          namespace: str, metric_name, value,
                          unit=None) -> list[tuple[dict, str, dict]]:
    """PutCloudWatchMetric.java — one MetricDatum per row; metric_name
    / value / unit are callables over the row (EL analogs) or
    constants."""
    def _ev(x, row):
        return x(row) if callable(x) else x

    out: list[tuple[dict, str, dict]] = []
    for row in rows:
        try:
            v = float(_ev(value, row))
        except (TypeError, ValueError) as e:
            out.append((row, "failure", {"error": str(e)}))
            continue
        params = {"Action": "PutMetricData", "Version": "2010-08-01",
                  "Namespace": namespace,
                  "MetricData.member.1.MetricName":
                      str(_ev(metric_name, row)),
                  "MetricData.member.1.Value": repr(v)}
        u = _ev(unit, row) if unit is not None else None
        if u:
            params["MetricData.member.1.Unit"] = str(u)
        body = urllib.parse.urlencode(params).encode()
        client.call(
            body=body,
            content_type="application/x-www-form-urlencoded")
        out.append((row, "success", {}))
    return out


__all__ = ["AwsJsonClient", "KinesisServer", "MAX_KINESIS_MESSAGE",
           "MAX_LAMBDA_REQUEST", "put_cloudwatch_metric",
           "put_kinesis_firehose", "put_kinesis_stream", "put_lambda",
           "shard_for_key"]
