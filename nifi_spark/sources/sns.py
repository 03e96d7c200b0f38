"""PutSNS — Amazon SNS publish analog over the Query wire protocol.

NiFi ancestor: PutSNS (nifi-aws-bundle/.../sns/PutSNS.java:83-158 —
256 KB size gate to failure, charset-decoded content as the message,
Topic vs Target ARN selection (AbstractSNSProcessor.java:32-51),
optional E-mail Subject, `MessageStructure=json` requiring a
top-level ``default`` element, dynamic properties as String message
attributes, publish-exception → penalize + failure).

Like the SQS/Kinesis/DynamoDB siblings, the wire format is the real
public one (SNS speaks the same SigV4-signed Query protocol as SQS):
`SnsServer` is a loopback topic service that verifies signatures and
records publishes per topic; `SnsClient.publish` emits a
reference-shaped Publish request; `put_sns` is the processor analog
routing rows success/failure. The publish loop is driver-side
control plane (alerting sink, like put_slack / put_email — bounded
row counts); the 100 TB data plane never routes through SNS.
"""

from __future__ import annotations

import json
import urllib.parse
import xml.etree.ElementTree as ET

from nifi_spark.sources.sqs import (SqsError, _esc, _xml, sigv4_sign,
                                    sigv4_verify)

MAX_SIZE = 256 * 1024      # PutSNS.java:82 — SNS's 256 KB limit


class SnsError(SqsError):
    pass


class SnsServer:
    """In-memory SNS speaking the Query protocol with SigV4
    verification. `published[arn]` = list of dicts (message_id,
    message, subject, structure, attributes). For
    ``MessageStructure=json`` the message must be a JSON object with a
    top-level string ``default`` (the service-side validation PutSNS
    relies on), else InvalidParameter."""

    def __init__(self, *, region: str = "us-east-1",
                 secrets: dict[str, str] | None = None):
        self.region = region
        self.secrets = secrets or {}
        self.topics: set[str] = set()
        self.published: dict[str, list[dict]] = {}
        self._next_id = 0
        self.rejected = 0

    def create_topic(self, arn: str) -> None:
        self.topics.add(arn)
        self.published.setdefault(arn, [])

    def handle(self, url: str, method: str, headers: dict[str, str],
               body: bytes) -> tuple[int, bytes]:
        try:
            sigv4_verify(method, url, headers, body,
                         secrets=self.secrets)
        except SqsError as exc:
            self.rejected += 1
            code = ("SignatureDoesNotMatch"
                    if "Signature" in str(exc) else str(exc))
            return 403, _xml("ErrorResponse", _xml("Error", _xml(
                "Code", code))).encode()
        params = dict(urllib.parse.parse_qsl(body.decode()))
        if params.get("Action") != "Publish":
            return 400, _xml("ErrorResponse", _xml("Error", _xml(
                "Code", "InvalidAction"))).encode()
        arn = params.get("TopicArn") or params.get("TargetArn") or ""
        if arn not in self.topics:
            return 404, _xml("ErrorResponse", _xml("Error", _xml(
                "Code", "NotFound"))).encode()
        message = params.get("Message", "")
        structure = params.get("MessageStructure")
        if structure == "json":
            try:
                tree = json.loads(message)
                if not isinstance(tree, dict) or \
                        not isinstance(tree.get("default"), str):
                    raise ValueError("no default")
            except ValueError:
                return 400, _xml("ErrorResponse", _xml("Error", _xml(
                    "Code", "InvalidParameter") + _xml(
                    "Message", "Message Structure - No default entry "
                    "in JSON message body"))).encode()
        attrs = {}
        i = 1
        while f"MessageAttributes.entry.{i}.Name" in params:
            attrs[params[f"MessageAttributes.entry.{i}.Name"]] = params.get(
                f"MessageAttributes.entry.{i}.Value.StringValue", "")
            i += 1
        self._next_id += 1
        mid = f"sns-{self._next_id:08d}"
        self.published[arn].append({
            "message_id": mid, "message": message,
            "subject": params.get("Subject"),
            "structure": structure, "attributes": attrs,
            "via": "TopicArn" if "TopicArn" in params else "TargetArn"})
        return 200, _xml("PublishResponse", _xml(
            "PublishResult", _xml("MessageId", _esc(mid)))).encode()

    def transport(self, url: str, method: str,
                  headers: dict[str, str], body: bytes):
        return self.handle(url, method, headers, body)


class SnsClient:
    """Query-protocol SNS client; every call SigV4-signed."""

    def __init__(self, transport, endpoint: str, *, access_key: str,
                 secret_key: str, region: str = "us-east-1"):
        self.transport = transport
        self.endpoint = endpoint
        self.access_key, self.secret_key = access_key, secret_key
        self.region = region
        self._seq = 0

    def publish(self, message: str, *, topic_arn: str | None = None,
                target_arn: str | None = None,
                subject: str | None = None,
                attributes: dict[str, str] | None = None,
                json_structure: bool = False) -> str:
        if (topic_arn is None) == (target_arn is None):
            raise ValueError("exactly one of topic_arn/target_arn")
        params = {"Action": "Publish", "Message": message}
        if topic_arn is not None:
            params["TopicArn"] = topic_arn
        else:
            params["TargetArn"] = target_arn
        if subject is not None:
            params["Subject"] = subject
        if json_structure:
            params["MessageStructure"] = "json"
        for i, (k, v) in enumerate(sorted(
                (attributes or {}).items()), start=1):
            params[f"MessageAttributes.entry.{i}.Name"] = k
            params[f"MessageAttributes.entry.{i}.Value.DataType"] = \
                "String"
            params[f"MessageAttributes.entry.{i}.Value.StringValue"] = v
        self._seq += 1
        body = urllib.parse.urlencode(params).encode()
        headers = sigv4_sign(
            "POST", self.endpoint,
            {"content-type":
             "application/x-www-form-urlencoded; charset=utf-8"},
            body, access_key=self.access_key,
            secret_key=self.secret_key, region=self.region,
            service="sns",
            amz_date=f"20260101T{self._seq % 86400:06d}Z")
        status, resp = self.transport(self.endpoint, "POST", headers,
                                      body)
        root = ET.fromstring(resp.decode())
        if status != 200:
            code = root.findtext(".//Code") or "Unknown"
            raise SnsError(f"{status} {code}")
        return root.findtext(".//MessageId")


def put_sns(rows: list[dict], client: SnsClient, *, arn_col: str = "arn",
            content_col: str = "content",
            subject_col: str | None = None,
            attr_cols: list[str] | None = None,
            arn_type: str = "topic", use_json_structure: bool = False
            ) -> list[tuple[dict, str, dict]]:
    """PutSNS analog: per row publish `content_col` to `arn_col`,
    routing (row, relationship, attrs). Oversized content (>256 KB)
    routes failure WITHOUT calling the service (PutSNS.java:106-110);
    publish errors (bad JSON structure, unknown topic) route failure
    with the error code, like the penalize path."""
    if arn_type not in ("topic", "target"):
        raise ValueError("arn_type must be 'topic' or 'target'")
    out: list[tuple[dict, str, dict]] = []
    for row in rows:
        content = row[content_col]
        if isinstance(content, (bytes, bytearray)):
            raw_len = len(content)
            content = bytes(content).decode("utf-8")
        else:
            raw_len = len(str(content).encode("utf-8"))
        if raw_len > MAX_SIZE:
            out.append((row, "failure", {"sns.error": "MessageTooLong"}))
            continue
        attrs = {c: str(row[c]) for c in (attr_cols or [])
                 if row.get(c) not in (None, "")}
        kw = {"topic_arn": row[arn_col]} if arn_type == "topic" \
            else {"target_arn": row[arn_col]}
        try:
            mid = client.publish(
                str(content),
                subject=(str(row[subject_col])
                         if subject_col and row.get(subject_col)
                         is not None else None),
                attributes=attrs, json_structure=use_json_structure,
                **kw)
        except SqsError as exc:
            out.append((row, "failure", {"sns.error": str(exc)}))
            continue
        out.append((row, "success", {"sns.message.id": mid}))
    return out
