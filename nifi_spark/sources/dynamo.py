"""GetDynamoDB / PutDynamoDB / DeleteDynamoDB analogs — the DynamoDB
JSON 1.0 wire protocol (POST + ``X-Amz-Target: DynamoDB_20120810.*``
+ SigV4) from the public API reference, over the same injectable
transport / in-process-server seam as the SQS and S3 connectors.

NiFi ancestors (nifi-aws-bundle):
- GetDynamoDB.java:100-200 — BatchGetItem over a batch of FlowFiles
  keyed by hash(+range) attributes; found items land as the JSON
  document in content (success), keys echoed in UnprocessedKeys route
  to 'unprocessed' with ``dynamodb.key.error.unprocessed``, keys in
  neither set route to 'not found' with
  ``dynamodb.key.error.not.found`` (AbstractDynamoDBProcessor.java:67).
- PutDynamoDB.java:120-190 — BatchWriteItem of PutRequests (25-item
  wire chunks), the 400 KB item-size guard routing oversized items to
  failure with ``dynamodb.item.size.error`` BEFORE the wire call, and
  UnprocessedItems → 'unprocessed'
  (AbstractWriteDynamoDBProcessor.java:43-60).
- DeleteDynamoDB.java — BatchWriteItem of DeleteRequests, same
  unprocessed contract.

The in-process `DynamoServer` verifies SigV4 on every request
(service "dynamodb", reusing the SQS signer) and models capacity
throttling deterministically: `process_quota` caps how many items any
single request may process; the rest are echoed back as
UnprocessedKeys / UnprocessedItems exactly as a throttled partition
would. AttributeValue typed maps ({"S":...},{"N":...}) are honored —
numbers compare numerically, strings lexically.
"""

from __future__ import annotations

import json

from .sqs import SqsError, sigv4_sign, sigv4_verify

DYNAMODB_KEY_ERROR_UNPROCESSED = "dynamodb.key.error.unprocessed"
DYNAMODB_KEY_ERROR_NOT_FOUND = "dynamodb.key.error.not.found"
DYNAMODB_ITEM_SIZE_ERROR = "dynamodb.item.size.error"
MAX_ITEM_SIZE = 400 * 1024          # PutDynamoDB.DYNAMODB_MAX_ITEM_SIZE
WIRE_BATCH = 25                     # BatchWriteItem hard wire limit


def _av(value) -> dict:
    """Python value → DynamoDB AttributeValue."""
    if isinstance(value, bool):
        return {"BOOL": value}
    if isinstance(value, (int, float)):
        return {"N": repr(value) if isinstance(value, float) else str(value)}
    return {"S": str(value)}


def _un_av(av: dict):
    if "N" in av:
        n = av["N"]
        return float(n) if ("." in n or "e" in n) else int(n)
    if "BOOL" in av:
        return av["BOOL"]
    return av.get("S")


def _key_av(row: dict, hash_key: str, range_key: str | None) -> dict:
    key = {hash_key: _av(row["hash"])}
    if range_key is not None:
        key[range_key] = _av(row["range"])
    return key


def _key_tuple(key: dict) -> tuple:
    return tuple(sorted((k, json.dumps(v, sort_keys=True))
                        for k, v in key.items()))


class DynamoServer:
    """In-process DynamoDB endpoint: SigV4-verified JSON-1.0 targets
    BatchGetItem / BatchWriteItem with deterministic throttling."""

    def __init__(self, *, region: str = "us-east-1",
                 secrets: dict[str, str] | None = None):
        self.region = region
        self.secrets = secrets or {"AKID": "SECRET"}
        self.tables: dict[str, dict] = {}
        self.process_quota: int | None = None   # max items per request

    def create_table(self, name: str, hash_key: str,
                     range_key: str | None = None) -> None:
        self.tables[name] = {"hash": hash_key, "range": range_key,
                             "items": {}}

    def handle(self, url: str, method: str, headers: dict[str, str],
               body: bytes) -> tuple[int, bytes]:
        try:
            sigv4_verify(method, url, headers, body,
                         secrets=self.secrets)
        except SqsError as e:
            return 403, json.dumps(
                {"__type": "UnrecognizedClientException",
                 "message": str(e)}).encode()
        target = {k.lower(): v for k, v in headers.items()}.get(
            "x-amz-target", "")
        req = json.loads(body)
        if target.endswith("BatchGetItem"):
            return 200, json.dumps(self._batch_get(req)).encode()
        if target.endswith("BatchWriteItem"):
            return 200, json.dumps(self._batch_write(req)).encode()
        return 400, json.dumps(
            {"__type": "UnknownOperationException"}).encode()

    def transport(self, url: str, method: str, headers: dict[str, str],
                  body: bytes) -> tuple[int, bytes]:
        return self.handle(url, method, headers, body)

    def _budget(self) -> list[int]:
        # mutable one-slot budget shared across tables in one request
        return [self.process_quota if self.process_quota is not None
                else 1 << 30]

    def _batch_get(self, req: dict) -> dict:
        responses: dict[str, list] = {}
        unprocessed: dict[str, dict] = {}
        budget = self._budget()
        for table, spec in req["RequestItems"].items():
            t = self.tables[table]
            responses[table] = []
            for key in spec["Keys"]:
                if budget[0] <= 0:
                    unprocessed.setdefault(table, {"Keys": []})[
                        "Keys"].append(key)
                    continue
                budget[0] -= 1
                item = t["items"].get(_key_tuple(key))
                if item is not None:
                    responses[table].append(item)
        return {"Responses": responses,
                "UnprocessedKeys": unprocessed}

    def _batch_write(self, req: dict) -> dict:
        unprocessed: dict[str, list] = {}
        budget = self._budget()
        for table, reqs in req["RequestItems"].items():
            if len(reqs) > WIRE_BATCH:
                raise SqsError("ValidationException: too many items")
            t = self.tables[table]
            for wr in reqs:
                if budget[0] <= 0:
                    unprocessed.setdefault(table, []).append(wr)
                    continue
                budget[0] -= 1
                if "PutRequest" in wr:
                    item = wr["PutRequest"]["Item"]
                    key = {k: item[k] for k in
                           (t["hash"], t["range"]) if k is not None}
                    t["items"][_key_tuple(key)] = item
                else:
                    key = wr["DeleteRequest"]["Key"]
                    t["items"].pop(_key_tuple(key), None)
        return {"UnprocessedItems": unprocessed}


class DynamoClient:
    """JSON-1.0 protocol client; every call SigV4-signed."""

    def __init__(self, transport, *, endpoint: str = "https://dynamodb.local/",
                 access_key: str = "AKID", secret_key: str = "SECRET",
                 region: str = "us-east-1",
                 amz_date: str = "20260101T000000Z"):
        self._t = transport
        self.endpoint = endpoint
        self.access_key, self.secret_key = access_key, secret_key
        self.region, self.amz_date = region, amz_date

    def _call(self, target: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        headers = sigv4_sign(
            "POST", self.endpoint,
            {"content-type": "application/x-amz-json-1.0",
             "x-amz-target": f"DynamoDB_20120810.{target}"},
            body, access_key=self.access_key,
            secret_key=self.secret_key, region=self.region,
            service="dynamodb", amz_date=self.amz_date)
        status, resp = self._t(self.endpoint, "POST", headers, body)
        if status != 200:
            err = json.loads(resp)
            raise SqsError(f"{err.get('__type')}: {err.get('message')}")
        return json.loads(resp)

    def batch_get_item(self, table: str, keys: list[dict]) -> dict:
        return self._call("BatchGetItem",
                          {"RequestItems": {table: {"Keys": keys}}})

    def batch_write_item(self, table: str,
                         requests: list[dict]) -> dict:
        return self._call("BatchWriteItem",
                          {"RequestItems": {table: requests}})


# ------------------------------------------------- processor analogs


def put_dynamodb(rows: list[dict], client: DynamoClient, *,
                 table: str, hash_key: str, range_key: str | None = None,
                 json_document: str = "document",
                 batch_size: int = WIRE_BATCH) -> list[tuple[dict, str, dict]]:
    """PutDynamoDB.java:120-190 — each row {'hash':…, ('range':…,)
    'content': str}; returns (row, relationship, attributes)."""
    out: list[tuple[dict, str, dict]] = []
    pending: list[dict] = []
    for row in rows:
        if len(row["content"].encode()) + len(json_document) > MAX_ITEM_SIZE:
            out.append((row, "failure", {
                DYNAMODB_ITEM_SIZE_ERROR:
                    "Max size of item + attribute should be 400kb but was "
                    f"{len(row['content'].encode())}{len(json_document)}"}))
            continue
        pending.append(row)
    for start in range(0, len(pending), min(batch_size, WIRE_BATCH)):
        chunk = pending[start:start + min(batch_size, WIRE_BATCH)]
        reqs, keymap = [], {}
        for row in chunk:
            key = _key_av(row, hash_key, range_key)
            item = dict(key)
            item[json_document] = {"S": row["content"]}
            reqs.append({"PutRequest": {"Item": item}})
            keymap[_key_tuple(key)] = row
        resp = client.batch_write_item(table, reqs)
        unproc = resp.get("UnprocessedItems", {}).get(table, [])
        unproc_keys = set()
        for wr in unproc:
            item = wr["PutRequest"]["Item"]
            key = {k: item[k] for k in (hash_key, range_key)
                   if k is not None}
            unproc_keys.add(_key_tuple(key))
        for kt, row in keymap.items():
            if kt in unproc_keys:
                out.append((row, "unprocessed", {
                    DYNAMODB_KEY_ERROR_UNPROCESSED: str(dict(kt))}))
            else:
                out.append((row, "success", {}))
    return out


def get_dynamodb(rows: list[dict], client: DynamoClient, *,
                 table: str, hash_key: str, range_key: str | None = None,
                 json_document: str = "document",
                 batch_size: int = 50) -> list[tuple[dict, str, dict]]:
    """GetDynamoDB.java:100-200 — success rows carry the fetched
    document under attrs['content']; unprocessed / not found routed
    with their reference attributes."""
    out: list[tuple[dict, str, dict]] = []
    for start in range(0, len(rows), batch_size):
        chunk = rows[start:start + batch_size]
        keymap = {}
        keys = []
        for row in chunk:
            key = _key_av(row, hash_key, range_key)
            keys.append(key)
            keymap[_key_tuple(key)] = row
        resp = client.batch_get_item(table, keys)
        remaining = dict(keymap)
        for item in resp.get("Responses", {}).get(table, []):
            key = {k: item[k] for k in (hash_key, range_key)
                   if k is not None}
            row = remaining.pop(_key_tuple(key), None)
            if row is not None:
                doc = item.get(json_document)
                out.append((row, "success",
                            {"content": _un_av(doc) if doc else ""}))
        for key in (resp.get("UnprocessedKeys", {})
                    .get(table, {}).get("Keys", [])):
            row = remaining.pop(_key_tuple(key), None)
            if row is not None:
                out.append((row, "unprocessed", {
                    DYNAMODB_KEY_ERROR_UNPROCESSED: str(key)}))
        for kt, row in remaining.items():
            out.append((row, "not found", {
                DYNAMODB_KEY_ERROR_NOT_FOUND: str(dict(kt))}))
    return out


def delete_dynamodb(rows: list[dict], client: DynamoClient, *,
                    table: str, hash_key: str,
                    range_key: str | None = None,
                    batch_size: int = WIRE_BATCH) -> list[tuple[dict, str, dict]]:
    """DeleteDynamoDB.java — BatchWriteItem of DeleteRequests."""
    out: list[tuple[dict, str, dict]] = []
    for start in range(0, len(rows), min(batch_size, WIRE_BATCH)):
        chunk = rows[start:start + min(batch_size, WIRE_BATCH)]
        reqs, keymap = [], {}
        for row in chunk:
            key = _key_av(row, hash_key, range_key)
            reqs.append({"DeleteRequest": {"Key": key}})
            keymap[_key_tuple(key)] = row
        resp = client.batch_write_item(table, reqs)
        unproc_keys = set()
        for wr in resp.get("UnprocessedItems", {}).get(table, []):
            unproc_keys.add(_key_tuple(wr["DeleteRequest"]["Key"]))
        for kt, row in keymap.items():
            if kt in unproc_keys:
                out.append((row, "unprocessed", {
                    DYNAMODB_KEY_ERROR_UNPROCESSED: str(dict(kt))}))
            else:
                out.append((row, "success", {}))
    return out


__all__ = ["DynamoClient", "DynamoServer", "delete_dynamodb",
           "get_dynamodb", "put_dynamodb", "MAX_ITEM_SIZE",
           "DYNAMODB_KEY_ERROR_UNPROCESSED",
           "DYNAMODB_KEY_ERROR_NOT_FOUND", "DYNAMODB_ITEM_SIZE_ERROR"]
