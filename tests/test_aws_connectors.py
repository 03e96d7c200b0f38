"""DynamoDB / Kinesis / Firehose / Lambda / CloudWatch analogs over
the SigV4-verified in-process servers."""

from __future__ import annotations

import json

import pytest

from nifi_spark.sources.dynamo import (DynamoClient, DynamoServer,
                                       delete_dynamodb, get_dynamodb,
                                       put_dynamodb)
from nifi_spark.sources.kinesis import (AwsJsonClient, KinesisServer,
                                        put_cloudwatch_metric,
                                        put_kinesis_firehose,
                                        put_kinesis_stream, put_lambda,
                                        shard_for_key)
from nifi_spark.sources.sqs import SqsError


def _ddb():
    server = DynamoServer()
    server.create_table("docs", "pk", "sk")
    client = DynamoClient(server.transport)
    return server, client


def test_dynamo_put_get_roundtrip():
    server, client = _ddb()
    rows = [{"hash": f"h{i % 3}", "range": i, "content": f"doc-{i}"}
            for i in range(10)]
    res = put_dynamodb(rows, client, table="docs", hash_key="pk",
                       range_key="sk")
    assert all(rel == "success" for _, rel, _ in res)
    got = get_dynamodb(rows, client, table="docs", hash_key="pk",
                       range_key="sk")
    assert {a["content"] for _, rel, a in got if rel == "success"} == \
        {f"doc-{i}" for i in range(10)}


def test_dynamo_not_found_and_unprocessed_routes():
    server, client = _ddb()
    put_dynamodb([{"hash": "h", "range": 1, "content": "x"}], client,
                 table="docs", hash_key="pk", range_key="sk")
    rows = [{"hash": "h", "range": i, "content": ""} for i in range(4)]
    got = get_dynamodb(rows, client, table="docs", hash_key="pk",
                       range_key="sk")
    rels = sorted(rel for _, rel, _ in got)
    assert rels == ["not found", "not found", "not found", "success"]
    # throttle: only 2 keys processed per request → rest unprocessed
    server.process_quota = 2
    got = get_dynamodb(rows, client, table="docs", hash_key="pk",
                       range_key="sk")
    assert sum(1 for _, rel, _ in got if rel == "unprocessed") == 2
    unattrs = [a for _, rel, a in got if rel == "unprocessed"][0]
    assert "dynamodb.key.error.unprocessed" in unattrs


def test_dynamo_put_throttle_and_oversize():
    server, client = _ddb()
    server.process_quota = 3
    rows = [{"hash": "h", "range": i, "content": "y"} for i in range(5)]
    rows.append({"hash": "big", "range": 9,
                 "content": "z" * (401 * 1024)})
    res = put_dynamodb(rows, client, table="docs", hash_key="pk",
                       range_key="sk")
    by_rel = {}
    for _, rel, _ in res:
        by_rel[rel] = by_rel.get(rel, 0) + 1
    assert by_rel == {"success": 3, "unprocessed": 2, "failure": 1}


def test_dynamo_delete_and_bad_secret():
    server, client = _ddb()
    put_dynamodb([{"hash": "h", "range": 1, "content": "x"}], client,
                 table="docs", hash_key="pk", range_key="sk")
    res = delete_dynamodb([{"hash": "h", "range": 1}], client,
                          table="docs", hash_key="pk", range_key="sk")
    assert res[0][1] == "success"
    got = get_dynamodb([{"hash": "h", "range": 1}], client,
                       table="docs", hash_key="pk", range_key="sk")
    assert got[0][1] == "not found"
    bad = DynamoClient(server.transport, secret_key="WRONG")
    with pytest.raises(SqsError):
        bad.batch_get_item("docs", [{"pk": {"S": "h"}}])


def _kinesis():
    server = KinesisServer()
    server.create_stream("events", n_shards=4)
    server.create_delivery_stream("lake")
    client = AwsJsonClient(server.transport, service="kinesis")
    return server, client


def test_kinesis_put_records_shard_mapping():
    server, client = _kinesis()
    rows = [{"content": f"e{i}", "kinesis.partition.key": f"k{i}"}
            for i in range(40)]
    res = put_kinesis_stream(rows, client, stream="events")
    assert all(rel == "success" for _, rel, _ in res)
    # server-side shard placement matches the documented MD5 mapping
    for (row, _, attrs) in res:
        want = shard_for_key(row["kinesis.partition.key"], 4)
        assert attrs["aws.kinesis.shard.id"] == f"shardId-{want:012d}"
    landed = sum(len(s) for s in server.streams["events"]["shards"])
    assert landed == 40


def test_kinesis_throttled_shard_routes_failure():
    server, client = _kinesis()
    server.throttled_shards = {1}
    rows = [{"content": f"e{i}", "kinesis.partition.key": f"k{i}"}
            for i in range(40)]
    res = put_kinesis_stream(rows, client, stream="events")
    n_throttled = sum(1 for i in range(40)
                      if shard_for_key(f"k{i}", 4) == 1)
    fails = [a for _, rel, a in res if rel == "failure"]
    assert len(fails) == n_throttled > 0
    assert all(a["aws.kinesis.error.code"] ==
               "ProvisionedThroughputExceededException" for a in fails)


def test_kinesis_oversize_record_prefiltered():
    server, client = _kinesis()
    rows = [{"content": b"x" * (1001 * 1024)}, {"content": "ok"}]
    res = put_kinesis_stream(rows, client, stream="events")
    assert res[0][1] == "failure"
    assert "record too big" in res[0][2]["aws.kinesis.error.message"]
    assert res[1][1] == "success"


def test_firehose_batch_lands_with_record_ids():
    server, _ = _kinesis()
    client = AwsJsonClient(server.transport, service="firehose")
    rows = [{"content": f"r{i}"} for i in range(7)]
    res = put_kinesis_firehose(rows, client, delivery_stream="lake",
                               batch_size=3)
    assert all(rel == "success" for _, rel, _ in res)
    ids = [a["aws.kinesis.firehose.record.id"] for _, _, a in res]
    assert len(set(ids)) == 7
    assert server.delivery_streams["lake"] == \
        [f"r{i}".encode() for i in range(7)]


def test_lambda_invoke_success_and_function_error():
    server, _ = _kinesis()
    client = AwsJsonClient(server.transport, service="lambda")

    def fn(payload: bytes) -> bytes:
        doc = json.loads(payload)
        if doc["n"] % 3 == 0:
            raise ValueError(f"bad n {doc['n']}")
        return json.dumps({"n2": doc["n"] * 2}).encode()

    server.register_function("double", fn)
    rows = [{"content": json.dumps({"n": i})} for i in range(6)]
    res = put_lambda(rows, client, function_name="double")
    rels = [rel for _, rel, _ in res]
    assert rels == ["failure", "success", "success",
                    "failure", "success", "success"]
    ok = [a for _, rel, a in res if rel == "success"]
    assert json.loads(ok[0]["aws.lambda.result.payload"]) == {"n2": 2}
    bad = [a for _, rel, a in res if rel == "failure"]
    assert bad[0]["aws.lambda.result.function.error"] == "Unhandled"
    assert "START invoke double" in ok[0]["aws.lambda.result.log"]


def test_cloudwatch_put_metric_data():
    server, _ = _kinesis()
    client = AwsJsonClient(server.transport, service="monitoring")
    rows = [{"v": i} for i in range(3)]
    res = put_cloudwatch_metric(rows, client, namespace="nifi_spark",
                                metric_name="lag",
                                value=lambda r: r["v"] * 1.5,
                                unit="Count")
    assert all(rel == "success" for _, rel, _ in res)
    assert [m["value"] for m in server.metrics] == [0.0, 1.5, 3.0]
    assert server.metrics[0]["namespace"] == "nifi_spark"
    bad = put_cloudwatch_metric([{"v": "NaN?"}], client,
                                namespace="n", metric_name="m",
                                value=lambda r: "not-a-double")
    assert bad[0][1] == "failure"
