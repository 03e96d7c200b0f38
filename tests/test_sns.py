"""PutSNS analog — SNS Query-protocol loopback tests.

Mirrors PutSNS.java semantics: 256 KB failure gate, Topic vs Target
ARN, optional subject, dynamic-property message attributes,
MessageStructure=json 'default' validation, SigV4 on the wire.
"""

from __future__ import annotations

import json

import pytest

from nifi_spark.sources.sns import (MAX_SIZE, SnsClient, SnsError,
                                    SnsServer, put_sns)

URL = "https://sns.us-east-1.amazonaws.com/"


def mk():
    srv = SnsServer(secrets={"AKIDEXAMPLE": "topsecret"})
    srv.create_topic("arn:aws:sns:us-east-1:123456789012:alerts")
    client = SnsClient(srv.transport, URL, access_key="AKIDEXAMPLE",
                       secret_key="topsecret")
    return srv, client


def test_publish_roundtrip_with_subject_and_attrs():
    srv, client = mk()
    arn = "arn:aws:sns:us-east-1:123456789012:alerts"
    mid = client.publish("hello world", topic_arn=arn,
                         subject="greeting",
                         attributes={"kind": "demo", "n": "7"})
    assert mid == "sns-00000001"
    p = srv.published[arn][0]
    assert p["message"] == "hello world"
    assert p["subject"] == "greeting"
    assert p["attributes"] == {"kind": "demo", "n": "7"}
    assert p["via"] == "TopicArn"
    # target ARN path
    client.publish("direct", target_arn=arn)
    assert srv.published[arn][1]["via"] == "TargetArn"


def test_sigv4_rejected_and_unknown_topic():
    srv, _ = mk()
    bad = SnsClient(srv.transport, URL, access_key="AKIDEXAMPLE",
                    secret_key="WRONG")
    with pytest.raises(SnsError, match="SignatureDoesNotMatch"):
        bad.publish("x", topic_arn="arn:aws:sns:us-east-1:"
                    "123456789012:alerts")
    assert srv.rejected == 1
    _, good = mk()
    with pytest.raises(SnsError, match="NotFound"):
        good.publish("x", topic_arn="arn:nope")


def test_json_structure_validation():
    srv, client = mk()
    arn = "arn:aws:sns:us-east-1:123456789012:alerts"
    ok = json.dumps({"default": "fallback", "email": "long form"})
    client.publish(ok, topic_arn=arn, json_structure=True)
    assert srv.published[arn][0]["structure"] == "json"
    with pytest.raises(SnsError, match="InvalidParameter"):
        client.publish(json.dumps({"email": "no default"}),
                       topic_arn=arn, json_structure=True)
    with pytest.raises(SnsError, match="InvalidParameter"):
        client.publish("not json at all", topic_arn=arn,
                       json_structure=True)


def test_put_sns_routing():
    srv, client = mk()
    arn = "arn:aws:sns:us-east-1:123456789012:alerts"
    rows = [
        {"arn": arn, "content": "fine 0", "subj": "s0", "kind": "a"},
        {"arn": arn, "content": "x" * (MAX_SIZE + 1), "subj": None,
         "kind": "b"},                      # size gate, no service call
        {"arn": "arn:nope", "content": "fine 2", "subj": None,
         "kind": ""},                       # publish error → failure
        {"arn": arn, "content": b"bytes ok", "subj": "s3", "kind": "c"},
    ]
    routed = put_sns(rows, client, arn_col="arn", content_col="content",
                     subject_col="subj", attr_cols=["kind"])
    rels = [r for _, r, _ in routed]
    assert rels == ["success", "failure", "failure", "success"]
    assert routed[1][2]["sns.error"] == "MessageTooLong"
    assert "NotFound" in routed[2][2]["sns.error"]
    assert len(srv.published[arn]) == 2     # oversized never reached it
    assert srv.published[arn][1]["message"] == "bytes ok"
    # empty-string attribute values are skipped like the reference's
    # StringUtils.isEmpty guard
    assert srv.published[arn][0]["attributes"] == {"kind": "a"}


def test_put_sns_target_mode_and_bad_arn_type():
    srv, client = mk()
    arn = "arn:aws:sns:us-east-1:123456789012:alerts"
    put_sns([{"arn": arn, "content": "t"}], client, arn_type="target")
    assert srv.published[arn][0]["via"] == "TargetArn"
    with pytest.raises(ValueError, match="arn_type"):
        put_sns([], client, arn_type="queue")
