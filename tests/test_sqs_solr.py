"""GetSQS (sources/sqs.py — Query protocol + real SigV4) and GetSolr
(sources/solr.py — select API + cursorMark + incremental date
watermark) analogs. Pure protocol tests except the spool-read checks,
which use the shared Spark session."""

from __future__ import annotations

import pytest

from nifi_spark.ledger import KVState
from nifi_spark.sources.solr import (GetSolrSource, SolrClient,
                                     SolrError, SolrServer)
from nifi_spark.sources.sqs import (GetSQSSource, SqsClient, SqsError,
                                    SqsServer, sigv4_sign,
                                    sigv4_signing_key, sigv4_verify)


# ------------------------------------------------------------- SigV4


def test_sigv4_derived_key_matches_aws_documented_vector():
    k = sigv4_signing_key("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
                          "20120215", "us-east-1", "iam")
    assert k.hex() == ("f4780e2d9f65fa895f9c67b32ce1baf0"
                       "b0d8a43505a000a1a9e090d414db404d")


def test_sigv4_sign_verify_roundtrip_and_tamper():
    url = "https://sqs.us-east-1.amazonaws.com/1/q"
    hdrs = sigv4_sign("POST", url, {"content-type": "text/plain"},
                      b"Action=X", access_key="AK",
                      secret_key="shh", region="us-east-1")
    assert sigv4_verify("POST", url, hdrs, b"Action=X",
                        secrets={"AK": "shh"}) == "AK"
    with pytest.raises(SqsError, match="SHA256Mismatch"):
        sigv4_verify("POST", url, hdrs, b"Action=Y",
                     secrets={"AK": "shh"})
    with pytest.raises(SqsError, match="SignatureDoesNotMatch"):
        sigv4_verify("POST", url, hdrs, b"Action=X",
                     secrets={"AK": "other"})
    with pytest.raises(SqsError, match="InvalidClientTokenId"):
        sigv4_verify("POST", url, hdrs, b"Action=X",
                     secrets={"ZZ": "shh"})


# --------------------------------------------------------------- SQS


@pytest.fixture()
def sqs():
    srv = SqsServer(secrets={"AKIDEXAMPLE": "topsecret"})
    srv.create_queue("jobs")
    url = "https://sqs.us-east-1.amazonaws.com/123456789012/jobs"
    return srv, SqsClient(srv.transport, url, access_key="AKIDEXAMPLE",
                          secret_key="topsecret")


def test_sqs_send_receive_delete(sqs):
    srv, c = sqs
    mids = [c.send_message(f"payload {i}", {"kind": f"k{i % 3}"})
            for i in range(5)]
    assert len(set(mids)) == 5
    msgs = c.receive_messages(max_messages=10)
    assert [m["body"] for m in msgs] == [f"payload {i}"
                                         for i in range(5)]
    assert msgs[2]["attributes"] == {"kind": "k2"}
    for m in msgs:
        c.delete_message(m["receipt_handle"])
    assert not srv.inflight and not srv.queues["jobs"]


def test_sqs_visibility_requeue(sqs):
    srv, c = sqs
    for i in range(4):
        c.send_message(f"p{i}")
    got = c.receive_messages(max_messages=4)
    assert len(got) == 4 and not srv.queues["jobs"]
    # visibility timeout expires without a delete -> all come back
    assert srv.requeue_inflight() == 4
    again = c.receive_messages(max_messages=10)
    assert [m["body"] for m in again] == [f"p{i}" for i in range(4)]


def test_sqs_wrong_secret_rejected(sqs):
    srv, _c = sqs
    url = "https://sqs.us-east-1.amazonaws.com/123456789012/jobs"
    bad = SqsClient(srv.transport, url, access_key="AKIDEXAMPLE",
                    secret_key="WRONG")
    with pytest.raises(SqsError, match="SignatureDoesNotMatch"):
        bad.receive_messages()
    assert srv.rejected == 1


def test_sqs_drain_spool(sqs, tmp_path, spark):
    srv, c = sqs
    for i in range(23):
        c.send_message(f"payload {i}", {"n": str(i)})
    src = GetSQSSource(str(tmp_path / "spool"))
    assert src.drain(c, max_messages=7) == 23
    assert not srv.queues["jobs"] and not srv.inflight  # auto-deleted
    df = src.read(spark)
    assert df.count() == 23
    assert df.select("message_id").distinct().count() == 23


# -------------------------------------------------------------- Solr


@pytest.fixture()
def solr():
    srv = SolrServer("docs")
    srv.add([{"id": f"d{i:03d}", "ts": 1000 + i * 10, "grp": i % 4}
             for i in range(97)])
    return srv, SolrClient(srv.transport, "http://solr.local/solr",
                           "docs")


def test_solr_cursor_mark_sweeps_everything(solr):
    srv, c = solr
    got = c.cursor_all(sort="ts asc, id asc", rows=9)
    assert [d["id"] for d in got] == [f"d{i:03d}" for i in range(97)]


def test_solr_range_fq_bracket_semantics(solr):
    _srv, c = solr
    # [inclusive TO exclusive}
    sub = c.cursor_all(fq="ts:[1100 TO 1200}", sort="ts asc, id asc",
                       rows=7)
    assert [d["id"] for d in sub] == [f"d{i:03d}"
                                      for i in range(10, 20)]
    # {exclusive TO inclusive]
    sub2 = c.cursor_all(fq="ts:{1100 TO 1200]", sort="ts asc, id asc",
                        rows=7)
    assert [d["id"] for d in sub2] == [f"d{i:03d}"
                                       for i in range(11, 21)]


def test_solr_unsupported_query_is_400(solr):
    _srv, c = solr
    with pytest.raises(SolrError, match="400"):
        c.select(q="a AND b", wt="json")


def test_get_solr_incremental_watermark(solr, tmp_path, spark):
    srv, c = solr
    state = KVState(str(tmp_path / "state"))
    src = GetSolrSource(str(tmp_path / "spool"), state)
    assert src.drain(c, date_field="ts", now=1500, rows=11) == 51
    # watermark advanced: nothing new in the same window
    assert src.drain(c, date_field="ts", now=1500, rows=11) == 0
    srv.add([{"id": "d200", "ts": 1505, "grp": 0}])
    assert src.drain(c, date_field="ts", now=2000, rows=11) == 47
    df = src.read(spark)
    assert df.count() == 98
    assert df.select("doc_seq").distinct().count() == 98


# ------------------------------------------------ TestGetSolr parity
# Mirrors the reference's TestGetSolr batch scenarios
# (nifi-solr-bundle/.../TestGetSolr.java:121-186): ten docs named
# doc0..doc9 (5 smiths), SOLR_QUERY last:smith, BATCH_SIZE-driven
# paging, RETURN_FIELDS projection. The reference counts one FlowFile
# per page; here the page count is the server's selects_served and
# the landed set is asserted directly.


def _solr_people():
    srv = SolrServer("people")
    docs = []
    for i in range(10):
        docs.append({"id": f"doc{i}",
                     "first": f"name{i}",
                     "last": "smith" if i % 2 == 0 else "jones",
                     "created": 1000 + i})
    srv.add(docs)
    return srv, SolrClient(srv.transport, "http://solr.local/solr",
                           "people")


def test_getsolr_more_than_batch_size_pages(tmp_path):
    # testMoreThanBatchSizeShouldProduceMultipleFlowFiles: 5 matches,
    # batch 2 -> 3 pages
    srv, c = _solr_people()
    state = KVState(str(tmp_path / "st"))
    src = GetSolrSource(str(tmp_path / "sp"), state)
    n = src.drain(c, date_field="created", now=9999, rows=2,
                  q="last:smith",
                  fields=["id", "first", "last", "created"])
    assert n == 5
    # pages of 2,2,1 + the empty same-mark echo select that
    # terminates a cursorMark loop
    assert srv.selects_served == 4


def test_getsolr_less_than_batch_size_single_page(tmp_path):
    srv, c = _solr_people()
    state = KVState(str(tmp_path / "st"))
    src = GetSolrSource(str(tmp_path / "sp"), state)
    n = src.drain(c, date_field="created", now=9999, rows=10,
                  q="last:smith", fields=["id", "created"])
    # one data page + the terminating same-mark echo
    assert n == 5 and srv.selects_served == 2


def test_getsolr_no_results_no_output(tmp_path):
    srv, c = _solr_people()
    state = KVState(str(tmp_path / "st"))
    src = GetSolrSource(str(tmp_path / "sp"), state)
    n = src.drain(c, date_field="created", now=9999, rows=10,
                  q="last:xyz")
    assert n == 0
    import os
    assert not os.listdir(str(tmp_path / "sp"))


def test_getsolr_return_fields_projection(tmp_path):
    import json
    srv, c = _solr_people()
    state = KVState(str(tmp_path / "st"))
    src = GetSolrSource(str(tmp_path / "sp"), state)
    src.drain(c, date_field="created", now=9999, rows=10,
              q="last:smith", fields=["id", "created"])
    import pyarrow.parquet as pq
    import os
    spool = str(tmp_path / "sp")
    t = pq.read_table(os.path.join(spool, sorted(os.listdir(spool))[0]))
    payloads = [json.loads(p) for p in t.column("payload").to_pylist()]
    assert all(set(p) == {"id", "created"} for p in payloads)


# --------------------------------------------- PutSolrContentStream


def test_put_solr_update_json_docs():
    from nifi_spark.sources.solr import put_solr
    srv = SolrServer("docs")
    c = SolrClient(srv.transport, "http://s/solr", "docs")
    assert put_solr(srv.transport, "http://s/solr", "docs",
                    [{"id": f"d{i}", "ts": i} for i in range(5)]) == 5
    assert len(c.cursor_all(sort="id asc", rows=3)) == 5
    # missing unique key -> 400 surfaces as SolrError
    with pytest.raises(SolrError, match="unique key"):
        put_solr(srv.transport, "http://s/solr", "docs", [{"ts": 1}])
