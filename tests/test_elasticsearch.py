"""Elasticsearch HTTP connector family (sources/elasticsearch.py):
bulk indexing, fetch relationships (success/not-found/retry),
query-string paging with limit, and the @Stateful scroll resume
contract. Pure protocol tests except the spool reads."""

from __future__ import annotations

import json

import pytest

from nifi_spark.ledger import KVState
from nifi_spark.sources.elasticsearch import (EsClient, EsError,
                                              EsNotFound,
                                              EsRetryableError,
                                              EsServer, QueryEsSource,
                                              ScrollEsSource)


@pytest.fixture()
def es():
    srv = EsServer()
    c = EsClient(srv.transport, "http://es:9200")
    docs = [("logs", "event", f"id{i}",
             {"grp": i % 4, "v": i, "msg": f"m {i}"})
            for i in range(75)]
    assert c.bulk_index(docs) == {"indexed": 75, "failed": []}
    return srv, c


def test_fetch_relationships(es):
    srv, c = es
    got = c.fetch("logs", "event", "id7")
    # the reference's attribute surface (FetchElasticsearchHttp:63-67)
    assert got["filename"] == "id7" and got["es.index"] == "logs" \
        and got["es.type"] == "event" and got["source"]["v"] == 7
    assert c.fetch("logs", "event", "id7",
                   fields=["v"])["source"] == {"v": 7}
    with pytest.raises(EsNotFound):
        c.fetch("logs", "event", "missing")
    srv.fail_next = 1
    with pytest.raises(EsRetryableError):
        c.fetch("logs", "event", "id7")


def test_bulk_per_item_failures(es):
    _srv, c = es
    r = c.bulk_index([("logs", "event", "ok1", {"v": 1}),
                      ("", "event", "bad", {"v": 2}),
                      ("logs", "event", "ok2", {"v": 3})])
    assert r["indexed"] == 2
    assert [f[0] for f in r["failed"]] == [None]


def test_query_string_and_unsupported_clause(es):
    _srv, c = es
    hits = c.search("logs", q="grp:2 AND v:6")["hits"]["hits"]
    assert [h["_id"] for h in hits] == ["id6"]
    with pytest.raises(EsError):
        c.search("logs", q="freetext")


def test_query_source_pages_and_limit(es, tmp_path, spark):
    _srv, c = es
    src = QueryEsSource(str(tmp_path / "q"))
    assert src.drain(c, "logs", q="grp:2", page_size=5) == 19
    assert src.drain(c, "logs", q="*:*", page_size=10, limit=23) == 23
    df = src.read(spark)
    assert df.count() == 42
    # payload carries the source doc
    row = df.filter(df.es_id == "id6").limit(1).collect()[0]
    assert json.loads(row["payload"])["v"] == 6


def test_scroll_source_is_stateful_and_resumes(es, tmp_path):
    srv, c = es
    state = KVState(str(tmp_path / "st"))
    src = ScrollEsSource(str(tmp_path / "sp"), state)
    assert src.drain(c, "logs", page_size=12) == 75
    # finished is latched (the reference never restarts a done scroll)
    assert src.drain(c, "logs", page_size=12) == 0
    assert state.get("scroll_es") == {"finished": True}
    # crash-resume: a prior run landed page 1 and committed scrollId;
    # the new run continues the SAME scroll context
    state2 = KVState(str(tmp_path / "st2"))
    src2 = ScrollEsSource(str(tmp_path / "sp2"), state2)
    resp = c.search("logs", q="*:*", size=12, scroll="1m")
    state2.put("scroll_es", {"scrollId": resp["_scroll_id"]})
    assert src2.drain(c, "logs", page_size=12) == 75 - 12
    assert state2.get("scroll_es") == {"finished": True}
    src2.reset()
    assert state2.get("scroll_es") == {}
