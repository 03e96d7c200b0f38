"""GetTwitter / YandexTranslate / ConsumeWindowsEventLog analogs
(sources/social.py)."""

from __future__ import annotations

import pytest

from nifi_spark.sources.social import (ENDPOINT_FILTER,
                                       ENDPOINT_FIREHOSE,
                                       ENDPOINT_SAMPLE,
                                       ConsumeWindowsEventLogSource,
                                       FakeTranslator, GetTwitterSource,
                                       TwitterStreamServer,
                                       yandex_translate)


def _tweets():
    return [{"id": i, "lang": "en" if i % 3 else "fr",
             "text": f"spark rocks {i}" if i % 2 == 0 else f"other {i}",
             "user": {"id": 100 + i % 5}} for i in range(30)]


def test_twitter_sample_language_filter(tmp_path):
    srv = TwitterStreamServer(_tweets())
    src = GetTwitterSource(str(tmp_path / "s"), endpoint=ENDPOINT_SAMPLE,
                           languages=["fr"])
    assert src.drain(srv.stream) == 10     # i % 3 == 0


def test_twitter_firehose_gets_all(tmp_path):
    srv = TwitterStreamServer(_tweets())
    src = GetTwitterSource(str(tmp_path / "s"),
                           endpoint=ENDPOINT_FIREHOSE)
    assert src.drain(srv.stream) == 30


def test_twitter_filter_terms_or_follow(tmp_path):
    srv = TwitterStreamServer(_tweets())
    src = GetTwitterSource(str(tmp_path / "s"), endpoint=ENDPOINT_FILTER,
                           terms=["SPARK"], follow=[101])
    # even ids match 'spark'; odd ids with user 101 (i%5==1): 1,11,21
    n = src.drain(srv.stream)
    assert n == 15 + 3


def test_twitter_filter_requires_criteria(tmp_path):
    with pytest.raises(ValueError):
        GetTwitterSource(str(tmp_path / "s"), endpoint=ENDPOINT_FILTER)


def test_twitter_read_back(spark, tmp_path):
    srv = TwitterStreamServer(_tweets()[:4])
    src = GetTwitterSource(str(tmp_path / "s"),
                           endpoint=ENDPOINT_FIREHOSE)
    src.drain(srv.stream)
    df = src.read(spark)
    assert df.count() == 4
    assert df.first()["mime_type"] == "application/json"


# -------------------------------------------------------- translate

def test_yandex_attribute_and_content_order():
    tr = FakeTranslator()
    ok, comms, failed = yandex_translate(
        [{"content": "hello world", "note": "good morning"}],
        tr.transport, key="k", source_language="en",
        target_language="ru",
        dynamic_properties=[("note.translated", "{note}")],
        translate_content=True)
    assert not comms and not failed
    row = ok[0]
    assert row["note.translated"] == "morning good [en-ru]"
    assert row["content"] == "world hello [en-ru]"
    assert row["language"] == "ru"
    # wire shape: repeated text params + key + lang
    req = tr.requests[0]
    assert req["text"] == ["good morning", "hello world"]
    assert req["lang"] == ["en-ru"] and req["key"] == ["k"]


def test_yandex_translation_failure_routes():
    tr = FakeTranslator(fail_langs={"xx"})
    ok, comms, failed = yandex_translate(
        [{"content": "a"}], tr.transport, key="k",
        source_language="en", target_language="xx",
        translate_content=True)
    assert not ok and not comms
    assert failed[0]["yandex.translate.failure.reason"] == "HTTP 501"


def test_yandex_comms_failure_routes():
    def broken(url, body):
        raise IOError("down")

    ok, comms, failed = yandex_translate(
        [{"content": "a"}], broken, key="k", source_language="en",
        target_language="ru", translate_content=True)
    assert comms and not ok and not failed


# ------------------------------------------------ windows event log

def _events(n=6, big_at=None):
    out = []
    for i in range(n):
        body = "B" * 2_000_000 if i == big_at else f"payload {i}"
        out.append(f"<Event><System><EventID>{i}</EventID></System>"
                   f"<Data>{body}</Data></Event>")
    return out


def test_winevt_drain_and_oversize_drop(spark, tmp_path):
    src = ConsumeWindowsEventLogSource(str(tmp_path / "s"),
                                       channel="Security")
    evs = _events(6, big_at=3)

    def subscription(channel, query):
        assert channel == "Security" and query == "*"
        return iter(evs)

    assert src.drain(subscription) == 5
    assert src.dropped == 1
    df = src.read(spark)
    assert df.count() == 5
    assert df.first()["mime_type"] == "application/xml"
