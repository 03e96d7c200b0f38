"""GetSplunk / PutSplunk analogs (sources/splunk.py): the managed
time-range state machine, index-time arg names, state reset on config
change, export landing, and the PutSplunk delimiter semantics."""

from __future__ import annotations

import pytest

from nifi_spark.ledger import KVState
from nifi_spark.sources.splunk import (EVENT_TIME, INDEX_TIME,
                                       MANAGED_BEGINNING, MANAGED_CURRENT,
                                       PROVIDED, GetSplunkSource,
                                       SplunkServer, format_time,
                                       parse_time, put_splunk)

BASE = 1_700_000_000_000


def _events(n=100, step=1000):
    return [(BASE + i * step, f"event {i}") for i in range(n)]


def _src(tmp_path, server_url="http://splunk:8089", **kw):
    return GetSplunkSource(str(tmp_path / "spool"),
                           KVState(str(tmp_path / "state")),
                           base_url=server_url, **kw)


def test_format_parse_roundtrip():
    s = format_time(BASE + 123)
    assert s.endswith("+0000") and ".123" in s
    assert parse_time(s) == BASE + 123


def test_managed_current_first_trigger_seeds_state_only(tmp_path):
    srv = SplunkServer(_events())
    src = _src(tmp_path, time_range_strategy=MANAGED_CURRENT)
    assert src.drain(srv.transport, now_ms=BASE + 50_000) == 0
    assert not srv.requests          # no query ran
    # second trigger queries (first_now + 1 .. now2]
    n = src.drain(srv.transport, now_ms=BASE + 80_000)
    # events in (50_000, 80_000] → i in 51..80 → 30 events
    assert n == 30
    req = srv.requests[0]
    assert req["earliest_time"] == format_time(BASE + 50_001)
    assert req["latest_time"] == format_time(BASE + 80_000)


def test_managed_beginning_first_trigger_has_no_earliest(tmp_path):
    srv = SplunkServer(_events())
    src = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING)
    n = src.drain(srv.transport, now_ms=BASE + 10_000)
    assert n == 11                   # i in 0..10
    assert "earliest_time" not in srv.requests[0]
    n2 = src.drain(srv.transport, now_ms=BASE + 20_000)
    assert n2 == 10                  # i in 11..20
    assert srv.requests[1]["earliest_time"] == format_time(BASE + 10_001)


def test_index_time_strategy_uses_index_args(tmp_path):
    srv = SplunkServer(_events())
    src = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING,
               time_field_strategy=INDEX_TIME)
    src.drain(srv.transport, now_ms=BASE + 5_000)
    req = srv.requests[0]
    assert "index_latest" in req and "latest_time" not in req


def test_provided_strategy_uses_property_values(tmp_path):
    srv = SplunkServer(_events())
    src = _src(tmp_path, time_range_strategy=PROVIDED,
               earliest_time=format_time(BASE + 2_000),
               latest_time=format_time(BASE + 4_000))
    n = src.drain(srv.transport, now_ms=BASE + 999_000)
    assert n == 3                    # i in 2..4, inclusive bounds
    # provided strategy saves no watermark → same window again
    assert src.drain(srv.transport, now_ms=BASE + 999_999) == 3


def test_config_change_resets_state(tmp_path):
    srv = SplunkServer(_events())
    src = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING)
    src.drain(srv.transport, now_ms=BASE + 10_000)
    # same spool/state dir, new query → state cleared → re-fetch all
    src2 = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING,
                query="search sourcetype=x")
    n = src2.drain(srv.transport, now_ms=BASE + 10_000)
    assert n == 11                   # not an empty incremental window
    assert "earliest_time" not in srv.requests[-1]


def test_empty_window_lands_nothing(tmp_path):
    srv = SplunkServer(_events(10))
    src = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING)
    assert src.drain(srv.transport, now_ms=BASE + 9_000) == 10
    assert src.drain(srv.transport, now_ms=BASE + 9_500) == 0


def test_read_back_spool(spark, tmp_path):
    srv = SplunkServer(_events(20))
    src = _src(tmp_path, time_range_strategy=MANAGED_BEGINNING)
    src.drain(srv.transport, now_ms=BASE + 9_000)
    src.drain(srv.transport, now_ms=BASE + 19_000)
    df = src.read(spark)
    assert df.count() == 20
    row = df.orderBy("event_seq").first()
    assert row["splunk_latest_time"] == format_time(BASE + 9_000)
    assert '"_raw":"event 0"' in row["payload"]


def test_output_mode_raw_and_csv(tmp_path):
    srv = SplunkServer(_events(3))
    src = _src(tmp_path, time_range_strategy=PROVIDED,
               output_mode="raw")
    assert src.drain(srv.transport, now_ms=0) == 3
    srv2 = SplunkServer(_events(3))
    src2 = GetSplunkSource(str(tmp_path / "s2"),
                           KVState(str(tmp_path / "st2")),
                           base_url="http://splunk:8089",
                           time_range_strategy=PROVIDED,
                           output_mode="csv")
    assert src2.drain(srv2.transport, now_ms=0) == 4  # header + 3


# ----------------------------------------------------------- put

def test_put_splunk_single_message_tcp_newline():
    sent = []
    assert put_splunk(b"hello", sent.append) == 1
    assert sent == [b"hello\n"]
    sent.clear()
    assert put_splunk(b"hello\n", sent.append) == 1
    assert sent == [b"hello\n"]          # already terminated


def test_put_splunk_udp_no_newline():
    sent = []
    put_splunk(b"hello", sent.append, protocol="UDP")
    assert sent == [b"hello"]


def test_put_splunk_delimited_skips_empties():
    sent = []
    n = put_splunk(b"a||b||||c", sent.append, delimiter="||")
    assert n == 3 and sent == [b"a\n", b"b\n", b"c\n"]


def test_put_splunk_escaped_newline_delimiter():
    sent = []
    n = put_splunk(b"one\ntwo\nthree", sent.append, delimiter="\\n")
    assert n == 3 and sent == [b"one\n", b"two\n", b"three\n"]


def test_put_splunk_empty_content():
    sent = []
    assert put_splunk(b"", sent.append) == 0 and not sent
