"""Listen-source bridge: drain/spool/read semantics, TCP carry framing,
crash-safe batch naming, and the ListenSyslog parse routing."""

from __future__ import annotations

import os

from nifi_spark.sources.listen import (ListenSyslogSource, ListenTCPSource,
                                       ListenUDPSource)


def feed(items):
    """Injectable recv: yields items then reports empty forever."""
    it = iter(items)

    def recv():
        return next(it, None)

    return recv


def test_udp_datagram_drain_and_read(spark, tmp_path):
    src = ListenUDPSource(str(tmp_path / "spool"), port=10514)
    n = src.drain(feed([("h1", b"a"), ("h2", b"b"), ("h1", b"c")]))
    assert n == 3
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [(r["sender"], r["raw"]) for r in rows] == \
        [("h1", "a"), ("h2", "b"), ("h1", "c")]
    assert {r["protocol"] for r in rows} == {"UDP"}
    assert {r["port"] for r in rows} == {10514}


def test_udp_batch_size_splits_files(spark, tmp_path):
    src = ListenUDPSource(str(tmp_path / "spool"))
    total = src.drain_all(feed([("h", bytes([65 + i % 26]))
                                for i in range(7)]), max_batch_size=3)
    assert total == 7
    files = sorted(f for f in os.listdir(tmp_path / "spool")
                   if f.endswith(".parquet"))
    assert files == [f"batch_{i:08d}.parquet" for i in range(3)]
    df = src.read(spark)
    assert df.count() == 7
    # msg_seq preserves arrival order across batch files
    got = [r["raw"] for r in df.orderBy("msg_seq").collect()]
    assert got == [chr(65 + i % 26) for i in range(7)]


def test_tcp_demarcator_carry_across_reads_and_drains(spark, tmp_path):
    src = ListenTCPSource(str(tmp_path / "spool"))
    # frames split across socket reads; the tail carries across drains
    n1 = src.drain(feed([("h1", b"one\ntw"), ("h1", b"o\nthr")]))
    assert n1 == 2  # 'thr' still buffered
    n2 = src.drain(feed([("h1", b"ee\nfour\n"), ("h2", b"x\n")]))
    assert n2 == 3
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [r["raw"] for r in rows] == ["one", "two", "three", "four", "x"]
    assert rows[-1]["sender"] == "h2"


def test_batch_ids_recover_after_restart(spark, tmp_path):
    spool = str(tmp_path / "spool")
    src = ListenUDPSource(spool)
    src.drain(feed([("h", b"a")]))
    # simulate a restart: a NEW instance must not reuse batch ids
    src2 = ListenUDPSource(spool)
    src2.drain(feed([("h", b"b")]))
    files = sorted(f for f in os.listdir(spool) if f.endswith(".parquet"))
    assert files == ["batch_00000000.parquet", "batch_00000001.parquet"]
    assert src2.read(spark).count() == 2


def test_empty_drain_writes_nothing(tmp_path):
    src = ListenUDPSource(str(tmp_path / "spool"))
    assert src.drain(feed([])) == 0
    assert not any(f.endswith(".parquet")
                   for f in os.listdir(tmp_path / "spool"))


def test_syslog_parse_routing(spark, tmp_path):
    src = ListenSyslogSource(str(tmp_path / "spool"), protocol="UDP")
    msgs = [("10.0.0.1", b"<34>Oct 11 22:14:15 mymachine su[230]: "
                         b"failed for lonvick"),
            ("10.0.0.2", b"this is not syslog"),
            ("10.0.0.1", b"<13>Feb  5 17:32:18 host-a app: up")]
    src.drain(feed(msgs))
    routed = src.read_parsed(spark)
    valid = routed["valid"].orderBy("msg_seq").collect()
    invalid = routed["invalid"].collect()
    assert len(valid) == 2 and len(invalid) == 1
    assert valid[0]["syslog_priority"] == 34
    assert valid[0]["syslog_hostname"] == "mymachine"
    assert valid[0]["syslog_pid"] == 230
    assert valid[1]["syslog_tag"] == "app"
    # invalid keeps the listener attributes (sender/protocol/port)
    assert invalid[0]["sender"] == "10.0.0.2"
    assert invalid[0]["protocol"] == "UDP"


def test_read_stream_consumes_spool_incrementally(spark, tmp_path):
    """Spool → Structured Streaming file source: drains landed before
    the stream starts are consumed availableNow; a later drain is
    picked up by a second availableNow pass from the same checkpoint."""
    src = ListenUDPSource(str(tmp_path / "spool"))
    src.drain(feed([("h", b"m1"), ("h", b"m2")]))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (src.read_stream(spark, max_files_per_trigger=1)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = {r.raw for r in spark.read.parquet(out).collect()}
    assert got == {"m1", "m2"}
    src.drain(feed([("h", b"m3")]))
    run_once()
    got = sorted(r.raw for r in spark.read.parquet(out).collect())
    assert got == ["m1", "m2", "m3"]     # exactly-once: no re-reads
