"""ListenSMTP analog: SMTP dialogue state machine, dot-unstuffing,
size guard, spool landing, and composition with email header extract."""

from __future__ import annotations

import pytest

from nifi_spark.sources.smtp_listen import (ListenSMTPSource, lines_feed,
                                            serve_smtp)


def _serve(script: bytes, **kw):
    out: list[bytes] = []
    msgs = serve_smtp(lines_feed(script), out.append, **kw)
    return msgs, b"".join(out).decode()


def test_basic_session_and_attributes():
    script = (b"EHLO client.example\r\n"
              b"MAIL FROM:<alice@example.com>\r\n"
              b"RCPT TO:<bob@example.org>\r\n"
              b"RCPT TO:<carol@example.org>\r\n"
              b"DATA\r\n"
              b"Subject: hi\r\n"
              b"\r\n"
              b"body line\r\n"
              b".\r\n"
              b"QUIT\r\n")
    msgs, replies = _serve(script, src="10.1.2.3:555")
    assert len(msgs) == 1
    m = msgs[0]
    assert m.helo == "client.example"
    assert m.src == "10.1.2.3:555"
    assert m.mail_from == "alice@example.com"
    assert m.recipients == ["bob@example.org", "carol@example.org"]
    assert m.content == "Subject: hi\r\n\r\nbody line\r\n"
    assert replies.startswith("220 ")
    assert "250 SIZE" in replies and "354" in replies
    assert replies.rstrip().endswith("221 nifi-spark closing")


def test_dot_unstuffing_and_multiple_messages():
    script = (b"HELO h\r\n"
              b"MAIL FROM:<a@x>\r\nRCPT TO:<b@x>\r\nDATA\r\n"
              b"..leading dot kept once\r\n"
              b".\r\n"
              b"MAIL FROM:<c@x>\r\nRCPT TO:<d@x>\r\nDATA\r\n"
              b"second\r\n.\r\nQUIT\r\n")
    msgs, _ = _serve(script)
    assert [m.mail_from for m in msgs] == ["a@x", "c@x"]
    assert msgs[0].content == ".leading dot kept once\r\n"
    assert msgs[1].recipients == ["d@x"]


def test_sequencing_errors_and_size_guard():
    script = (b"HELO h\r\n"
              b"RCPT TO:<b@x>\r\n"          # 503: RCPT before MAIL
              b"DATA\r\n"                    # 503: DATA before RCPT
              b"MAIL FROM:<a@x>\r\nRCPT TO:<b@x>\r\nDATA\r\n"
              + b"x" * 50 + b"\r\n.\r\n"     # over the 10-byte cap
              b"BLURB\r\nQUIT\r\n")
    msgs, replies = _serve(script, max_message_size=10)
    assert msgs == []
    assert "503 need MAIL" in replies
    assert "503 need RCPT" in replies
    assert "552" in replies
    assert "500 unrecognized command BLURB" in replies


def test_rset_clears_envelope():
    script = (b"HELO h\r\nMAIL FROM:<a@x>\r\nRCPT TO:<b@x>\r\n"
              b"RSET\r\nDATA\r\nQUIT\r\n")
    msgs, replies = _serve(script)
    assert msgs == [] and "503 need RCPT" in replies


def test_spool_landing_and_spark_read(spark, tmp_path):
    src = ListenSMTPSource(str(tmp_path / "spool"))
    script = (b"EHLO c\r\nMAIL FROM:<a@x>\r\nRCPT TO:<b@y>\r\nDATA\r\n"
              b"From: a@x\r\nTo: b@y\r\nSubject: s1\r\n\r\nhello\r\n"
              b".\r\nQUIT\r\n")
    assert src.drain_connection(lines_feed(script), lambda b: None,
                                src="10.0.0.9:2525") == 1
    # crash-safe monotonic ids: a new instance continues numbering
    src2 = ListenSMTPSource(str(tmp_path / "spool"))
    script2 = script.replace(b"s1", b"s2")
    assert src2.drain_connection(lines_feed(script2),
                                 lambda b: None) == 1
    df = src2.read(spark)
    rows = df.orderBy("msg_seq").collect()
    assert [r.batch_id for r in rows] == [0, 1]
    assert rows[0].mail_from == "a@x"
    assert rows[0].recipients == ["b@y"]
    assert rows[0].mime_type == "message/rfc822"
    assert rows[0].src == "10.0.0.9:2525"
    # composes with ExtractEmailHeaders downstream
    from nifi_spark.operators import extract_email_headers
    from pyspark.sql import functions as F
    df = df.withColumn("payload", F.col("content").cast("binary"))
    heads = extract_email_headers(df, "payload", id_col="msg_seq")
    got = {(r.id, r.subject) for r in
           heads.select("id", "subject").collect()}
    assert got == {(0, "s1"), (1000000, "s2")}
