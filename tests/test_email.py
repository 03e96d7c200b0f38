"""ExtractEmailHeaders / ExtractEmailAttachments analogs
(operators/email_ops.py) over real stdlib-MIME messages."""

import hashlib

from nifi_spark.operators.email_ops import (_synth_email,
                                            extract_email_attachments,
                                            extract_email_headers,
                                            parse_email_message,
                                            synthesize_email)


def test_email_headers_spark(spark):
    out = extract_email_headers(synthesize_email(spark.range(0, 15)))
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == set(range(15))
    for i, r in rows.items():
        assert r["relationship"] == "success"
        assert r["subject"] == f"Report {i % 20}"
        assert r["sender"] == f"user{i % 7}@siteA"
        assert r["recipients"] == f"list{i % 5}@siteB"
        assert r["message_id"] == f"<m{i}@siteA>"
        assert r["n_attachments"] == i % 3
        assert r["body"] == f"body w{i * 13 % 101} w{i * 29 % 101}"


def test_email_attachments_spark(spark):
    out = extract_email_attachments(synthesize_email(spark.range(0, 15)))
    rows = {}
    for r in out.collect():
        rows.setdefault(r["id"], []).append(r)
    for i in range(15):
        k = i % 3
        got = sorted(rows.get(i, []), key=lambda r: r["attach_idx"])
        assert len(got) == k
        for j, r in enumerate(got):
            blob = bytes((i * 7 + j * 11 + t) % 256
                         for t in range(16 + (i + j) % 9))
            assert r["filename"] == f"f{i}_{j}.bin"
            assert r["mime"] == "application/octet-stream"
            assert r["size"] == len(blob)
            assert r["payload_md5"] == hashlib.md5(blob).hexdigest()


def test_email_malformed_routes(spark):
    import pandas as pd
    pdf = pd.DataFrame({"id": [1], "payload": [b"\xff\xfe not a mime"]})
    out = extract_email_headers(spark.createDataFrame(pdf)).collect()
    # the stdlib parser is lenient; either a clean failure route or a
    # headerless success row — never a task failure
    assert len(out) == 1 and out[0]["relationship"] in ("success", "failure")


def test_email_nested_multipart_and_quoting():
    # hand-built nested multipart with a quoted-printable body
    raw = (b"From: a@b\r\nTo: c@d\r\nSubject: =?utf-8?q?caf=C3=A9?=\r\n"
           b"MIME-Version: 1.0\r\n"
           b"Content-Type: multipart/mixed; boundary=X\r\n\r\n"
           b"--X\r\nContent-Type: text/plain; charset=utf-8\r\n"
           b"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
           b"caf=C3=A9 body\r\n"
           b"--X\r\nContent-Type: text/plain\r\n"
           b"Content-Disposition: attachment; filename=note.txt\r\n\r\n"
           b"inner attachment\r\n--X--\r\n")
    m = parse_email_message(raw)
    assert m["headers"]["subject"] == "café"
    assert m["body"].startswith("café body")
    assert m["attachments"][0]["filename"] == "note.txt"
    assert m["attachments"][0]["payload"].rstrip() == b"inner attachment"
