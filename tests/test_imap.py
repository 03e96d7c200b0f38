"""ConsumeIMAP analog: tagged dialogue, RFC822 literals, delete+expunge,
folder selection, spool landing."""

from __future__ import annotations

import pytest

from nifi_spark.sources.imap import (ConsumeIMAPSource, ImapError,
                                     imap_fetch, imap_loopback)

_MSGS = [b"Subject: a\r\n\r\nfirst\r\n",
         b"Subject: b\r\n\r\nsecond message\r\n",
         b"Subject: c\r\n\r\nthird\r\n"]


def test_fetch_delete_expunge():
    folders = {"INBOX": list(_MSGS), "Archive": [b"kept\r\n"]}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    got = imap_fetch(rl, w, user="u", password="p")
    assert got == _MSGS
    assert join() == [0, 1, 2]
    assert folders["INBOX"] == []            # expunged
    assert folders["Archive"] == [b"kept\r\n"]


def test_fetch_keep():
    folders = {"INBOX": list(_MSGS)}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    got = imap_fetch(rl, w, user="u", password="p", delete=False)
    assert got == _MSGS and join() == []
    assert folders["INBOX"] == _MSGS


def test_folder_selection_and_errors():
    folders = {"Reports": [b"r1\r\n"]}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    got = imap_fetch(rl, w, user="u", password="p", folder="Reports")
    assert got == [b"r1\r\n"]
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    with pytest.raises(ImapError, match="NO"):
        imap_fetch(rl, w, user="u", password="p", folder="Missing")
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    with pytest.raises(ImapError, match="NO LOGIN"):
        imap_fetch(rl, w, user="u", password="WRONG")


def test_spool_landing(spark, tmp_path):
    folders = {"INBOX": list(_MSGS)}
    src = ConsumeIMAPSource(str(tmp_path / "spool"))
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    assert src.drain(connect, user="u", password="p") == 3
    join()
    rows = src.read(spark).orderBy("msg_seq").collect()
    assert [r.content.split("\r\n")[0] for r in rows] == \
        ["Subject: a", "Subject: b", "Subject: c"]
    assert {r.folder for r in rows} == {"INBOX"}
    assert rows[0].mime_type == "message/rfc822"
