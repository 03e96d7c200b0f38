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


# ------------------------------------------------- UID family + SEARCH


def test_uid_fetch_delete_expunge():
    folders = {"INBOX": list(_MSGS)}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    got = imap_fetch(rl, w, user="u", password="p", use_uid=True)
    assert got == _MSGS
    assert join() == [0, 1, 2]
    assert folders["INBOX"] == []


def _session(folders):
    """Raw tagged-command driver over a loopback session."""
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    assert rl().startswith(b"* OK")
    seq = [0]

    def cmd(text):
        seq[0] += 1
        tag = f"t{seq[0]}"
        w(f"{tag} {text}\r\n".encode())
        lines = []
        while True:
            ln = rl()
            assert ln, "connection dropped"
            if ln.startswith(tag.encode() + b" "):
                return ln, lines
            lines.append(ln)

    return cmd, join


def test_uids_stable_across_expunge():
    msgs = [b"m1\r\n", b"m2\r\n", b"m3\r\n", b"m4\r\n"]
    cmd, join = _session({"INBOX": list(msgs)})
    assert cmd("LOGIN u p")[0].split()[1] == b"OK"
    st, lines = cmd('SELECT "INBOX"')
    assert any(b"UIDVALIDITY" in ln for ln in lines)
    assert any(b"UIDNEXT 5" in ln for ln in lines)
    # delete message 2 (uid 2) by uid, expunge
    cmd("UID STORE 2 +FLAGS (\\Deleted)")
    cmd("EXPUNGE")
    # remaining uids are 1,3,4 — NOT renumbered
    _, lines = cmd("UID SEARCH ALL")
    found = [ln for ln in lines if ln.startswith(b"* SEARCH")]
    assert found[0].split()[2:] == [b"1", b"3", b"4"]
    # UID FETCH 3 returns what is now sequence number 2
    _, lines = cmd("UID FETCH 3 RFC822")
    assert lines[0].startswith(b"* 2 FETCH (UID 3 RFC822")
    cmd("LOGOUT")
    join()


def test_uid_set_ranges_and_star():
    msgs = [f"m{i}\r\n".encode() for i in range(1, 7)]
    cmd, join = _session({"INBOX": list(msgs)})
    cmd("LOGIN u p")
    cmd('SELECT "INBOX"')
    cmd("UID STORE 1,3:4,6:* +FLAGS (\\Deleted)")
    cmd("EXPUNGE")
    _, lines = cmd("UID SEARCH ALL")
    found = [ln for ln in lines if ln.startswith(b"* SEARCH")]
    assert found[0].split()[2:] == [b"2", b"5"]
    cmd("LOGOUT")
    join()


def test_search_criteria():
    msgs = [
        b"Subject: alpha report\r\nFrom: a@x\r\n\r\nbody one\r\n",
        b"Subject: beta\r\nFrom: b@y\r\n\r\nneedle inside\r\n",
        b"Subject: alpha memo\r\nFrom: c@z\r\n\r\nplain\r\n",
    ]
    cmd, join = _session({"INBOX": list(msgs)})
    cmd("LOGIN u p")
    cmd('SELECT "INBOX"')

    def hits(text):
        _, lines = cmd(text)
        found = [ln for ln in lines if ln.startswith(b"* SEARCH")]
        return found[0].split()[2:]

    assert hits("SEARCH ALL") == [b"1", b"2", b"3"]
    assert hits("SEARCH TEXT needle") == [b"2"]
    assert hits('SEARCH HEADER Subject alpha') == [b"1", b"3"]
    assert hits('SEARCH HEADER Subject "alpha memo"') == [b"3"]
    cmd("STORE 1 +FLAGS (\\Deleted)")
    assert hits("SEARCH DELETED") == [b"1"]
    assert hits("SEARCH UNDELETED") == [b"2", b"3"]
    assert hits("UID SEARCH HEADER From b@y") == [b"2"]
    st, _ = cmd("SEARCH SINCE yesterday")
    assert st.split()[1] == b"BAD"
    cmd("LOGOUT")
    join()


def test_spool_landing_uid_mode(spark, tmp_path):
    folders = {"INBOX": list(_MSGS)}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    src = ConsumeIMAPSource(str(tmp_path / "spool"))
    n = src.drain(connect, user="u", password="p", use_uid=True)
    assert n == len(_MSGS)
    join()
    df = src.read(spark)
    assert df.count() == len(_MSGS)
    got = sorted(r["content"] for r in df.collect())
    assert got == sorted(m.decode() for m in _MSGS)


# ------------------------------------------------- IDLE + BODYSTRUCTURE


def _mk_multipart(i: int) -> bytes:
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText
    m = MIMEMultipart("mixed", boundary=f"b{i}")
    for j in range(1 + i % 3):
        m.attach(MIMEText(f"part-{i}-{j}\n", "plain"))
    from email.policy import SMTP
    return m.as_bytes(policy=SMTP)


def test_bodystructure_simple_text():
    from nifi_spark.sources.imap import bodystructure
    s = bodystructure(b"Subject: a\r\n\r\nhello\r\nworld\r\n")
    assert s.startswith('("TEXT" "PLAIN" ')
    assert s.endswith(" 2)")                 # two lines
    assert '"7BIT"' in s


def test_bodystructure_multipart_nesting_and_params():
    from nifi_spark.sources.imap import bodystructure
    s = bodystructure(_mk_multipart(2))      # 3 text parts
    assert s.count('("TEXT" "PLAIN"') == 3
    assert '"MIXED" ("BOUNDARY" "b2")' in s
    assert s.startswith("((") and s.endswith("NIL NIL)")


def test_fetch_structs_over_loopback():
    from nifi_spark.sources.imap import imap_fetch_structs
    folders = {"INBOX": [_mk_multipart(0),
                         b"Subject: x\r\n\r\nplain\r\n"]}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders)
    rl, w = connect()
    structs = imap_fetch_structs(rl, w, user="u", password="p")
    join()
    assert len(structs) == 2
    assert '"MIXED"' in structs[0]
    assert structs[1].startswith('("TEXT" "PLAIN"')
    assert folders["INBOX"] and len(folders["INBOX"]) == 2  # untouched


def test_idle_push_consume_only_new_uids():
    from nifi_spark.sources.imap import imap_idle_consume
    baseline = [b"Subject: old\r\n\r\nseen\r\n"]
    batches = [[b"Subject: n1\r\n\r\nnew one\r\n",
                b"Subject: n2\r\n\r\nnew two\r\n"],
               [],
               [b"Subject: n3\r\n\r\nnew three\r\n"]]
    it = iter(batches)
    folders = {"INBOX": list(baseline)}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders,
                                  idle_feed=lambda: next(it, []))
    rl, w = connect()
    rounds = imap_idle_consume(rl, w, user="u", password="p", rounds=3)
    join()
    assert rounds == batches                 # baseline never re-fetched
    assert len(folders["INBOX"]) == 4        # nothing deleted


def test_idle_heartbeat_round_returns_empty():
    from nifi_spark.sources.imap import imap_idle_consume
    folders = {"INBOX": []}
    connect, join = imap_loopback(user="u", password="p",
                                  folders=folders,
                                  idle_feed=lambda: [])
    rl, w = connect()
    rounds = imap_idle_consume(rl, w, user="u", password="p", rounds=2)
    join()
    assert rounds == [[], []]


def test_bodystructure_message_rfc822_envelope():
    """message/rfc822 parts carry (ENVELOPE bodystructure lines) after
    the basic fields — RFC 3501 §7.4.2, incl. the sender/reply-to
    default-from-From rule and address structures."""
    from nifi_spark.sources.imap import bodystructure
    inner = (b"Date: Mon, 1 Jan 2024 00:00:00 +0000\r\n"
             b"From: Alice A <alice@example.com>\r\n"
             b"To: bob@example.org, Carol <carol@example.net>\r\n"
             b"Subject: inner msg\r\n"
             b"Message-ID: <m1@example.com>\r\n\r\n"
             b"inner body line\r\n")
    outer = (b"From: outer@example.com\r\n"
             b"Subject: fwd\r\n"
             b"Content-Type: message/rfc822\r\n\r\n" + inner)
    s = bodystructure(outer)
    assert s.startswith('("MESSAGE" "RFC822" ')
    # envelope: date, subject, from/sender/reply-to all default to From
    assert '"Mon, 1 Jan 2024 00:00:00 +0000" "inner msg"' in s
    assert s.count('(("Alice A" NIL "alice" "example.com"))') == 3
    # two-address To list, one unnamed + one named
    assert ('((NIL NIL "bob" "example.org")'
            '("Carol" NIL "carol" "example.net"))') in s
    assert '"<m1@example.com>"' in s
    # inner body structure + line count trail the envelope
    assert '("TEXT" "PLAIN" ' in s
    assert s.rstrip(")").rstrip().endswith(
        str(inner.count(b"\n")))
