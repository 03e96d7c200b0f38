"""FTP (RFC 959, real loopback TCP + PASV) and SFTP (SFTPv3 packet
layer over socketpair) — protocol conformance + the Get/Put/Fetch/List
bridge semantics shared with the reference's FTPTransfer/SFTPTransfer.
Pure-Python: no Spark session needed."""

from __future__ import annotations

import os
import time

import pytest

from nifi_spark.sources.ftp import (FtpClient, FtpError, FtpServer,
                                    fetch_ftp, get_ftp, list_ftp,
                                    put_ftp)
from nifi_spark.sources.sftp import (FX_NO_SUCH_FILE, SftpClient,
                                     SftpError, SftpServer, fetch_sftp,
                                     get_sftp, list_sftp, put_sftp,
                                     sftp_loopback)

# ------------------------------------------------------------------ FTP


@pytest.fixture()
def ftp(tmp_path):
    srv = FtpServer(str(tmp_path), user="u", password="p")
    host, port = srv.start()
    c = FtpClient(host, port, user="u", password="p")
    yield srv, c, tmp_path
    c.close()
    srv.stop()


def test_ftp_login_rejects_bad_password(tmp_path):
    srv = FtpServer(str(tmp_path), user="u", password="p")
    host, port = srv.start()
    with pytest.raises(FtpError, match="530"):
        FtpClient(host, port, user="u", password="wrong")
    srv.stop()


def test_ftp_stor_retr_binary_roundtrip(ftp):
    _, c, root = ftp
    data = bytes(range(256)) * 300 + b"\xff\x00\r\n."
    c.stor("blob.bin", data)
    assert (root / "blob.bin").read_bytes() == data
    assert c.retr("blob.bin") == data
    assert c.size("blob.bin") == len(data)


def test_ftp_rest_resumes_mid_file(ftp):
    _, c, _ = ftp
    c.stor("f.txt", b"0123456789")
    assert c.retr("f.txt", rest=4) == b"456789"


def test_ftp_nlst_cwd_mkd_rename_delete(ftp):
    _, c, root = ftp
    c.mkd("sub")
    c.cwd("sub")
    assert c.pwd() == "/sub"
    c.stor("a.txt", b"A")
    c.rename("a.txt", "b.txt")
    assert c.nlst() == ["b.txt"]
    assert (root / "sub" / "b.txt").exists()
    c.dele("b.txt")
    with pytest.raises(FtpError, match="550"):
        c.retr("b.txt")
    c.cwd("/")
    c.rmd("sub")


def test_ftp_path_jail(ftp):
    _, c, _ = ftp
    with pytest.raises(FtpError, match="550"):
        c.retr("../../etc/passwd")
    c.cwd("../..")                   # clamps to root, never escapes
    assert c.pwd() == "/"


def test_put_ftp_dot_rename_then_get_drains_and_deletes(ftp):
    _, c, root = ftp
    files = [(f"doc{i}.txt", f"content {i}".encode() * 50)
             for i in range(7)]
    assert put_ftp(c, files, dot_rename=True) == 7
    # no dot files left behind
    assert sorted(c.nlst()) == sorted(n for n, _ in files)
    got = get_ftp(c, delete=True)
    assert [(g["name"], g["content"]) for g in got] == sorted(files)
    assert c.nlst() == []                       # drained


def test_get_ftp_skips_inflight_dot_files(ftp):
    _, c, _ = ftp
    c.stor(".uploading.txt", b"partial")
    c.stor("done.txt", b"full")
    got = get_ftp(c, delete=False)
    assert [g["name"] for g in got] == ["done.txt"]


def test_fetch_ftp_not_found_routing(ftp):
    _, c, _ = ftp
    c.stor("x.txt", b"X")
    found, missing = fetch_ftp(c, ["x.txt", "ghost.txt"])
    assert [f["name"] for f in found] == ["x.txt"]
    assert missing == ["ghost.txt"]


def test_list_ftp_watermark_and_lag(ftp):
    _, c, root = ftp
    c.stor("old.txt", b"o")
    os.utime(root / "old.txt", (1000, 1000))
    c.stor("new.txt", b"n")
    os.utime(root / "new.txt", (2000, 2000))
    c.stor("boundary.txt", b"b")
    os.utime(root / "boundary.txt", (3000, 3000))
    # lag excludes the 3000-boundary file; watermark advances to 2000
    entries, wm = list_ftp(c, "", 1000, lag_seconds=0.5, now=3000.2)
    assert [e["name"] for e in entries] == ["new.txt"]
    assert wm == 2000
    # second pass from the committed watermark picks up the late file
    entries2, wm2 = list_ftp(c, "", wm, lag_seconds=0.5, now=3010)
    assert [e["name"] for e in entries2] == ["boundary.txt"]
    assert wm2 == 3000


def test_ftp_multiline_feat_reply(ftp):
    _, c, _ = ftp
    text = c._cmd("FEAT", 211)
    assert "SIZE" in text and "MDTM" in text


# ----------------------------------------------------------------- SFTP


@pytest.fixture()
def sftp(tmp_path):
    srv = SftpServer(str(tmp_path))
    c, join = sftp_loopback(srv)
    yield c, tmp_path
    join()


def test_sftp_version_negotiated(sftp):
    c, _ = sftp
    assert c.server_version == 3


def test_sftp_write_read_roundtrip_chunked(sftp):
    c, root = sftp
    data = os.urandom(200_000)                  # forces multi-chunk
    c.write_file("big.bin", data)
    assert (root / "big.bin").read_bytes() == data
    assert c.read_file("big.bin") == data
    assert c.stat("big.bin")["size"] == len(data)


def test_sftp_listdir_attrs_and_realpath(sftp):
    c, root = sftp
    c.mkdir("d")
    c.write_file("d/x.txt", b"x")
    c.write_file("d/y.txt", b"yy")
    names = {e["name"]: e for e in c.listdir("d")}
    assert set(names) == {"x.txt", "y.txt"}
    assert names["y.txt"]["size"] == 2
    assert c.realpath("d/../d/x.txt") == "/d/x.txt"


def test_sftp_remove_rename_rmdir_and_status_codes(sftp):
    c, _ = sftp
    c.write_file("a.txt", b"a")
    c.rename("a.txt", "b.txt")
    assert c.read_file("b.txt") == b"a"
    c.remove("b.txt")
    with pytest.raises(SftpError) as ei:
        c.read_file("b.txt")
    assert ei.value.code == FX_NO_SUCH_FILE
    with pytest.raises(SftpError):
        c.remove("b.txt")


def test_sftp_path_jail(sftp):
    c, _ = sftp
    with pytest.raises(SftpError):
        c.read_file("../../etc/passwd")


def test_sftp_readdir_batches_past_64(sftp):
    c, _ = sftp
    for i in range(130):
        c.write_file(f"f{i:03d}.txt", b"!")
    names = [e["name"] for e in c.listdir(".")]
    assert len(names) == 130                    # 3 READDIR batches


def test_put_get_fetch_list_sftp_bridges(sftp):
    c, root = sftp
    files = [(f"doc{i}.txt", f"body {i}".encode()) for i in range(5)]
    assert put_sftp(c, files) == 5
    found, missing = fetch_sftp(c, ["doc0.txt", "nope.txt"])
    assert [f["name"] for f in found] == ["doc0.txt"]
    assert missing == ["nope.txt"]
    for i, (n, _) in enumerate(files):
        os.utime(root / n, (1000 + i, 1000 + i))
    entries, wm = list_sftp(c, ".", 1000, lag_seconds=0.5, now=1010)
    assert [e["name"] for e in entries] == [n for n, _ in files[1:]]
    assert wm == 1004
    got = get_sftp(c, ".", delete=True)
    assert [(g["name"], g["content"]) for g in got] == sorted(files)
    assert [e for e in c.listdir(".") if not e["name"].startswith(".")] \
        == []
